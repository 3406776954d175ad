"""The local twin of the driver's t2 gate: every registered query vs DuckDB."""

from __future__ import annotations

import pytest

from hive_plan_service_spark.plans.registry import all_queries
from tests.parity import check_query

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    check_query(spark, _QUERIES[name], sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)


def test_a08_json_escape_matches_duckdb(spark):
    """The a08 oracle's handcrafted JSON serialization must byte-match
    Spark's to_json even for titles carrying quotes and backslashes —
    fixtures regenerate every round and title content is NOT contractual
    (VERDICT r4 #5; invariant 3 burned the engine once on exactly this
    class of 'the data will never contain X' assumption)."""
    import duckdb
    from pyspark.sql import functions as F

    from hive_plan_service_spark.plans.reference_ops import ORACLE_JSON_ESCAPE

    df = spark.createDataFrame(
        [
            (1, 'say "hi"', True),
            (2, "back\\slash", False),
            (4, 'mix "\\" q', True),
        ],
        "id long, title string, optional boolean",
    )
    nested = df.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("id", "title", "optional"))
        ).alias("plans")
    )
    spark_json = nested.select(F.to_json("plans").alias("j")).collect()[0]["j"]

    esc = ORACLE_JSON_ESCAPE.format(col="title")
    oracle_json = duckdb.connect().execute(
        f"""
        SELECT '[' || string_agg(
            '{{"id":' || CAST(id AS VARCHAR)
              || ',"title":"' || {esc}
              || '","optional":' || CAST(optional AS VARCHAR) || '}}',
            ',' ORDER BY id) || ']'
        FROM (VALUES (1, 'say "hi"', true),
                     (2, 'back\\slash', false),
                     (4, 'mix "\\" q', true)) t(id, title, optional)
        """
    ).fetchone()[0]
    assert spark_json == oracle_json


def test_a08_control_char_title_raises(spark, sf_dir):
    """A control character in a plan title must raise loudly in the a08
    JSON query rather than silently diverge from the oracle (to_json
    \\u-escapes it; the handcrafted string_agg does not)."""
    import pytest
    from pyspark.sql import functions as F

    from hive_plan_service_spark.plans import registry
    from hive_plan_service_spark.sources.catalog import register_tables

    register_tables(spark, sf_dir, force=True)
    tainted = spark.table("plans").withColumn(
        "title", F.concat(F.col("title"), F.lit("\t"))
    )
    tainted.createOrReplaceTempView("plans")
    try:
        q = registry.all_queries()["a08_get_plan_groups_json"]
        with pytest.raises(Exception, match="control character"):
            q.fn(spark, sf_dir).collect()
    finally:
        register_tables(spark, sf_dir, force=True)


def test_a08_null_title_raises_with_accurate_message(spark, sf_dir):
    """A NULL plan title must raise its OWN error, not the misleading
    control-character one (rlike(NULL) -> NULL -> exists -> NULL fell
    through to otherwise before the r5 review fix); silently serializing
    is also wrong because to_json omits null fields while the oracle's
    NULL-propagating concat drops the whole element."""
    import pytest
    from pyspark.sql import functions as F

    from hive_plan_service_spark.plans import registry
    from hive_plan_service_spark.sources.catalog import register_tables

    register_tables(spark, sf_dir, force=True)
    tainted = spark.table("plans").withColumn(
        "title",
        F.when(F.col("id") == F.lit(1), F.lit(None).cast("string")).otherwise(
            F.col("title")
        ),
    )
    tainted.createOrReplaceTempView("plans")
    try:
        q = registry.all_queries()["a08_get_plan_groups_json"]
        with pytest.raises(Exception, match="NULL plan title"):
            q.fn(spark, sf_dir).collect()
    finally:
        register_tables(spark, sf_dir, force=True)


def test_document_queries_match_oracle_on_hostile_corpus(spark, sf_dir, tmp_path):
    """Full Spark-vs-DuckDB PARITY (not just the no-crash degenerate
    smoke) for every oracled document-consuming query on a corpus of
    hostile CONTENT: quotes, backslashes, JSON/regex/LIKE
    metacharacters, unicode (CJK, emoji, accents, NBSP), embedded
    newlines/tabs, literal 'null'/'NaN' tokens, plus exact- and
    near-duplicate pairs so the dedup paths emit real output. Fixtures
    regenerate every round and content is NOT contractual (invariant 3;
    the a08 title-escape trap was exactly a content-niceness assumption
    in an oracle) — this pins every document oracle's string handling
    against the next drift, including the streaming ingest store."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.parity import TABLES

    hostile = tmp_path / "hostile_sf"
    hostile.mkdir()
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{sf_dir}/{t}.parquet", hostile / f"{t}.parquet")

    base_long = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "noisy parrots recite overlapping fragments of ancient navigation "
        "manuals near the harbor wall every single morning"
    )
    texts = [
        ('en', 'web', 'He said "hello there" and \'left\' the room quietly'),
        ('en', 'code', r'back\slash paths C:\temp\file and \n literal escapes'),
        ('en', 'web', '{"json": [1, 2, {"k": "v"}], "quote": "\\" inner"}'),
        ('en', 'code', 'regex meta .* chars [set]? (group+) {2,3} alt|anchor ^start end$'),
        ('en', 'web', 'like meta 100% guaranteed _underscore_ wildcards everywhere'),
        ('fr', 'books', 'café naïve façade déjà vu — and\u00a0non-breaking\u00a0spaces'),
        ('ja', 'web', '日本語 の テスト 文書 🚀 emoji と 混在 する'),
        ('en', 'web', 'line\nbreaks and\ttabs and\r\nwindows endings inside one doc'),
        ('en', 'web', 'null NULL None nan NaN Infinity -0 literals as plain words'),
        ('de', 'books', '<html><b>tags</b> &amp; entities &lt;kept&gt; as text</html>'),
        ('en', 'code', 'select * from t where x = 1; drop table plans; -- comment'),
        ('en', 'web', base_long),
        ('en', 'web', base_long),  # exact duplicate pair
        ('en', 'web', base_long.replace("seventeen", "nineteen")),  # near-dup
        ('de', 'web', 'wiederholte worte worte worte und noch mehr worte worte'),
        ('en', 'books', '0123456789 42.5e-3 0x1F 1_000_000 3.14159 numeric soup'),
        # engine-divergence candidates, all verified to hold: \x0B is in
        # Java regex \s but not RE2's; zero-width space, combining acute
        # and soft hyphen stress tokenizers and length functions
        ('en', 'web', 'vertical\x0btab and form\x0cfeed inside words'),
        ('en', 'web', 'zero​width and combining é acute plus ­soft hyphen'),
    ]
    rows = [
        (i, t, lg, src, len(t)) for i, (lg, src, t) in enumerate(texts)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        hostile / "documents.parquet",
    )

    failures = []
    for name, q in sorted(_QUERIES.items()):
        if not q.oracle or not ({"B15", "B27", "B29", "llm"} & set(q.tags)):
            continue
        try:
            check_query(spark, q, str(hostile))
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {str(ex).splitlines()[0][:200]}")
    assert not failures, "\n".join(failures)


def test_string_family_queries_match_oracle_on_hostile_tpch(spark, sf_dir):
    """Spark↔DuckDB parity for the string-consuming relational families
    (B1/B13/B16/B17/B21) on fixtures whose EVERY string column is
    rewritten with hostile content (scripts/hostile_probe.py's pool:
    quotes, backslashes, JSON/regex/LIKE metacharacters, unicode,
    edge whitespace, literal null tokens). TPC-H text is
    driver-generator-controlled but still NOT contractual; the first
    full-registry sweep found three real latent divergences here —
    Spark's CSV writer trimming edge whitespace, DuckDB's byte-based
    levenshtein vs Spark's codepoint-based, and a bare ANSI cast on
    name content (ROUND5_NOTES §13) — all fixed; this pins them. The
    full 122-query sweep stays in scripts/hostile_probe.py (run per
    round); this subset keeps suite time bounded while covering every
    family that touches the mutated columns."""
    from scripts.hostile_probe import hostile_dir

    hostile = hostile_dir(sf_dir)
    failures = []
    for name, q in sorted(_QUERIES.items()):
        if not q.oracle or not (
            {"B1", "B13", "B16", "B17", "B21"} & set(q.tags)
        ):
            continue
        try:
            check_query(spark, q, hostile)
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {str(ex).splitlines()[0][:200]}")
    assert not failures, "\n".join(failures)


def test_string_family_queries_match_oracle_with_null_injection(spark, sf_dir):
    """String + document families, NULL injection instead of hostile
    content: every 7th string value of customer/supplier/part/orders/
    lineitem/documents becomes NULL (these columns are NOT NULL in the
    generator, so no fixture row ever exercises the paths). The sweeps
    found nine real NULL-semantics divergences (ROUND5_NOTES §13):
    DuckDB split_part('' for NULL input), DuckDB concat skipping NULLs
    where Spark propagates, Spark to_json omitting null fields, five
    Python stages crashing on None (len/str.len/split of None), Spark
    concat_ws never returning NULL where array_to_string propagates,
    and DuckDB list_prepend/list_distinct folding or dropping NULL
    grams — all fixed; this pins the classes."""
    from scripts.hostile_probe import hostile_dir

    hostile = hostile_dir(sf_dir, nulls=True)
    failures = []
    for name, q in sorted(_QUERIES.items()):
        if not q.oracle or not (
            {"B1", "B13", "B15", "B16", "B17", "B19", "B20", "B21",
             "B26", "B27", "B29", "B30", "llm"} & set(q.tags)
        ):
            continue
        try:
            check_query(spark, q, hostile)
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {str(ex).splitlines()[0][:200]}")
    assert not failures, "\n".join(failures)


def test_all_oracled_queries_match_oracle_on_empty_fixtures(spark, sf_dir):
    """Every oracled query on 0-row fixtures (exact arrow schemas
    preserved — events' physical ts type is sniff-contractual). The
    first sweep found two real classes (ROUND5_NOTES §13): write-then-
    read-back paths crashing when the write produced no files (the
    partitioned-prune copy, the streaming counter log, the dedup-ingest
    flags, the rollup store — all first-boot/filtered-to-empty
    realities at 100 TB), and Spark emitting 0 rows for ROLLUP/CUBE/
    GROUPING SETS on empty input where DuckDB emits the grand-total row
    (oracles now HAVING-guarded, exact on non-empty input). All fixed;
    this pins both classes plus every aggregate's empty-input shape."""
    from scripts.hostile_probe import empty_dir

    empty = empty_dir(sf_dir)
    failures = []
    for name, q in sorted(_QUERIES.items()):
        if not q.oracle:
            continue
        try:
            check_query(spark, q, empty)
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {str(ex).splitlines()[0][:200]}")
    assert not failures, "\n".join(failures)
