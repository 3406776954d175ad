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
