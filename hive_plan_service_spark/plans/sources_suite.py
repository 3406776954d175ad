"""Source formats & remaining SQL surface (B1 source registry closure,
B9 exact percentiles, B26 UDTF).

Format round-trips write a fixture table out in the target format and
read it back with an explicit schema (never inferred — FIXTURES.md
types are the contract); the oracle checks against the original
parquet, so any serialization loss fails the value hash. JDBC and
Delta/Iceberg/Hudi connectors need jars absent from this image — the
reader calls are documented here and gated, not faked.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_plan_service_spark.plans.registry import register
from hive_plan_service_spark.sources.catalog import register_tables

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

_NATION_ORACLE = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    register_tables(spark, sf_dir)
    from hive_plan_service_spark.session import scratch_root

    # UNIQUE sink dir per invocation: a fixed path races when two
    # sessions (or two threads of one session — the concurrency gate's
    # 8×50 sweep) run the same roundtrip, overwrite-under-read (seen as
    # a flaky getResult failure when the r7 fuzz sweep overlapped the
    # parity suite). 25-row nation writes make the leak negligible and
    # the scratch root is per-run tmpfs.
    out = tempfile.mkdtemp(prefix=f"hpss_src_{fmt}_", dir=scratch_root())
    n = spark.table("nation").select("n_nationkey", "n_name", "n_regionkey")
    writer = n.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        # Spark's CSV WRITER trims leading/trailing whitespace by
        # default (ignore*WhiteSpace default true on write, false on
        # read) — a silent round-trip loss the hostile-content sweep
        # caught on ' leading'/'trailing ' values (ROUND5_NOTES §13);
        # fixture names carry no edge whitespace, so disabling is
        # drift-free there and faithful everywhere else.
        writer = writer.option("ignoreLeadingWhiteSpace", "false").option(
            "ignoreTrailingWhiteSpace", "false"
        )
    writer.save(out)
    return (
        spark.read.format(fmt)
        .schema(NATION_SCHEMA)
        .option("header", "false")
        .load(out)
    )


@register(
    "b01_source_csv_roundtrip",
    oracle=_NATION_ORACLE,
    doc="CSV sink+source with explicit schema (no inference) round-trips losslessly.",
    tags=("B1",),
)
def b01_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "csv")


@register(
    "b01_source_json_roundtrip",
    oracle=_NATION_ORACLE,
    doc="JSON-lines sink+source with explicit schema round-trips losslessly.",
    tags=("B1",),
)
def b01_source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "json")


@register(
    "b01_source_orc_roundtrip",
    oracle=_NATION_ORACLE,
    doc="ORC sink+source round-trips losslessly (columnar alternative to parquet).",
    tags=("B1",),
)
def b01_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _roundtrip(spark, sf_dir, "orc")


# --------------------------------------------------------------------------
# B9 — exact percentiles: Spark's Percentile collapses duplicates to
# counts (equal endpoint keys return the key itself) and interpolates
# as (higher-pos)*lowerKey + (pos-lower)*higherKey with the rank
# position in DOUBLE; the oracle spells out exactly that expression
# (DuckDB quantile_cont's a*(1-g)+b*g form and DECIMAL literal rank
# arithmetic both diverge — r8 numfuzz). approx_percentile stays
# engine-specific (B11).
# --------------------------------------------------------------------------
@register(
    "b09_percentile_exact",
    oracle="""
      -- Spark Percentile semantics, spelled out exactly (r8 numfuzz):
      -- NOT quantile_cont — DuckDB interpolates a*(1-g)+b*g (inexact
      -- even for a == b) and a bare 0.95 literal is DECIMAL, so the
      -- rank position comes out exact where Spark computes it in
      -- DOUBLE. Spark: position = p * (n-1) in double; lower/higher =
      -- floor/ceil ranks; EQUAL-KEY SHORTCUT (duplicates collapse to
      -- counts, equal endpoint keys return the key itself); else
      -- (higher - position) * lowerKey + (position - lower) * higherKey.
      -- Group over ALL orders (r9, ADVICE): a WHERE-filter before the
      -- GROUP BY dropped groups whose prices are ALL NULL, while Spark
      -- emits them with NULL percentiles. list() keeps NULLs sorted
      -- LAST, so 1-based indices 1..COUNT(x) touch only non-NULL
      -- values; an all-NULL group has n=0 and every index lands on
      -- a[0]/a[1] = NULL → NULL output, matching Spark.
      WITH s AS (
        SELECT o_orderstatus,
               list(o_totalprice ORDER BY o_totalprice NULLS LAST) AS a,
               COUNT(o_totalprice) AS n
        FROM orders GROUP BY o_orderstatus
      ),
      p AS (
        SELECT o_orderstatus,
               a[CAST(floor(CAST(0.5 AS DOUBLE) * (n-1)) AS BIGINT) + 1] AS lo50,
               a[CAST(ceil(CAST(0.5 AS DOUBLE) * (n-1)) AS BIGINT) + 1] AS hi50,
               CAST(0.5 AS DOUBLE) * (n-1) AS p50,
               floor(CAST(0.5 AS DOUBLE) * (n-1)) AS f50,
               ceil(CAST(0.5 AS DOUBLE) * (n-1)) AS c50,
               a[CAST(floor(CAST(0.95 AS DOUBLE) * (n-1)) AS BIGINT) + 1] AS lo95,
               a[CAST(ceil(CAST(0.95 AS DOUBLE) * (n-1)) AS BIGINT) + 1] AS hi95,
               CAST(0.95 AS DOUBLE) * (n-1) AS p95,
               floor(CAST(0.95 AS DOUBLE) * (n-1)) AS f95,
               ceil(CAST(0.95 AS DOUBLE) * (n-1)) AS c95
        FROM s
      )
      SELECT o_orderstatus,
             CASE WHEN hi50 = lo50 THEN lo50
                  ELSE (c50 - p50) * lo50 + (p50 - f50) * hi50
             END AS median_price,
             CASE WHEN hi95 = lo95 THEN lo95
                  ELSE (c95 - p95) * lo95 + (p95 - f95) * hi95
             END AS p95_price
      FROM p
    """,
    doc="Exact interpolated percentiles (median / p95) per group.",
    tags=("B9",),
)
def b09_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return (
        spark.table("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("median_price"),
            F.percentile("o_totalprice", 0.95).alias("p95_price"),
        )
    )


# --------------------------------------------------------------------------
# B26 — Python UDTF: one input row → many output rows, LATERAL-joined.
# --------------------------------------------------------------------------
@register(
    "b26_udtf_split_words",
    oracle="""
      SELECT doc_id, t.ws[t.i] AS word, CAST(t.i - 1 AS INT) AS pos
      FROM (
        SELECT doc_id, ws, i
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) s,
        UNNEST(generate_series(1, len(s.ws))) AS u(i)
      ) t
    """,
    doc="Table-valued UDF exploding text to (word, pos) rows, checked vs UNNEST.",
    tags=("B26",),
)
def b26_udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    register_tables(spark, sf_dir)

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:  # no rows — matches the oracle's LATERAL
                return  # over string_split(NULL) dropping the document
            for i, w in enumerate(text.split(" ")):
                yield w, i

    spark.udtf.register("hpss_split_words", SplitWords)
    return spark.sql(
        """
        SELECT d.doc_id, w.word, w.pos
        FROM documents d, LATERAL hpss_split_words(d.text) w
        """
    )


# --------------------------------------------------------------------------
# B1/B13 — Z-order layout key: interleave the bits of two dimensions so
# range boxes on EITHER dimension map to contiguous key ranges — the
# multi-dimensional clustering that makes parquet min/max stats prune
# boxes a 1-D sort can only prune on its leading column.
# --------------------------------------------------------------------------
_Z_BITS = 12


def _interleave_expr(a: str, b: str, bits: int = _Z_BITS) -> str:
    """SQL for bit-interleaved (Morton) key of two masked ints — the
    identical text runs on Spark and DuckDB (both have >>, &, <<)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "b01_zorder_key",
    oracle=f"""
      SELECT l_orderkey, l_linenumber,
             CAST({_interleave_expr("(l_partkey % 4096)", "(l_suppkey % 4096)")} AS BIGINT)
               AS zval
      FROM lineitem
    """,
    doc="Morton (Z-order) clustering key over (partkey, suppkey), 12 bits each.",
    tags=("B1", "B13"),
)
def b01_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key computation — the write-path layout primitive.

    ``repartitionByRange(zval).sortWithinPartitions(zval)`` before a
    write clusters both dimensions into every file, so a 2-D box query
    skips most files on min/max stats; a 1-D sort only prunes its
    leading column (locality measured in
    tests/test_plans.py::test_zorder_layout_improves_box_locality).
    Pure bit arithmetic, one projection, no shuffle in this key query.
    """
    register_tables(spark, sf_dir)
    return spark.table("lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            _interleave_expr("(l_partkey % 4096)", "(l_suppkey % 4096)")
        ).cast("bigint").alias("zval"),
    )
