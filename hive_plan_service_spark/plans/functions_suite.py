"""Scalar function families (SURVEY.md §2.B B16–B21, B26).

All JVM-side built-ins (whole-stage codegen) except the explicitly-marked
pandas UDF in B26. Cross-engine notes are inline where Spark and DuckDB
builtins differ (regexp_replace global flag, pmod, dayofweek origin,
epoch truncation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_plan_service_spark.plans.registry import register
from hive_plan_service_spark.functions.exact import epoch_micros, epoch_seconds, floor_div
from hive_plan_service_spark.sources.catalog import register_tables


# --------------------------------------------------------------------------
# B16 — string functions.
# --------------------------------------------------------------------------
@register(
    "b16_string_functions",
    oracle="""
      SELECT p_partkey,
             -- Java case mappings (r7 fuzz sweep): lower() is
             -- context-sensitive for Greek final sigma (Σ→ς at word
             -- end) and upper('ß')='SS' — utf8proc does neither
             lower(regexp_replace(p_name,
               '(\\p{L})Σ(\\P{L}|$)', '\\1ς\\2', 'g')) AS name_lc,
             -- and upper('ΰ' U+03B0) is the FULL mapping Υ+◌̈+◌́
             -- (U+03A5 0308 0301) where utf8proc is 1:1 (r7 fuzz,
             -- seed 13) — pre-substitute the expansion, upper() of
             -- Υ + combining marks is then the identity
             upper(replace(replace(p_brand, 'ß', 'ss'), 'ΰ', '\u03a5\u0308\u0301'))
               AS brand_uc,
             substr(p_type, 1, 4) AS type_prefix,
             trim('  ' || p_name || '  ') AS trimmed,
             CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
             concat_ws('|', p_brand, p_type) AS brand_type,
             regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
             -- DuckDB regexp_replace is first-match unless 'g'
             regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             (p_name LIKE '%widget%') AS is_widget,
             lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
      FROM part
    """,
    doc="lower/upper/substr/trim/split/concat_ws/regexp_extract/replace/like/lpad.",
    tags=("B16",),
)
def b16_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    p = spark.table("part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").like("%widget%").alias("is_widget"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


# --------------------------------------------------------------------------
# B17 — date/time functions. Epochs emitted as BIGINT seconds (Spark
# unix_timestamp truncates; DuckDB epoch() is fractional → FLOOR).
# --------------------------------------------------------------------------
@register(
    "b17_datetime_functions",
    oracle="""
      SELECT o_orderkey,
             CAST(((epoch_us(date_trunc('month', o_orderdate)) - ((epoch_us(date_trunc('month', o_orderdate)) % 1000000 + 1000000) % 1000000)) // 1000000) AS BIGINT) AS month_start_epoch,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mth,
             CAST(day(o_orderdate) AS BIGINT) AS dom,
             CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
             CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS BIGINT) AS days_to_2002,
             CAST(((epoch_us(o_orderdate) - ((epoch_us(o_orderdate) % 86400000000 + 86400000000) % 86400000000)) // 86400000000) AS BIGINT) AS day_bucket
      FROM orders
    """,
    doc="date_trunc/extract/datediff/epoch bucketing, timezone-pinned UTC.",
    tags=("B17",),
)
def b17_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.select(
        "o_orderkey",
        epoch_seconds(F.date_trunc("month", "o_orderdate"))
        .alias("month_start_epoch"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mth"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_2002"),
        floor_div(epoch_micros("o_orderdate"), 86_400_000_000).alias("day_bucket"),
    )


# --------------------------------------------------------------------------
# B18 — math & bitwise (the A3 bit arithmetic family, generalized).
# pmod has no DuckDB builtin → ((a % b) + b) % b; round only on DECIMAL
# (double rounding modes differ); sqrt is IEEE-exact, transcendentals are
# not (libm ulp drift) and stay out of oracle-checked outputs.
# --------------------------------------------------------------------------
@register(
    "b18_math_bitwise",
    oracle="""
      SELECT n_nationkey,
             (CAST(1 AS BIGINT) << n_nationkey) AS bit_value,
             CAST(n_nationkey & 12 AS BIGINT) AS band,
             CAST(n_nationkey | 1 AS BIGINT) AS bor,
             CAST(xor(n_nationkey, 21) AS BIGINT) AS bxor,
             CAST(bit_count(CAST(1 AS BIGINT) << n_nationkey) AS BIGINT) AS popcount,
             CAST(((n_nationkey - 7) % 5 + 5) % 5 AS BIGINT) AS pmod5,
             CAST(abs(n_nationkey - 12) AS BIGINT) AS dist12,
             CAST(ceil(n_nationkey / 4.0) AS BIGINT) AS ceil4,
             CAST(floor(n_nationkey / 4.0) AS BIGINT) AS floor4,
             sqrt(CAST(n_nationkey AS DOUBLE)) AS root,
             CAST(round(CAST(n_nationkey AS DECIMAL(18,4)) / 7, 2) AS DOUBLE) AS sevenths
      FROM nation
    """,
    doc="shiftleft/&/|/^/bit_count/pmod/abs/ceil/floor/sqrt/round(decimal).",
    tags=("B18",),
)
def b18_math_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    n = spark.table("nation")
    return n.select(
        "n_nationkey",
        F.expr("shiftleft(CAST(1 AS BIGINT), n_nationkey)").alias("bit_value"),
        F.expr("CAST(n_nationkey & 12 AS BIGINT)").alias("band"),
        F.expr("CAST(n_nationkey | 1 AS BIGINT)").alias("bor"),
        F.expr("CAST(n_nationkey ^ 21 AS BIGINT)").alias("bxor"),
        F.bit_count(F.expr("shiftleft(CAST(1 AS BIGINT), n_nationkey)"))
        .cast("bigint")
        .alias("popcount"),
        F.pmod(F.col("n_nationkey") - 7, F.lit(5)).cast("bigint").alias("pmod5"),
        F.abs(F.col("n_nationkey") - 12).cast("bigint").alias("dist12"),
        F.ceil(F.col("n_nationkey") / 4.0).cast("bigint").alias("ceil4"),
        F.floor(F.col("n_nationkey") / 4.0).cast("bigint").alias("floor4"),
        F.sqrt(F.col("n_nationkey").cast("double")).alias("root"),
        F.round(F.col("n_nationkey").cast("decimal(18,4)") / 7, 2)
        .cast("double")
        .alias("sevenths"),
    )


# --------------------------------------------------------------------------
# B19 — array functions & higher-order lambdas (the A3 expansion family).
# --------------------------------------------------------------------------
@register(
    "b19_array_functions",
    oracle="""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 5)) AS BIGINT)
               AS n_long_words,
             list_contains(string_split(text, ' '), 'spark') AS has_spark,
             COALESCE(array_to_string(
               -- Java upper('ß')='SS', utf8proc 'ẞ'; Java
               -- upper('ΰ')=Υ+0308+0301, utf8proc 1:1 (r7 fuzz sweep)
               list_transform(string_split(text, ' ')[1:3],
                 w -> upper(replace(replace(w, 'ß', 'ss'), 'ΰ', '\u03a5\u0308\u0301'))),
               '-'), '')
               AS first3_uc,
             CAST(list_sum(list_transform(string_split(text, ' '), w -> len(w))) AS BIGINT)
               AS total_chars
      FROM documents
    """,
    doc="split/size/filter-lambda/contains/slice/transform/aggregate over arrays.",
    tags=("B19",),
)
def b19_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    d = spark.table("documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.filter(words, lambda w: F.length(w) > 5))
        .cast("bigint")
        .alias("n_long_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.concat_ws(
            "-", F.transform(F.slice(words, 1, 3), lambda w: F.upper(w))
        ).alias("first3_uc"),
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
        ).alias("total_chars"),
    )


# --------------------------------------------------------------------------
# B20 — JSON extraction (the msgpack-decode analog, server:35).
# --------------------------------------------------------------------------
@register(
    "b20_json_functions",
    oracle="""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
             json_extract_string(props, '$.missing') AS missing_str
      FROM events
    """,
    doc="get_json_object / from_json path extraction; missing path → NULL.",
    tags=("B20",),
)
def b20_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    e = spark.table("events")
    return e.select(
        "event_id",
        F.from_json("props", "k bigint").getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_str"),
    )


# --------------------------------------------------------------------------
# B21 — conditional / null handling / casts (A12's coalesce-and-cast).
# --------------------------------------------------------------------------
@register(
    "b21_conditional_null",
    oracle="""
      SELECT c_custkey,
             CASE WHEN c_acctbal < 1000 THEN 'low'
                  WHEN c_acctbal < 5000 THEN 'mid'
                  ELSE 'high' END AS tier,
             COALESCE(NULLIF(c_mktsegment, 'FURNITURE'), '(hidden)') AS segment,
             CASE WHEN regexp_matches(trim(substr(c_name, 10)), '^[+-]?[0-9]+$')
                  THEN TRY_CAST(substr(c_name, 10) AS BIGINT) END AS parsed_key,
             (CASE WHEN regexp_matches(trim(substr(c_name, 10)), '^[+-]?[0-9]+$')
                   THEN TRY_CAST(substr(c_name, 10) AS BIGINT) END
              = c_custkey) AS parse_ok
      FROM customer
    """,
    doc="CASE WHEN / coalesce / nullif / string→int try_cast round-trip.",
    tags=("B21",),
)
def b21_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    c = spark.table("customer")
    # try_cast, not cast: under Spark 4's default ANSI mode a bare
    # string→bigint cast THROWS on non-numeric content, and name
    # content is NOT contractual (invariant 26 — found by the hostile
    # TPC-H sweep, ROUND5_NOTES §13). try_cast yields NULL in both
    # engines; identical values on every well-formed fixture row.
    # The DuckDB oracle is guarded to integral-only tokens: DuckDB's
    # TRY_CAST rounds decimal strings ('42.5'→43) and accepts
    # scientific notation ('1e3'→1000) where Spark's try_cast yields
    # NULL for both (r5 ADVICE; pinned by the hostile pool's
    # positional numeric tokens).
    parsed = F.substring("c_name", 10, 100).try_cast("bigint")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("FURNITURE")), F.lit("(hidden)"))
        .alias("segment"),
        parsed.alias("parsed_key"),
        (parsed == F.col("c_custkey")).alias("parse_ok"),
    )


# --------------------------------------------------------------------------
# B26 — pandas UDF surface (Arrow-vectorized; the sanctioned slow path).
# The UDF computes a deterministic arithmetic feature so the oracle can
# check the *plumbing* (batching, Arrow transfer, null handling) exactly.
# --------------------------------------------------------------------------
@register(
    "b26_pandas_udf",
    oracle="""
      SELECT doc_id,
             CAST(2 * length(text) + 1 AS BIGINT) AS affine_len
      FROM documents
    """,
    doc="Arrow-batched pandas UDF (series→series); plumbing value-checked vs SQL.",
    tags=("B26",),
)
def b26_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)

    @F.pandas_udf("bigint")
    def affine_len(s: pd.Series) -> pd.Series:
        # nullable Int64: a NULL text must yield NULL (as the oracle's
        # length(NULL) does), not crash the int64 cast on NaN — the
        # NULL-documents sweep found exactly that (ROUND5_NOTES §13)
        return (2 * s.str.len() + 1).astype("Int64")

    return spark.table("documents").select(
        "doc_id", affine_len(F.col("text")).alias("affine_len")
    )
