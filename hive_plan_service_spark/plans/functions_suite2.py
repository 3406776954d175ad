"""Second scalar-function wave: fuzzy string matching, safe casts,
analytic window values, array set algebra, unpivot — completing the
B12/B16/B19/B21 families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hive_plan_service_spark.plans.registry import register
from hive_plan_service_spark.sources.catalog import register_tables


# --------------------------------------------------------------------------
# B16 — string wave 2: edit distance, translate, position, repeat/reverse,
# left/right, prefixes. initcap is emulated per-word in the oracle
# (DuckDB 1.0 lacks the builtin).
# --------------------------------------------------------------------------
@register(
    "b16_string_functions_2",
    oracle="""
      SELECT p_partkey,
             CAST(levenshtein(regexp_replace(p_name, '[^\\x00-\\x7F]', '?', 'g'),
                              'standard widget') AS BIGINT) AS edit_dist,
             translate(p_name, 'aeiou', 'AEIOU') AS voweled,
             CAST(position('widget' IN p_name) AS BIGINT) AS widget_at,
             repeat(left(p_brand, 2), 2) AS brand_echo,
             -- codepoint-level reverse: DuckDB's reverse() keeps grapheme
             -- clusters (base + combining marks) intact while Spark
             -- reverses CODEPOINTS; string_split(x, '') splits per
             -- codepoint, so reversing the list matches Spark exactly
             -- (found by the r7 fuzz sweep, seed 20260815)
             array_to_string(list_reverse(string_split(p_type, '')), '')
               AS type_rev,
             right(p_name, 6) AS name_tail,
             starts_with(p_type, 'ECON') AS is_econ,
             contains(p_name, 'small') AS has_small,
             -- initcap emulation with JAVA case semantics (r7 fuzz
             -- sweep): title-case of 'ß' is the full mapping 'Ss'
             -- (utf8proc upper gives 'ẞ'), title of 'ΰ' (U+03B0) is
             -- the full mapping Υ+0308+0301 (utf8proc 1:1, seed 13),
             -- and the lowered remainder needs Greek final-sigma
             -- context (Σ→ς at word end) — sigma-substitute on the
             -- WHOLE word first (1:1, slice positions unchanged),
             -- then slice
             array_to_string(list_transform(string_split(p_name, ' '),
               w -> CASE WHEN w[1] = 'ß' THEN 'Ss'
                         WHEN w[1] = 'ΰ' THEN '\u03a5\u0308\u0301'
                         ELSE upper(w[1]) END ||
                    lower(regexp_replace(w,
                      '(\\p{L})Σ(\\P{L}|$)', '\\1ς\\2', 'g')[2:])), ' ')
               AS name_title
      FROM part
    """,
    doc="levenshtein/translate/position/repeat/reverse/left/right/prefix tests/initcap.",
    tags=("B16",),
)
def b16_string_functions_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    p = spark.table("part")
    return p.select(
        "p_partkey",
        # levenshtein over an ASCII-folded projection: Spark counts
        # CODEPOINTS while DuckDB 1.0 counts BYTES, so any multi-byte
        # character (NBSP, CJK, emoji) skews the oracle by bytes−1 per
        # char (found by the hostile TPC-H sweep, ROUND5_NOTES §13).
        # Folding every non-ASCII codepoint to one '?' on BOTH sides
        # makes the distance alphabet byte==codepoint; exact and
        # unchanged on the all-ASCII fixture content.
        F.levenshtein(
            F.regexp_replace("p_name", "[^\\x00-\\x7F]", "?"),
            F.lit("standard widget"),
        )
        .cast("bigint")
        .alias("edit_dist"),
        F.translate("p_name", "aeiou", "AEIOU").alias("voweled"),
        F.instr("p_name", "widget").cast("bigint").alias("widget_at"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("brand_echo"),
        F.reverse("p_type").alias("type_rev"),
        F.substring(F.col("p_name"), -6, 6).alias("name_tail"),
        F.startswith(F.col("p_type"), F.lit("ECON")).alias("is_econ"),
        F.contains(F.col("p_name"), F.lit("small")).alias("has_small"),
        F.initcap("p_name").alias("name_title"),
    )


# --------------------------------------------------------------------------
# B21 — safe casts & extrema: try_cast swallows bad input as NULL in both
# engines (the non-throwing sibling of the ANSI casts in B21).
# --------------------------------------------------------------------------
@register(
    "b21_try_cast_safe",
    oracle="""
      SELECT o_orderkey,
             -- integral-only guard (the b21_conditional_null rule):
             -- DuckDB TRY_CAST also parses hex ('0x1F'→31), decimal
             -- ('42.5'→43) and scientific ('1e3'→1000) strings where
             -- Spark's try_cast yields NULL for all three (the hex
             -- class found by the r7 fuzz sweep, seed 20260815)
             CASE WHEN regexp_matches(trim(o_orderpriority), '^[+-]?[0-9]+$')
                  THEN TRY_CAST(o_orderpriority AS INT) END AS prio_int,
             CASE WHEN regexp_matches(left(o_orderpriority, 1), '^[0-9]$')
                  THEN TRY_CAST(left(o_orderpriority, 1) AS INT) END
               AS prio_digit,
             CAST(greatest(o_orderkey % 10, 5) AS BIGINT) AS hi,
             CAST(least(o_orderkey % 10, 5) AS BIGINT) AS lo
      FROM orders
    """,
    doc="try_cast (bad input → NULL, no ANSI error) + greatest/least.",
    tags=("B21",),
)
def b21_try_cast_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("prio_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.greatest(F.col("o_orderkey") % 10, F.lit(5)).cast("bigint").alias("hi"),
        F.least(F.col("o_orderkey") % 10, F.lit(5)).cast("bigint").alias("lo"),
    )


# --------------------------------------------------------------------------
# B12 — analytic value windows: first/last/nth over full frames, ntile,
# percent_rank/cume_dist (rational formulas — identical doubles).
# --------------------------------------------------------------------------
@register(
    "b12_analytic_value_windows",
    oracle="""
      SELECT o_orderkey,
             first_value(o_orderkey) OVER w AS first_key,
             last_value(o_orderkey)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_key,
             nth_value(o_orderkey, 2)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_key,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
    doc="first/last/nth_value over unbounded frames, ntile, percent_rank, cume_dist.",
    tags=("B12",),
)
def b12_analytic_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return spark.table("orders").select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --------------------------------------------------------------------------
# B19 — array set algebra, order-normalized via sort on both sides.
# --------------------------------------------------------------------------
@register(
    "b19_array_set_algebra",
    oracle="""
      WITH t AS (
        SELECT doc_id,
               string_split(text, ' ')[1:6] AS a,
               string_split(text, ' ')[4:9] AS b
        FROM documents
      )
      SELECT doc_id,
             -- DuckDB's list_sort of an empty list yields NULL; Spark's
             -- concat_ws yields '' — align with COALESCE
             COALESCE(array_to_string(list_sort(list_distinct(list_cat(a, b))), ','), '') AS union_sorted,
             COALESCE(array_to_string(list_sort(list_distinct(list_intersect(a, b))), ','), '') AS intersect_sorted,
             COALESCE(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS except_sorted
      FROM t
    """,
    doc="array_union/intersect/except, sort-normalized for cross-engine order.",
    tags=("B19",),
)
def b19_array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    d = spark.table("documents")
    words = F.split("text", " ")
    a = F.slice(words, 1, 6)
    b = F.slice(words, 4, 6)
    return d.select(
        "doc_id",
        F.concat_ws(",", F.array_sort(F.array_union(a, b))).alias("union_sorted"),
        F.concat_ws(",", F.array_sort(F.array_distinct(F.array_intersect(a, b)))).alias(
            "intersect_sorted"
        ),
        F.concat_ws(",", F.array_sort(F.array_distinct(F.array_except(a, b)))).alias(
            "except_sorted"
        ),
    )


# --------------------------------------------------------------------------
# B9 — unpivot/melt: wide → long.
# --------------------------------------------------------------------------
@register(
    "b09_unpivot",
    oracle="""
      SELECT p_partkey, metric, value FROM (
        SELECT p_partkey,
               CAST(p_size AS DOUBLE) AS size,
               p_retailprice AS price
        FROM part
      -- INCLUDE NULLS: Spark's Dataset.unpivot KEEPS null values
      -- where SQL UNPIVOT (and DuckDB's) drops them by default (r8
      -- numeric-NULL sweep: 400 vs 379 rows)
      ) UNPIVOT INCLUDE NULLS (value FOR metric IN (size, price))
    """,
    doc="unpivot(melt): one row per (key, metric, value).",
    tags=("B9",),
)
def b09_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    wide = spark.table("part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("price"),
    )
    return wide.unpivot("p_partkey", ["size", "price"], "metric", "value")


# --------------------------------------------------------------------------
# B20 — JSON serialization: struct → JSON string (int/string fields only;
# float formatting differs across engines and stays out).
# --------------------------------------------------------------------------
@register(
    "b20_json_serialize",
    oracle="""
      SELECT o_orderkey,
             to_json(struct_pack(k := o_orderkey, s := o_orderstatus))::VARCHAR
               AS as_json
      FROM orders
    """,
    doc="to_json(struct) round-trip; byte-identical {\"k\":..,\"s\":..} on both engines.",
    tags=("B20",),
)
def b20_json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    # ignoreNullFields=false: Spark's to_json OMITS null fields by
    # default while DuckDB's emits "s":null — silent divergence on the
    # first NULL status (found by the NULL-injection sweep,
    # ROUND5_NOTES §13); byte-identical either way on non-NULL rows.
    return spark.table("orders").select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("s")
            ),
            {"ignoreNullFields": "false"},
        ).alias("as_json"),
    )


# --------------------------------------------------------------------------
# B2/B21 — null-safe equality: <=> vs IS NOT DISTINCT FROM.
# --------------------------------------------------------------------------
@register(
    "b02_null_safe_equality",
    oracle="""
      SELECT c_custkey,
             (NULLIF(c_mktsegment, 'FURNITURE')
              IS NOT DISTINCT FROM NULLIF(c_mktsegment, 'FURNITURE')) AS self_nse,
             (NULLIF(c_mktsegment, 'FURNITURE') IS NOT DISTINCT FROM 'BUILDING')
               AS is_building_nse,
             (NULLIF(c_mktsegment, 'FURNITURE') IS NULL) AS hidden
      FROM customer
    """,
    doc="Null-safe equality (<=>): NULL <=> NULL is TRUE, NULL <=> x is FALSE.",
    tags=("B2", "B21"),
)
def b02_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    seg = F.nullif("c_mktsegment", F.lit("FURNITURE"))
    return spark.table("customer").select(
        "c_custkey",
        seg.eqNullSafe(seg).alias("self_nse"),
        seg.eqNullSafe(F.lit("BUILDING")).alias("is_building_nse"),
        seg.isNull().alias("hidden"),
    )
