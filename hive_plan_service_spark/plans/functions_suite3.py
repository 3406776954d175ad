"""Third completion wave: date formatting, split_part, boolean
aggregates, array flatten/zip — rounding out B9/B16/B17/B19.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_plan_service_spark.plans.registry import register
from hive_plan_service_spark.sources.catalog import register_tables


@register(
    "b17_date_formatting",
    oracle="""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
             strftime(o_orderdate, '%Y/%m') AS year_month,
             CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS date_key
      FROM orders
    """,
    doc="date_format/strftime parity for ISO, partition-key, and surrogate-key shapes.",
    tags=("B17",),
)
def b17_date_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
        F.date_format("o_orderdate", "yyyy/MM").alias("year_month"),
        F.date_format("o_orderdate", "yyyyMMdd").cast("bigint").alias("date_key"),
    )


@register(
    "b09_boolean_aggregates",
    oracle="""
      SELECT o_orderstatus,
             bool_and(o_totalprice > 0) AS all_positive,
             bool_or(o_totalprice > 400000) AS any_jumbo,
             CAST(count_if(o_orderpriority LIKE '1-%') AS BIGINT) AS n_urgent
      FROM orders GROUP BY o_orderstatus
    """,
    doc="bool_and/bool_or/count_if grouped aggregates.",
    tags=("B9",),
)
def b09_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
        F.count_if(F.col("o_orderpriority").like("1-%"))
        .cast("bigint")
        .alias("n_urgent"),
    )


@register(
    "b16_split_part",
    oracle="""
      SELECT o_orderkey,
             CASE WHEN o_orderpriority IS NULL THEN NULL
                  ELSE split_part(o_orderpriority, '-', 1) END AS prio_code,
             CASE WHEN o_orderpriority IS NULL THEN NULL
                  ELSE split_part(o_orderpriority, '-', 2) END AS prio_name
      FROM orders
    """,
    doc="split_part field extraction (1-indexed in both engines; DuckDB "
        "returns '' for NULL input where Spark propagates NULL — oracle "
        "guards with CASE, found by the NULL-injection sweep).",
    tags=("B16",),
)
def b16_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.select(
        "o_orderkey",
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1)).alias("prio_code"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).alias("prio_name"),
    )


@register(
    "b19_array_flatten_zip",
    oracle="""
      WITH t AS (
        SELECT doc_id,
               string_split(text, ' ')[1:3] AS a,
               string_split(text, ' ')[4:6] AS b
        FROM documents
      )
      SELECT doc_id,
             -- COALESCE: Spark's concat_ws NEVER returns NULL (yields ''
             -- on a NULL array from NULL text) while array_to_string
             -- propagates NULL — NULL-documents sweep, ROUND5_NOTES §13
             COALESCE(array_to_string(flatten([a, b]), ','), '') AS flat,
             -- '||', never concat: list_zip NULL-pads the shorter side
             -- and DuckDB's concat SKIPS NULLs ('w:') where Spark's
             -- propagates (NULL element, dropped by concat_ws) —
             -- invariant 7's concat rule, resurfaced through zip
             -- padding on texts with <6 space-separated tokens (r7
             -- fuzz sweep, seed 20260815; the static content mode
             -- never mutated documents)
             COALESCE(array_to_string(
               list_transform(list_zip(a, b), p -> p[1] || ':' || p[2]), ','), '')
               AS zipped
      FROM t
    """,
    doc="flatten(array<array>) and arrays_zip element pairing.",
    tags=("B19",),
)
def b19_array_flatten_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    d = spark.table("documents")
    words = F.split("text", " ")
    a, b = F.slice(words, 1, 3), F.slice(words, 4, 3)
    return d.select(
        "doc_id",
        F.concat_ws(",", F.flatten(F.array(a, b))).alias("flat"),
        F.concat_ws(
            ",", F.zip_with(a, b, lambda x, y: F.concat(x, F.lit(":"), y))
        ).alias("zipped"),
    )
