"""Relational closure operators (SURVEY.md §2.B B1–B15).

Each query is the verification vehicle for one operator family: the
DataFrame builder is the engine-side implementation, the oracle string is
the ANSI-SQL ground truth DuckDB runs on identical parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hive_plan_service_spark.functions.exact import davg, dsum, money, rate
from hive_plan_service_spark.plans.registry import register
from hive_plan_service_spark.sources.catalog import register_tables


# --------------------------------------------------------------------------
# B1 — source registry / parquet scan + projection (reference A1/A2:
# src/plan-processor.ts:30,45 — manual column lists; Catalyst prunes here).
# --------------------------------------------------------------------------
@register(
    "b01_scan_projection",
    oracle="""
      SELECT p_partkey, p_name, CAST(p_size AS BIGINT) AS size_big
      FROM part
    """,
    doc="Parquet scan with column pruning — ReadSchema must show 3 cols.",
    tags=("B1",),
)
def b01_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.table("part").select(
        "p_partkey",
        "p_name",
        F.col("p_size").cast("bigint").alias("size_big"),
    )


# --------------------------------------------------------------------------
# B2 — filters: range, IN, LIKE, null-safe; all pushed to the parquet scan.
# --------------------------------------------------------------------------
@register(
    "b02_filter_pushdown",
    oracle="""
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24
        AND l_returnflag IN ('A', 'N')
        AND l_linestatus LIKE 'O%'
    """,
    doc="Conjunctive predicates (range/BETWEEN/IN/LIKE) with pushdown.",
    tags=("B2",),
)
def b02_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "N")
        & F.col("l_linestatus").like("O%")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


# --------------------------------------------------------------------------
# B3 — projection with computed columns (reference A1 projection + the
# struct literals at src/plan-processor.ts:33–37 generalized).
# --------------------------------------------------------------------------
@register(
    "b03_computed_projection",
    oracle="""
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS doubled,
             upper(o_orderstatus) AS status_uc,
             (o_orderkey % 7 = 0) AS lucky
      FROM orders
    """,
    doc="Computed/derived columns; arithmetic kept exact via DECIMAL.",
    tags=("B3",),
)
def b03_computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    o = spark.table("orders")
    return o.select(
        "o_orderkey",
        (money("o_totalprice") * 2).alias("doubled"),
        F.upper("o_orderstatus").alias("status_uc"),
        (F.col("o_orderkey") % 7 == 0).alias("lucky"),
    )


# --------------------------------------------------------------------------
# B4 — inner equi-join, broadcast for the dim side (reference A4 keyed
# lookup src/plan-processor.ts:58 — the Spark-idiomatic per-row KV probe).
# --------------------------------------------------------------------------
@register(
    "b04_join_inner_broadcast",
    oracle="""
      SELECT n.n_name AS nation, COUNT(*) AS n_customers,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    """,
    doc="Broadcast hash join of fact→dim, then aggregate.",
    tags=("B4",),
)
def b04_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    c = spark.table("customer")
    n = spark.table("nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(money("c_acctbal"), "total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# B5 — outer join with null-default (reference A12 missing-key→0,
# src/plan-server.ts:77–82 generalized to relational form).
# --------------------------------------------------------------------------
@register(
    "b05_join_left_outer",
    oracle="""
      SELECT c.c_custkey,
             COALESCE(CAST(COUNT(o.o_orderkey) AS BIGINT), 0) AS n_orders,
             CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    """,
    doc="Left outer join; unmatched keys surface as 0 via coalesce.",
    tags=("B5",),
)
def b05_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    c = spark.table("customer")
    o = spark.table("orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(money("o_totalprice")), F.lit(0))
            .cast("double")
            .alias("spend"),
        )
    )


# --------------------------------------------------------------------------
# B6 — semi / anti join (reference A3 membership test generalized).
# --------------------------------------------------------------------------
@register(
    "b06_join_semi",
    oracle="""
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
    doc="Left-semi join = EXISTS.",
    tags=("B6",),
)
def b06_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    c = spark.table("customer")
    big = spark.table("orders").filter(F.col("o_totalprice") > 100000)
    return c.join(big, big.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "b06_join_anti",
    oracle="""
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="Left-anti join = NOT EXISTS.",
    tags=("B6",),
)
def b06_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    c = spark.table("customer")
    o = spark.table("orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# B9 — hash aggregation: the flagship pricing summary (TPC-H Q1 shape).
# Exercises scan → filter → partial/final HashAggregate → sort. This is
# ``entry()``'s query. Exact DECIMAL accumulation keeps the value hash
# deterministic at any parallelism (see functions/exact.py).
# --------------------------------------------------------------------------
FLAGSHIP_NAME = "b09_agg_pricing_summary"


@register(
    FLAGSHIP_NAME,
    oracle="""
      SELECT l_returnflag, l_linestatus,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(8,4)))
                      * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
               / COUNT(l_extendedprice) AS avg_price,
             CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE)
               / COUNT(l_discount) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      GROUP BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary: 2-key groupBy, 8 aggregates (sum/avg/count).",
    tags=("B9", "flagship"),
)
def b09_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    li = spark.table("lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02"))
    )
    disc_price = money("l_extendedprice") * (1 - rate("l_discount"))
    charge = disc_price * (1 + rate("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(money("l_quantity"), "sum_qty"),
        dsum(money("l_extendedprice"), "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg(money("l_quantity"), "avg_qty"),
        davg(money("l_extendedprice"), "avg_price"),
        davg(rate("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "b09_agg_minmax_distinct",
    oracle="""
      SELECT l_returnflag,
             CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
             CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
             COUNT(DISTINCT l_orderkey) AS n_orders,
             COUNT(DISTINCT l_suppkey) AS n_suppliers
      FROM lineitem
      GROUP BY l_returnflag
    """,
    doc="min/max/count(distinct) — exact distinct shuffles by key.",
    tags=("B9",),
)
def b09_agg_minmax_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    li = spark.table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )
