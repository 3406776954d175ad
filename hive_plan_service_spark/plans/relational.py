"""Relational closure operators (SURVEY.md §2.B B1–B15).

Each query is the verification vehicle for one operator family: the
DataFrame builder is the engine-side implementation, the oracle string is
the ANSI-SQL ground truth DuckDB runs on identical parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hive_plan_service_spark.functions.exact import davg, dsum, epoch_seconds, money, rate
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
    tags=("A1", "A2", "B1"),
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
             CAST((CASE WHEN abs(o_totalprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(19,2)) END) * 2 AS DOUBLE) AS doubled,
             -- Java full case mapping: upper('ß')='SS' where utf8proc
             -- gives 'ẞ' (r7 fuzz, seed 7); upper('ΰ' U+03B0) expands
             -- to Υ+0308+0301 where utf8proc is 1:1 (seed 13)
             upper(replace(replace(o_orderstatus, 'ß', 'ss'), 'ΰ', '\u03a5\u0308\u0301'))
               AS status_uc,
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
        (money("o_totalprice") * 2).cast("double").alias("doubled"),
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
             CAST(CAST(SUM((CASE WHEN abs(c.c_acctbal) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(c.c_acctbal AS VARCHAR) AS DECIMAL(19,2)) END)) AS VARCHAR) AS DOUBLE) AS total_acctbal
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
             CAST(CAST(COALESCE(SUM((CASE WHEN abs(o.o_totalprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(o.o_totalprice AS VARCHAR) AS DECIMAL(19,2)) END)), 0) AS VARCHAR) AS DOUBLE) AS spend
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
             CAST(CAST(SUM((CASE WHEN abs(l_quantity) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(19,2)) END)) AS VARCHAR) AS DOUBLE) AS sum_qty,
             CAST(CAST(SUM((CASE WHEN abs(l_extendedprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(19,2)) END)) AS VARCHAR) AS DOUBLE) AS sum_base_price,
             CAST(CAST(SUM((CASE WHEN abs(l_extendedprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(19,2)) END)
                      * (1 - (CASE WHEN abs(l_discount) < 0.00005 THEN CAST(0 AS DECIMAL(9,4)) ELSE CAST(CAST(l_discount AS VARCHAR) AS DECIMAL(9,4)) END))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
             CAST(CAST(SUM((CASE WHEN abs(l_extendedprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(19,2)) END)
                      * (1 - (CASE WHEN abs(l_discount) < 0.00005 THEN CAST(0 AS DECIMAL(9,4)) ELSE CAST(CAST(l_discount AS VARCHAR) AS DECIMAL(9,4)) END))
                      * (1 + (CASE WHEN abs(l_tax) < 0.00005 THEN CAST(0 AS DECIMAL(9,4)) ELSE CAST(CAST(l_tax AS VARCHAR) AS DECIMAL(9,4)) END))) AS VARCHAR) AS DOUBLE) AS sum_charge,
             CAST(CAST(SUM((CASE WHEN abs(l_quantity) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(19,2)) END)) AS VARCHAR) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty,
             CAST(CAST(SUM((CASE WHEN abs(l_extendedprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(l_extendedprice AS VARCHAR) AS DECIMAL(19,2)) END)) AS VARCHAR) AS DOUBLE)
               / COUNT(l_extendedprice) AS avg_price,
             CAST(CAST(SUM((CASE WHEN abs(l_discount) < 0.00005 THEN CAST(0 AS DECIMAL(9,4)) ELSE CAST(CAST(l_discount AS VARCHAR) AS DECIMAL(9,4)) END)) AS VARCHAR) AS DOUBLE)
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


# --------------------------------------------------------------------------
# B7 — range/theta join: facts into value bands. Small band tables
# broadcast (nested-loop probe stays in the JVM); a fact-fact range join
# at 100 TB would instead bucketize the range key (see operators/asof.py
# for the related as-of pattern).
# --------------------------------------------------------------------------
@register(
    "b07_range_join_bands",
    oracle="""
      WITH bands(band, lo, hi) AS (
        VALUES ('budget', 0.0, 500.0),
               ('mid', 500.0, 1200.0),
               ('premium', 1200.0, 1000000.0)
      )
      SELECT b.band, COUNT(*) AS n_parts,
             CAST(CAST(SUM((CASE WHEN abs(p.p_retailprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(p.p_retailprice AS VARCHAR) AS DECIMAL(19,2)) END)) AS VARCHAR) AS DOUBLE) AS total_price
      FROM part p
      JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
      GROUP BY b.band
    """,
    doc="Theta join on [lo, hi) intervals via broadcast nested loop.",
    tags=("B7",),
)
def b07_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    p = spark.table("part")
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
            "inner",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum(money("p_retailprice"), "total_price"),
        )
    )


# --------------------------------------------------------------------------
# B8 — as-of join: for each purchase event, the latest click by the same
# user at-or-before it. Union+window implementation (operators/asof.py);
# the oracle uses DuckDB's native ASOF JOIN.
# --------------------------------------------------------------------------
@register(
    "b08_asof_join_purchase_click",
    oracle="""
      SELECT p.event_id, p.user_id, c.event_id AS last_click_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join via single-shuffle union+window (no range explosion).",
    tags=("B8",),
)
def b08_asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hive_plan_service_spark.operators.asof import asof_join

    register_tables(spark, sf_dir)
    ev = spark.table("events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["click_id"],
        inclusive=True,
        right_seq="click_id",  # pin ties at equal (user, ts): max id wins
    )
    return joined.select(
        "event_id", "user_id", F.col("click_id").alias("last_click_id")
    )


# --------------------------------------------------------------------------
# B10 — rollup with grouping id (hierarchy totals in one pass).
# --------------------------------------------------------------------------
@register(
    "b10_rollup",
    oracle="""
      SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             COUNT(*) AS n_orders,
             CAST(CAST(SUM((CASE WHEN abs(o_totalprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(19,2)) END)) AS VARCHAR) AS DOUBLE) AS total
      FROM orders
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      HAVING COUNT(*) > 0
    """,
    doc="ROLLUP: (status, priority) + per-status + grand total, tagged by "
        "grouping_id. Oracle HAVING mirrors Spark: on EMPTY input Spark "
        "emits 0 rows while DuckDB emits the grand-total row; exact on "
        "non-empty input where every grouping row covers ≥1 source row "
        "(empty-fixture sweep, ROUND5_NOTES §13).",
    tags=("B10",),
)
def b10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return (
        spark.table("orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice"), "total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total")
    )


@register(
    "b10_cube",
    oracle="""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
      HAVING COUNT(*) > 0
    """,
    doc="CUBE over two dims (oracle HAVING: Spark emits 0 rows on empty "
        "input, DuckDB the grand-total row — exact on non-empty).",
    tags=("B10",),
)
def b10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return (
        spark.table("lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n")
    )


# --------------------------------------------------------------------------
# B11 — approx count-distinct (HLL): the 100 TB answer to A9's exact
# counter. Approximate ⇒ rows-only check (sketches differ per engine).
# --------------------------------------------------------------------------
@register(
    "b11_approx_count_distinct",
    oracle=None,
    doc="approx_count_distinct(l_orderkey) per returnflag; HLL sketch, engine-specific values.",
    tags=("B11",),
)
def b11_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey").alias("approx_orders"))
    )


# --------------------------------------------------------------------------
# B12 — window functions: ranking, analytic, running frame aggregate.
# Running decimal sum is order-deterministic under the total order
# (o_orderdate, o_orderkey).
# --------------------------------------------------------------------------
@register(
    "b12_window_functions",
    oracle="""
      SELECT o_orderkey,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
             CAST(RANK() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC) AS BIGINT) AS price_rank,
             CAST(CAST(LAG((CASE WHEN abs(o_totalprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(19,2)) END)) OVER w AS VARCHAR) AS DOUBLE) AS prev_price,
             CAST(CAST(LEAD((CASE WHEN abs(o_totalprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(19,2)) END)) OVER w AS VARCHAR) AS DOUBLE) AS next_price,
             CAST(CAST(SUM((CASE WHEN abs(o_totalprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(19,2)) END))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
               AS running_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
    doc="row_number/rank/lag/lead + running sum over an ordered frame.",
    tags=("B12",),
)
def b12_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    o = spark.table("orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    frame = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        "o_orderkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(wr).cast("bigint").alias("price_rank"),
        F.lag(money("o_totalprice")).over(w).cast("double").alias("prev_price"),
        F.lead(money("o_totalprice")).over(w).cast("double").alias("next_price"),
        F.sum(money("o_totalprice")).over(frame).cast("double").alias("running_spend"),
    )


# --------------------------------------------------------------------------
# B13 — sort / limit / top-k. Global top-k uses TakeOrderedAndProject
# (no full sort); per-group top-k is a rank filter. Tie-broken by key so
# the result set is deterministic.
# --------------------------------------------------------------------------
@register(
    "b13_global_topk",
    oracle="""
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10
    """,
    doc="Global top-10 by price (deterministic tie-break) — TakeOrderedAndProject.",
    tags=("B13",),
)
def b13_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return (
        spark.table("orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "b13_topk_per_group",
    oracle="""
      SELECT c_custkey, o_orderkey, o_totalprice
      FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
      ) WHERE rn <= 3
    """,
    doc="Top-3 orders per customer via window rank filter.",
    tags=("B13",),
)
def b13_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        spark.table("orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# B14 — set operations over aligned schemas.
# --------------------------------------------------------------------------
@register(
    "b14_set_ops",
    oracle="""
      SELECT 'union' AS op, k FROM (
        SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
        UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
      UNION ALL
      SELECT 'intersect' AS op, k FROM (
        SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
        INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
      UNION ALL
      SELECT 'except' AS op, k FROM (
        SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
        EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
    """,
    doc="UNION/INTERSECT/EXCEPT (distinct variants), tagged into one result.",
    tags=("B14",),
)
def b14_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    c = spark.table("customer").select(F.col("c_nationkey").cast("bigint").alias("k"))
    s = spark.table("supplier").select(F.col("s_nationkey").cast("bigint").alias("k"))
    return (
        c.union(s).distinct().select(F.lit("union").alias("op"), "k")
        .unionByName(c.intersect(s).select(F.lit("intersect").alias("op"), "k"))
        .unionByName(c.subtract(s).select(F.lit("except").alias("op"), "k"))
    )


# --------------------------------------------------------------------------
# B15 — exact dedup by content key. ``dropDuplicates`` keeps an arbitrary
# row, which is nondeterministic across engines/runs — the engine's exact
# dedup is min-wins per key (deterministic, same single shuffle).
# --------------------------------------------------------------------------
@register(
    "b15_dedup_exact",
    oracle="""
      SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count
      FROM documents
      GROUP BY text
    """,
    doc="Exact dedup on documents.text: deterministic min-doc_id winner + group size.",
    tags=("B15",),
)
def b15_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return (
        spark.table("documents")
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keep_doc_id", "dup_count")
    )


# --------------------------------------------------------------------------
# B4/B13 — shipping-priority join (TPC-H Q3 shape): dim-filtered broadcast
# + fact-fact sort-merge join + agg + top-k. The bench headline for the
# shuffle path.
# --------------------------------------------------------------------------
@register(
    "b04_join_q3_shipping_priority",
    oracle="""
      SELECT l.l_orderkey AS o_orderkey,
             CAST(CAST(SUM((CASE WHEN abs(l.l_extendedprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(l.l_extendedprice AS VARCHAR) AS DECIMAL(19,2)) END)
                  * (1 - (CASE WHEN abs(l.l_discount) < 0.00005 THEN CAST(0 AS DECIMAL(9,4)) ELSE CAST(CAST(l.l_discount AS VARCHAR) AS DECIMAL(9,4)) END))) AS VARCHAR) AS DOUBLE)
               AS revenue,
             CAST(((epoch_us(o.o_orderdate) - ((epoch_us(o.o_orderdate) % 1000000 + 1000000) % 1000000)) // 1000000) AS BIGINT) AS orderdate_epoch
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15'
        AND l.l_shipdate > TIMESTAMP '1997-03-15'
      GROUP BY l.l_orderkey, o.o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10
    """,
    doc="Q3 shape: broadcast dim filter + SMJ fact join + agg + deterministic top-10.",
    tags=("B4", "B9", "B13"),
)
def b04_join_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    c = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.table("orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    li = spark.table("lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1997-03-15"))
    )
    revenue = money("l_extendedprice") * (1 - rate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # no broadcast hint on customer: it scales with SF (unlike
        # nation/region), so the build-or-shuffle choice belongs to AQE
        # runtime stats — at fixture scale it still broadcasts (pinned by
        # tests/test_plans.py), at 100 TB it degrades safely to SMJ
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("o_orderkey"),
            epoch_seconds("o_orderdate").alias("orderdate_epoch"),
        )
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "orderdate_epoch")
    )


# --------------------------------------------------------------------------
# B4 — 5-way star join (TPC-H Q5 shape): the full dim-chain broadcast +
# fact shuffle. Revenue per nation for one region/year.
# --------------------------------------------------------------------------
@register(
    "b04_join_q5_local_supplier",
    oracle="""
      SELECT n.n_name AS nation,
             CAST(CAST(SUM((CASE WHEN abs(l.l_extendedprice) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) ELSE CAST(CAST(l.l_extendedprice AS VARCHAR) AS DECIMAL(19,2)) END)
                  * (1 - (CASE WHEN abs(l.l_discount) < 0.00005 THEN CAST(0 AS DECIMAL(9,4)) ELSE CAST(CAST(l.l_discount AS VARCHAR) AS DECIMAL(9,4)) END))) AS VARCHAR) AS DOUBLE)
               AS revenue,
             COUNT(*) AS n_lineitems
      FROM region r
      JOIN nation n ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY n.n_name
    """,
    doc="Q5 shape: region->nation->customer dims broadcast, orders-lineitem shuffled once.",
    tags=("B4", "B9"),
)
def b04_join_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir)
    r = spark.table("region").filter(F.col("r_name") == "ASIA")
    n = spark.table("nation")
    c = spark.table("customer")
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1999-01-01")))
    )
    li = spark.table("lineitem")
    revenue = money("l_extendedprice") * (1 - rate("l_discount"))
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # dims is customer-sized (SF-proportional) — no hint; AQE
        # broadcasts while it fits and shuffles beyond that
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(revenue, "revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )
