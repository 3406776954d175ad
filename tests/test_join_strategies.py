"""Bucketed co-located joins and salted skew joins: correctness + plan shape."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from hive_plan_service_spark.operators.joins import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from hive_plan_service_spark.sources.catalog import register_tables


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    register_tables(spark, sf_dir)
    write_bucketed(spark.table("orders"), "orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        spark.table("lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        buckets=8,
    )
    # at fixture scale Catalyst (rightly) broadcasts instead and ignores
    # buckets; disable broadcast to exercise the big-fact-joins-big-fact
    # path that bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = _plan(joined)
        # bucket-aligned scans feed the SortMergeJoin without an Exchange
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketing did not co-locate"
        assert "Bucketed: true" in plan
        plain = spark.table("orders").join(
            spark.table("lineitem"),
            spark.table("orders").o_orderkey == spark.table("lineitem").l_orderkey,
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark, sf_dir):
    register_tables(spark, sf_dir)
    li = spark.table("lineitem").select("l_orderkey", "l_quantity")
    o = spark.table("orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    salted = salted_join(li, o, "l_orderkey", salt=8)
    plain = li.join(o, "l_orderkey")
    assert salted.count() == plain.count()
    s = salted.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    p = plain.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    assert s == p


def test_bloom_prefilter_superset_and_fp_bound(spark, sf_dir):
    """Bloom pass-set ⊇ true match set (no false negatives), false-positive
    rate within ~3× the analytic bound, and probe stays JVM-side."""
    import math

    from hive_plan_service_spark.operators.bloom import (
        DEFAULT_K,
        DEFAULT_M,
        bloom_build,
        bloom_prefilter,
    )

    register_tables(spark, sf_dir)
    dim = spark.table("customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    n_keys = dim.count()
    fact = spark.table("events").select("event_id", "user_id")
    bits = bloom_build(dim, "c_custkey")
    passed = bloom_prefilter(fact, "user_id", bits)

    true_ids = {
        r["event_id"]
        for r in fact.join(
            dim, fact.user_id == dim.c_custkey, "left_semi"
        ).collect()
    }
    passed_ids = {r["event_id"] for r in passed.collect()}
    assert true_ids <= passed_ids, "bloom dropped a genuine match"

    n_fact = fact.count()
    n_true = len(true_ids)
    fp_rate_bound = (1 - math.exp(-DEFAULT_K * n_keys / DEFAULT_M)) ** DEFAULT_K
    observed_fp = (len(passed_ids) - n_true) / max(n_fact - n_true, 1)
    assert observed_fp <= 3 * fp_rate_bound + 0.01, (observed_fp, fp_rate_bound)

    assert "BatchEvalPython" not in _plan(passed)
