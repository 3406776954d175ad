"""Skew-join evidence (VERDICT r1 #8): hot-key fixture + salted vs plain.

Builds a skewed copy of lineitem at $SPARK_GRAFT_SF_DIR (default sf0.1)
with 50% of rows remapped to ONE supplier key, then times a
per-supplier aggregate join against the supplier dim under three
strategies, broadcast disabled so the shuffle path is exercised:

  plain      — SortMergeJoin, no AQE skew handling: the hot key's
               partition holds half the fact table in one task.
  salted     — operators.joins.salted_join, salt=16: the hot key is
               spread across 16 tasks.
  aqe_skew   — AQE skewJoin enabled: runtime split of the oversized
               partition (the config the engine ships in session.tune).

Prints one JSON line; numbers are recorded in ROUND2_NOTES.md.
Run: python scripts/skew_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_plan_service_spark.operators.joins import salted_join
from hive_plan_service_spark.session import tune

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _run(df) -> float:
    t = time.time()
    df.agg(F.count(F.lit(1)), F.sum("l_quantity")).collect()
    return round(time.time() - t, 3)


def main() -> None:
    spark = tune(
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    hot = li.agg(F.min("l_suppkey")).collect()[0][0]
    workdir = tempfile.mkdtemp(prefix="skew_fixture_")
    skew_path = os.path.join(workdir, "lineitem_skewed")
    # deterministic hot-key fixture, replicated ×20 (~12M rows at sf0.1)
    # so the hot key's reducer holds enough data for skew to dominate:
    # half of all rows land on ONE suppkey
    mult = int(os.environ.get("SKEW_BENCH_MULT", "20"))
    (
        li.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
        .withColumn(
            "l_suppkey",
            F.when(
                F.xxhash64("l_orderkey", "l_linenumber", "_rep") % 2 == 0,
                F.lit(hot),
            ).otherwise(F.col("l_suppkey")),
        )
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(skew_path)
    )

    skewed = spark.read.parquet(skew_path).select(
        "l_suppkey", "l_quantity", "l_extendedprice"
    )
    supp = spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet")).select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey"
    )
    frac = skewed.filter(F.col("l_suppkey") == hot).count() / skewed.count()

    results: dict[str, float] = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    for _ in range(2):  # first pass warms the page cache; keep the second
        results["plain"] = _run(skewed.join(supp, "l_suppkey"))
        results["salted"] = _run(salted_join(skewed, supp, "l_suppkey", salt=16))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    # local fixture partitions are far below the 256m default threshold —
    # scale it down so AQE's split logic engages like it would at 100 TB
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    results["aqe_skew"] = _run(skewed.join(supp, "l_suppkey"))

    # hot-key AGGREGATION is a non-issue by construction: partial
    # (map-side) aggregation reduces each partition to one row per key
    # before the shuffle, so the hot key ships #partitions rows, not 6M.
    # Timed here as evidence against the uniform-key baseline.
    t = time.time()
    skewed.groupBy("l_suppkey").agg(F.count(F.lit(1)), F.sum("l_quantity")).collect()
    results["agg_skewed_key"] = round(time.time() - t, 3)
    t = time.time()
    spark.read.parquet(skew_path).groupBy("l_orderkey").agg(
        F.count(F.lit(1)), F.sum("l_quantity")
    ).count()
    results["agg_uniform_key"] = round(time.time() - t, 3)

    # correctness on the skewed input: salted result == plain result
    plain_agg = (
        skewed.join(supp, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted_agg = (
        salted_join(skewed, supp, "l_suppkey", salt=16)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    diff = plain_agg.exceptAll(salted_agg).count() + salted_agg.exceptAll(plain_agg).count()
    assert diff == 0, f"salted join diverged from plain on {diff} grouped rows"

    print(
        json.dumps(
            {
                "metric": "skew_join_seconds",
                "sf_dir": SF_DIR,
                "hot_key_fraction": round(frac, 3),
                "rows": skewed.count(),
                **results,
                "salted_equals_plain": True,
            }
        )
    )


if __name__ == "__main__":
    main()
