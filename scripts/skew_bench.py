"""Skew-join evidence: hot-key fixtures, AQE skew-split forensics.

Two probes:

* ``python scripts/skew_bench.py`` — (r1 #8) supplier-key skew on
  lineitem: plain vs salted vs AQE-skew wall-clock.
* ``python scripts/skew_bench.py star`` — (VERDICT r3 #4) the Q3-shaped
  customer⋈orders star join with ONE customer owning ~20% of orders at
  sf0.1×10, run with the event log enabled. Reports, for skew-join OFF
  vs ON: wall-clock, whether the executed plan carries the AQE
  ``skew=true`` marker, and the max/median task-duration ratio of the
  heaviest stage parsed from the Spark event log — the straggler
  evidence (a healthy split keeps max/median under ~5×).

The default probe builds a skewed copy of lineitem at $SPARK_GRAFT_SF_DIR
(default sf0.1) with 50% of rows remapped to ONE supplier key, then
times a per-supplier aggregate join against the supplier dim under three
strategies, broadcast disabled so the shuffle path is exercised:

  plain      — SortMergeJoin, no AQE skew handling: the hot key's
               partition holds half the fact table in one task.
  salted     — operators.joins.salted_join, salt=16: the hot key is
               spread across 16 tasks.
  aqe_skew   — AQE skewJoin enabled: runtime split of the oversized
               partition (the config the engine ships in session.tune).

Each mode prints one JSON line; numbers are recorded in ROUND{2,4}_NOTES.md.
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


def _stage_task_stats(event_log_dir: str) -> dict[int, dict]:
    """Per-stage task-duration stats parsed from the Spark event log
    (v2 rolling layout: an eventlog_v2_* directory of events_* files)."""
    import statistics

    stages: dict[int, list[float]] = {}
    event_files = []
    for root, _dirs, files in os.walk(event_log_dir):
        event_files += [
            os.path.join(root, f)
            for f in files
            if f.startswith("events_") or f.startswith("local-")
        ]
    for f in event_files:
        with open(f, errors="replace") as fh:
            for line in fh:
                if '"Event":"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                info = ev.get("Task Info", {})
                dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
                stages.setdefault(ev.get("Stage ID", -1), []).append(dur)
    out = {}
    for sid, durs in stages.items():
        med = statistics.median(durs) or 1.0
        out[sid] = {
            "n_tasks": len(durs),
            "median_ms": round(med, 1),
            "max_ms": max(durs),
            "straggler_ratio": round(max(durs) / med, 2),
            "sum_ms": sum(durs),
        }
    return out


def star_probe() -> None:
    """Customer-hot-key star join (Q3 shape) under AQE skew handling.

    invariant 9 leaves SF-proportional join sides to AQE instead of a
    broadcast hint; this probe is the proof that AQE's skew split
    actually engages on the resulting shuffle join and removes the
    straggler, at a deliberately hostile key distribution (one customer
    owning ~20% of all orders, fact side replicated ×10).
    """
    from pyspark.sql import functions as F  # noqa: F811 (script scope)

    from hive_plan_service_spark.session import scratch_root

    mult = int(os.environ.get("SKEW_BENCH_MULT", "10"))
    workdir = tempfile.mkdtemp(prefix="skew_star_", dir=scratch_root())
    fact_path = os.path.join(workdir, "orders_skewed")

    def build_session(event_dir: str):
        spark = tune(
            SparkSession.builder.master(f"local[{CPUS}]")
            .config("spark.driver.memory", "16g")
            .config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.compress", "false")  # plain JSONL
            .config("spark.eventLog.dir", f"file://{event_dir}")
            .getOrCreate()
        )
        # AFTER tune (which sets max(8, cpu_count)): straggler ratios
        # are only comparable across boxes at a fixed partition count
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        # Force the shuffle-join path: at 100 TB the customer side would
        # not broadcast, and broadcast joins have no skew to probe.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # scale AQE's size thresholds to the local fixture (partitions
        # here are a few compressed MBs, not the 256m cluster default)
        # so the split logic engages as it would at 100 TB sizes
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        return spark

    def q(spark):
        # The aggregate keeps o_totalprice/o_orderdate live so the fact
        # shuffle carries real payload bytes: with a count-only probe,
        # column pruning leaves just the 8-byte key, and the hot
        # partition — millions of copies of ONE key — lz4-compresses
        # below any size threshold, hiding the skew from AQE's
        # size-based detection. (Real star joins always carry payload.)
        fact = spark.read.parquet(fact_path).select(
            "o_custkey", "o_totalprice", "o_orderdate"
        )
        dim = spark.read.parquet(
            os.path.join(SF_DIR, "customer.parquet")
        ).select("c_custkey", "c_mktsegment", "c_nationkey")
        return (
            fact.join(dim, fact.o_custkey == dim.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
                F.max("o_orderdate").alias("last_order"),
            )
        )

    # Fixture built in its own session so neither mode's event log
    # carries the write stages.
    fixture_log = os.path.join(workdir, "eventlog_fixture")
    os.makedirs(fixture_log, exist_ok=True)
    spark = build_session(fixture_log)
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    hot = cust.agg(F.min("c_custkey")).collect()[0][0]
    (
        orders.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
        .withColumn(
            "o_custkey",
            F.when(
                F.xxhash64("o_orderkey", "_rep") % 5 == 0, F.lit(hot)
            ).otherwise(F.col("o_custkey")),
        )
        .drop("_rep")
        .write.mode("overwrite")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    hot_frac = fact.filter(F.col("o_custkey") == hot).count() / fact.count()
    spark.stop()

    results: dict[str, dict] = {}
    # One session (and one event log) per mode, so each log's heaviest
    # stage IS that mode's join — no cross-run stage-id guessing.
    for mode, enabled in (("skew_off", "false"), ("skew_on", "true")):
        event_dir = os.path.join(workdir, f"eventlog_{mode}")
        os.makedirs(event_dir, exist_ok=True)
        spark = build_session(event_dir)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", enabled)
        q(spark).collect()  # warm (page cache, codegen)
        df = q(spark)
        t0 = time.time()
        df.collect()
        wall = round(time.time() - t0, 3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        spark.stop()  # flush the event log
        stats = _stage_task_stats(event_dir)
        # The verdict criterion is "no straggler task >= 5x its stage
        # median": report the worst ratio over every multi-task stage
        # that did real work (scan stages included — their medians are
        # their own). The sum_ms floor keeps millisecond-scale noise
        # stages, whose near-zero medians explode the ratio, out of the
        # verdict.
        multi = {
            sid: s
            for sid, s in stats.items()
            if s["n_tasks"] >= 4 and s["sum_ms"] >= 500
        }
        results[mode] = {
            "wall_sec": wall,
            "plan_has_skew_marker": "skew=true" in plan,
        }
        if multi:
            worst_sid, worst = max(
                multi.items(), key=lambda kv: kv[1]["straggler_ratio"]
            )
            results[mode]["worst_straggler_ratio"] = worst["straggler_ratio"]
            results[mode]["worst_stage"] = {"stage_id": worst_sid, **worst}
        else:  # empty/unflushed log or everything coalesced below 4 tasks
            results[mode]["worst_straggler_ratio"] = None

    print(
        json.dumps(
            {
                "metric": "skew_star_join",
                "sf_dir": SF_DIR,
                "mult": mult,
                "hot_key_fraction": round(hot_frac, 3),
                **results,
            }
        )
    )


def lsh_probe() -> None:
    """Skew-certify the LSH (band, bucket) self-join exchange (VERDICT
    r4 #6 — the star probe covered only the star join).

    A boilerplate-heavy corpus puts B documents into one band bucket,
    and the pair self-join then carries B rows (and emits B²/2 pairs)
    through that ONE shuffle partition. Fixture: the scale-probe
    distinct-copy corpus with every ``hot_every``-th document's text
    REPLACED by one shared boilerplate string — identical text means
    identical signatures, so the group collides in every band. The
    group size is chosen to keep the uncapped B²-pair join feasible on
    one box (the fraction is a knob, not the mechanism; at 20% of 500k
    docs the uncapped join is ~5G pairs and nothing would finish —
    which is itself the point of ``max_bucket``).

    Three modes, each in its own event-logged session:
      skew_off — AQE skew split disabled, no cap: the hot bucket is one
                 straggler task doing B²-pair work.
      skew_on  — AQE splits the oversized partition: same total work,
                 bounded straggler.
      capped   — ``max_bucket`` drops over-cap buckets before the join:
                 the B² work disappears entirely (the production answer;
                 see llm_dedup_clusters_capped for when it is safe).
    """
    from pyspark.sql import functions as F  # noqa: F811 (script scope)

    from hive_plan_service_spark.operators import dedup as dd
    from hive_plan_service_spark.session import scratch_root

    mult = int(os.environ.get("SKEW_BENCH_MULT", "40"))
    hot_every = int(os.environ.get("SKEW_BENCH_HOT_EVERY", "25"))
    cap = int(os.environ.get("SKEW_BENCH_MAX_BUCKET", "64"))
    workdir = tempfile.mkdtemp(prefix="skew_lsh_", dir=scratch_root())
    corpus_path = os.path.join(workdir, "corpus")

    def build_session(event_dir: str):
        spark = tune(
            SparkSession.builder.master(f"local[{CPUS}]")
            .config("spark.driver.memory", "16g")
            .config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.dir", f"file://{event_dir}")
            .getOrCreate()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        # scale AQE's size thresholds to local fixture sizes, as in the
        # star probe — but much lower here: the hot (band,bucket) group's
        # INPUT is only B rows of (band, bucket, doc_id) ≈ hundreds of
        # KB even when its pair OUTPUT is B²/2 ≈ tens of millions.
        # OptimizeSkewedJoin decides on map-output bytes. The 64k
        # threshold removes the absolute-size gate, but detection ALSO
        # requires the partition to exceed factor × median — and the
        # hot bucket's ~8000-row input is about the SIZE OF AN ORDINARY
        # PARTITION here (800k banded rows / 32 ≈ 25k rows median), so
        # even factor=2 + force never fires (measured: join stage stays
        # 32 tasks, no skew marker, 92–125 s straggler). That is the
        # probe's finding, not a tuning failure: multiplicity skew
        # (B² pair OUTPUT from a normal-sized B-row input) is
        # structurally invisible to an input-byte heuristic at any
        # threshold — the measured basis for max_bucket (invariant
        # 10's cap) being the production defense rather than AQE.
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
        # Force the 100 TB join shape. At fixture scale Catalyst picks a
        # BROADCAST hash join for the pair self-join, and then (measured,
        # first run of this probe) bucket skew structurally cannot exist:
        # pair emission runs on the STREAM side, which is doc-partitioned
        # by the signature exchange, so a hot bucket's B docs are spread
        # across every task (~even 16 × 19 s), and the pair dedup reuses
        # that same doc_a partitioning with NO extra shuffle (grouping on
        # (doc_a, doc_b) is satisfied by hashpartitioning(doc_a)). At
        # 100 TB the banded relation cannot broadcast, the join is SMJ on
        # (band, bucket), and the hot bucket IS one shuffle partition —
        # that is the shape this probe certifies, so disable broadcast.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return spark

    # fixture session (kept out of the probe event logs)
    fixture_log = os.path.join(workdir, "eventlog_fixture")
    os.makedirs(fixture_log, exist_ok=True)
    spark = build_session(fixture_log)
    from scripts.scale_probe import multiplied_docs

    from hive_plan_service_spark.sources.catalog import register_tables

    register_tables(spark, SF_DIR)
    base, tmp_path = multiplied_docs(spark, mult)
    boiler = " ".join(f"boilerplate{i} legal footer common" for i in range(12))
    (
        base.withColumn(
            "text",
            F.when(F.col("doc_id") % hot_every == 0, F.lit(boiler)).otherwise(
                F.col("text")
            ),
        )
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()
    n_hot = docs.filter(F.col("doc_id") % hot_every == 0).count()
    import shutil as _sh

    _sh.rmtree(tmp_path, ignore_errors=True)
    spark.stop()

    results: dict[str, dict] = {}
    modes = (
        ("skew_off", "false", None),
        ("skew_on", "true", None),
        ("capped", "true", cap),
    )
    for mode, skew_enabled, max_bucket in modes:
        event_dir = os.path.join(workdir, f"eventlog_{mode}")
        os.makedirs(event_dir, exist_ok=True)
        spark = build_session(event_dir)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_enabled)
        if skew_enabled == "true":
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        corpus = spark.read.parquet(corpus_path)

        def q():
            return dd.minhash_lsh_pairs(
                corpus,
                num_hashes=16,
                bands=4,
                est_threshold=0.5,
                max_bucket=max_bucket,
            )

        q().count()  # warm: page cache + codegen
        timed = q()
        t0 = time.time()
        n_pairs = timed.count()
        wall = round(time.time() - t0, 3)
        # the marker only appears in AQE's FINAL plan, so it must be
        # read from the EXECUTED DataFrame — a fresh q() here would
        # show the initial plan and always report false.
        plan = timed._jdf.queryExecution().executedPlan().toString()
        spark.stop()
        stats = _stage_task_stats(event_dir)
        results[mode] = {
            "wall_sec": wall,
            "pairs": n_pairs,
            "plan_has_skew_marker": "skew=true" in plan,
            # the hot join stage can be ANY task count after AQE (a
            # split turns 1 straggler into N medium tasks; a coalesce
            # can leave it at 2-3 tasks, under the star probe's >= 4
            # filter) — so rank stages by their WORST TASK, which is
            # what a straggler is, and report the top 3 for the table.
            "top_stages_by_max_task": [
                {"stage_id": sid, **s}
                for sid, s in sorted(
                    stats.items(), key=lambda kv: -kv[1]["max_ms"]
                )[:3]
            ],
        }

    print(
        json.dumps(
            {
                "metric": "skew_lsh_band_bucket",
                "sf_dir": SF_DIR,
                "mult": mult,
                "n_docs": n_docs,
                "hot_bucket_docs": n_hot,
                "max_bucket": cap,
                **results,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "star":
        star_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "lsh":
        lsh_probe()
    else:
        main()
