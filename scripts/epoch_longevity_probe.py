"""Epoch-store longevity probe (VERDICT r5 item #6).

The scale rows so far covered ~10 epochs; a long-lived continuous
rollup sees thousands, with many successive compactions, lazy-GC
states, and at-least-once replays mixed in. This probe drives ~200
foreachBatch epochs through ``ContinuousHourlyRollup._refresh_buckets``
(batch-mode delivery, exactly how the streaming engine calls it),
with:

* an advancing event-time clock (each epoch moves ~6h forward) plus a
  10% late-data tail landing 3 days back, so compactions keep touching
  both hot and cooling days;
* compaction every ``compact_after=8`` epochs → ~24 compactions, bases
  repeatedly superseding bases;
* mid-stream REPLAYS of an epoch long folded into a base (at epoch 60,
  replay 30) and of a recent raw epoch (at 130, replay 128) — the
  rollup must stay bit-identical both times;
* truth checks every 25 epochs: the public rollup must equal a full
  recompute over every event delivered so far (exactly-once despite
  replays);
* flat-cost check: mean non-compaction epoch wall over the first 20 vs
  the last 20 epochs, and the live raw-directory count staying bounded
  by compact_after+1.

Usage: python scripts/epoch_longevity_probe.py [n_epochs]
Prints JSON progress rows and one final summary row; exit 1 on any
divergence.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from hive_plan_service_spark.functions.exact import money  # noqa: E402
from hive_plan_service_spark.session import get_spark  # noqa: E402
from hive_plan_service_spark.streaming import epoch_store  # noqa: E402
from hive_plan_service_spark.streaming.continuous_agg import (  # noqa: E402
    ContinuousHourlyRollup,
)

BASE_TS = 1_700_000_000  # fixed epoch-seconds origin (no Date.now in probes)
ROWS_PER_EPOCH = 2_000


def make_batch(spark, epoch: int):
    """Deterministic per-epoch event batch (regenerable for replays)."""
    ts = (
        F.lit(BASE_TS + epoch * 6 * 3600)
        + F.when(F.col("id") % 10 == 0, F.lit(-3 * 86400)).otherwise(F.lit(0))
        + F.pmod(F.xxhash64("id", F.lit(epoch)), F.lit(6 * 3600))
    )
    types = F.array(F.lit("click"), F.lit("view"), F.lit("purchase"))
    return spark.range(ROWS_PER_EPOCH).select(
        (F.lit(epoch) * 1_000_000 + F.col("id")).alias("event_id"),
        F.timestamp_seconds(ts).alias("ts"),
        F.element_at(types, (F.col("id") % 3 + 1).cast("int")).alias(
            "event_type"
        ),
        (
            F.pmod(F.xxhash64(F.col("id") + F.lit(epoch)), F.lit(10_000))
            .cast("double")
            / F.lit(100.0)
        ).alias("value"),
    )


def rollup_snapshot(spark, out_path: str) -> dict:
    return {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.read.parquet(out_path).collect()
    }


def truth_snapshot(spark, events_dir: str) -> dict:
    ev = spark.read.parquet(events_dir)
    agg = (
        ev.withColumn("hour_bucket", F.expr("unix_timestamp(ts) div 3600"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
    )
    return {
        (r["hour_bucket"], r["event_type"]): (r["n"], r["total_value"])
        for r in agg.collect()
    }


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark(app_name="hpss-epoch-longevity")
    work = tempfile.mkdtemp(prefix="epoch_longevity_")
    events_log = os.path.join(work, "all_events")
    m = ContinuousHourlyRollup(
        spark, events_path="unused", workdir=work, compact_after=8
    )
    replays = {60: 30, 130: 128}  # at epoch k, replay epoch v
    walls: list[tuple[int, float, bool]] = []  # (epoch, sec, compacted?)
    max_raw_dirs = 0
    failures: list[str] = []

    for e in range(n_epochs):
        batch = make_batch(spark, e)
        # keep the truth log: exactly-once ground truth for checkpoints
        batch.write.mode("append").parquet(events_log)
        raw_before = set(epoch_store.scan_epoch_dirs(m.seen_raw))
        t0 = time.perf_counter()
        m._refresh_buckets(batch, epoch_id=e)
        wall = time.perf_counter() - t0
        raw_after = set(epoch_store.scan_epoch_dirs(m.seen_raw))
        compacted = len(raw_after) < len(raw_before)
        walls.append((e, wall, compacted))
        max_raw_dirs = max(max_raw_dirs, len(raw_after))

        if e in replays:
            old = replays[e]
            before = rollup_snapshot(spark, m.out)
            m._refresh_buckets(make_batch(spark, old), epoch_id=old)
            after = rollup_snapshot(spark, m.out)
            if before != after:
                failures.append(
                    f"replay of epoch {old} at {e} changed the rollup"
                )
            print(
                json.dumps(
                    {
                        "event": "replay",
                        "at_epoch": e,
                        "replayed": old,
                        "identical": before == after,
                    }
                ),
                flush=True,
            )

        if (e + 1) % 25 == 0 or e == n_epochs - 1:
            got = rollup_snapshot(spark, m.out)
            want = truth_snapshot(spark, events_log)
            ok = got == want
            if not ok:
                failures.append(f"truth divergence after epoch {e}")
            recent = [w for (_, w, c) in walls[-20:] if not c]
            print(
                json.dumps(
                    {
                        "event": "checkpoint",
                        "epoch": e,
                        "rollup_rows": len(got),
                        "truth_match": ok,
                        "live_raw_dirs": len(raw_after),
                        "mean_epoch_sec_recent": round(
                            sum(recent) / max(1, len(recent)), 3
                        ),
                    }
                ),
                flush=True,
            )

    first = [w for (_, w, c) in walls[:20] if not c]
    last = [w for (_, w, c) in walls[-20:] if not c]
    compactions = sum(1 for (_, _, c) in walls if c)
    summary = {
        "event": "summary",
        "epochs": n_epochs,
        "compactions": compactions,
        "replays": sum(1 for k in replays if k < n_epochs),
        "failures": failures,
        "mean_epoch_sec_first20": round(sum(first) / max(1, len(first)), 3),
        "mean_epoch_sec_last20": round(sum(last) / max(1, len(last)), 3),
        "max_live_raw_dirs": max_raw_dirs,
        "bound_raw_dirs": m.compact_after + 1,
    }
    print(json.dumps(summary), flush=True)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
