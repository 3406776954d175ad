"""Checkpoint-restart certification for the streaming maintainers.

The r6 longevity probe exercises replay/compaction by calling
``_refresh_buckets`` directly; this probe drives the REAL engine paths
through the most common production events at 100 TB — a crash mid-feed
and a later cold restart — and asserts exactly-once results through
both of the repo's state mechanisms:

Part A — continuous rollup (foreachBatch + epoch store):
  1. feed 6 one-file micro-batches; an injected crash fires AFTER
     epoch 3's store writes complete but BEFORE foreachBatch returns,
     so the engine's offset log never commits batch 3 — the query
     dies with the store already mutated (the at-least-once worst
     case);
  2. restart from the same checkpoint: Spark REPLAYS batch 3 under the
     same epoch id; the epoch store's overwrite-idempotent writes must
     leave the rollup exact (no double count), then batches 4–5 run;
  3. add 6 more files (10% late tail, compactions interleaving) and
     restart again: epoch ids must continue where the checkpoint left
     off and the final rollup must equal the batch recompute over all
     12 batches.

Part B — stateful counter (applyInPandasWithState, engine state store):
  1. feed 6 files, run with a persistent checkpoint: final value must
     equal the batch fold;
  2. add 6 files, restart from the checkpoint: the state store must
     RELOAD (per-key seq continues past phase 1 — not recomputed from
     zero) and only the new files may be processed; the final value
     must equal the batch fold over all 12 files;
  3. the whole of part B runs twice — default HDFS-backed provider and
     RocksDBStateStoreProvider (the provider the decision helper picks
     at 100 TB state rates) — both must reload identically.

Usage: python scripts/restart_probe.py
Prints JSON rows per phase and one summary; exit 1 on any divergence.
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

from hive_plan_service_spark.session import get_spark  # noqa: E402
from hive_plan_service_spark.streaming.continuous_agg import (  # noqa: E402
    ContinuousHourlyRollup,
)
from scripts.epoch_longevity_probe import (  # noqa: E402
    BASE_TS,
    make_batch,
    rollup_snapshot,
    truth_snapshot,
)

failures: list[str] = []


def check(ok: bool, what: str) -> bool:
    if not ok:
        failures.append(what)
    print(json.dumps({"check": what, "ok": bool(ok)}), flush=True)
    return ok


# --------------------------------------------------------------- part A


class CrashingRollup(ContinuousHourlyRollup):
    """Injects ONE crash after a chosen epoch's writes, before commit."""

    def __init__(self, *a, crash_at: int, flag_path: str, **kw):
        super().__init__(*a, **kw)
        self.crash_at = crash_at
        self.flag_path = flag_path

    def _refresh_buckets(self, batch_df, epoch_id: int) -> None:
        super()._refresh_buckets(batch_df, epoch_id)
        if epoch_id == self.crash_at and not os.path.exists(self.flag_path):
            with open(self.flag_path, "w") as f:
                f.write(str(epoch_id))
            # foreachBatch raises AFTER the store writes → the offset
            # log never commits this batch; restart must replay it
            raise RuntimeError("hpss injected crash (restart probe)")


def part_a(spark, work: str) -> None:
    feed = os.path.join(work, "feed_a")
    truth_log = os.path.join(work, "truth_a")
    m = CrashingRollup(
        spark,
        events_path=feed,
        workdir=os.path.join(work, "rollup_work"),
        compact_after=4,
        crash_at=3,
        flag_path=os.path.join(work, "crash_flag"),
    )

    def add_files(epochs) -> None:
        for e in epochs:
            b = make_batch(spark, e)
            b.coalesce(1).write.mode("append").parquet(feed)
            b.write.mode("append").parquet(truth_log)

    add_files(range(6))
    crashed = False
    try:
        m.run(max_files_per_trigger=1)
    except Exception as exc:  # StreamingQueryException wrapping the injection
        crashed = "injected crash" in str(exc)
    check(crashed, "A1: query died on the injected post-write crash")
    check(os.path.exists(m.flag_path), "A1: crash fired after epoch 3 writes")

    t0 = time.perf_counter()
    m.run(max_files_per_trigger=1)  # replays epoch 3, then 4–5
    check(
        rollup_snapshot(spark, m.out) == truth_snapshot(spark, truth_log),
        "A2: replayed-epoch restart is exact (no double count)",
    )

    add_files(range(6, 12))
    m.run(max_files_per_trigger=1)
    check(
        rollup_snapshot(spark, m.out) == truth_snapshot(spark, truth_log),
        "A3: second restart + 6 more epochs equals batch recompute",
    )
    # epoch continuity: raw epochs beyond base coverage + base coverage
    # must tile 0..11 exactly once (read rule over real engine epochs)
    from hive_plan_service_spark.streaming import epoch_store

    raws = epoch_store.scan_epoch_dirs(m.seen_raw)
    # bases live under seen_base/day=*/epoch=-C-1: collect their
    # coverage, then apply the read rule (newest base + raws beyond it)
    base_vals = set()
    if os.path.isdir(m.seen_base):
        for day in os.listdir(m.seen_base):
            p = os.path.join(m.seen_base, day)
            if os.path.isdir(p):
                base_vals |= set(epoch_store.scan_epoch_dirs(p))
    newest_cov = max(
        (epoch_store.coverage(v) for v in base_vals if v < 0), default=-1
    )
    covered = set(range(newest_cov + 1)) | {v for v in raws if v > newest_cov}
    check(
        covered == set(range(12)),
        f"A4: engine epoch ids tile 0..11 exactly once (got {sorted(covered)})",
    )
    print(
        json.dumps({"part": "A", "restart_wall_sec": round(time.perf_counter() - t0, 2)}),
        flush=True,
    )


# --------------------------------------------------------------- part B


def make_counter_batch(spark, epoch: int):
    """Deterministic counter-op batch: ts strictly increases across
    epochs (so the stream's batch-order fold equals the batch twin's
    global (ts, event_id) fold), ops mix signup/error/purchase."""
    ts = F.lit(BASE_TS + epoch * 3600) + F.col("id")
    types = F.array(F.lit("signup"), F.lit("error"), F.lit("purchase"),
                    F.lit("signup"), F.lit("click"))
    return spark.range(500).select(
        (F.lit(epoch) * 1_000_000 + F.col("id")).alias("event_id"),
        F.timestamp_seconds(ts).alias("ts"),
        F.element_at(types, (F.pmod(F.xxhash64("id", F.lit(epoch)), F.lit(5)) + 1).cast("int")).alias("event_type"),
        (
            F.pmod(F.xxhash64(F.col("id") + F.lit(epoch)), F.lit(10_000))
            .cast("double")
            / F.lit(100.0)
        ).alias("value"),
    )


def part_b(spark, work: str, *, provider: str | None = None,
           tag: str = "") -> None:
    from hive_plan_service_spark.operators.counter import current_counter_value
    from hive_plan_service_spark.sources.catalog import counter_events_from
    from hive_plan_service_spark.streaming.counter import (
        stateful_counter_transform,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    if provider:
        # the alternate provider the decision helper picks at 100 TB
        # state rates (streaming/windows.choose_state_store_provider)
        # must ALSO reload across a restart
        spark.conf.set(key, provider)
    try:
        _part_b_body(spark, work, current_counter_value,
                     counter_events_from, stateful_counter_transform, tag)
    finally:
        spark.conf.set(key, prev)


def _part_b_body(spark, work, current_counter_value, counter_events_from,
                 stateful_counter_transform, tag: str) -> None:

    feed = os.path.join(work, f"feed_b{tag}")
    ckpt = os.path.join(work, f"ckpt_b{tag}")

    def add_files(epochs) -> None:
        for e in epochs:
            make_counter_batch(spark, e).coalesce(1).write.mode(
                "append"
            ).parquet(feed)

    out_dir = os.path.join(work, f"out_b{tag}")

    def drive(run_tag: str):
        # the memory sink refuses checkpoint recovery — a restartable
        # query needs a fault-tolerant sink, exactly as in production
        out = stateful_counter_transform(spark, feed)

        def sink(bdf, epoch_id: int) -> None:
            bdf.withColumn("run", F.lit(run_tag)).write.mode(
                "append"
            ).parquet(out_dir)

        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.parquet(out_dir)
            .filter(F.col("run") == run_tag)
            .orderBy("seq")
            .collect()
        )

    def batch_truth() -> int:
        return current_counter_value(
            counter_events_from(spark.read.parquet(feed))
        ).collect()[0]["joined_count"]

    add_files(range(6))
    rows1 = drive(f"hpss_restart{tag}_b1")
    v1, s1 = rows1[-1]["joined_count"], rows1[-1]["seq"]
    check(v1 == batch_truth(), f"B1{tag}: phase-1 stream value equals batch fold")

    add_files(range(6, 12))
    rows2 = drive(f"hpss_restart{tag}_b2")
    v2, seqs2 = rows2[-1]["joined_count"], [r["seq"] for r in rows2]
    check(v2 == batch_truth(), f"B2{tag}: post-restart value equals batch fold over all files")
    check(
        min(seqs2) == s1 + 1,
        f"B2{tag}: state RELOADED from checkpoint (seq continues {s1}→{min(seqs2)})",
    )
    check(
        len(seqs2) <= 6,
        f"B2{tag}: only new files processed after restart ({len(seqs2)} batches)",
    )


def main() -> None:
    spark = get_spark(app_name="hpss-restart-probe")
    work = tempfile.mkdtemp(prefix="restart_probe_")
    try:
        part_a(spark, work)
        part_b(spark, work)
        part_b(
            spark, work,
            provider=(
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            ),
            tag="_rocksdb",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps({"event": "summary", "failures": failures}), flush=True
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
