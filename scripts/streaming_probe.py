"""Streaming scale probe to 10M events (VERDICT r4 #3).

Replicates the sf0.1 events feed mult x with DISTINCT content
(invariant 23): event ids shifted to stay unique, users shifted by the
user-id range so every copy carries its own user population (session
and join state grow with the corpus instead of colliding onto the base
users), timestamps kept (scale-up = more events per hour, the realistic
densification). The feed is materialized to scratch parquet before any
timing.

Per multiplier it drives, through the real Structured Streaming
harness (availableNow replay, foreachBatch counting sink so the driver
never stores result rows):

  - tumbling / sliding windows (complete mode)
  - session windows (complete mode)
  - the stream-stream interval join (append mode — the heaviest
    registered streaming query; its two-batch ingest/evict state cost
    is the curve VERDICT r4 asked for)
  - the continuous hourly rollup (10 mod-slice epochs through
    _refresh_buckets, the long-lived-stream regime)

and reports wall seconds, rows/s, and the state-store commit breakdown
(summed commitTimeMs, peak state rows) parsed from the query progress.

Streaming dedup ingest scales on the documents feed (its own corpus
recipe — per-copy word suffix) via --docs.

Usage: python scripts/streaming_probe.py [mults...]      (default 10 100)
       python scripts/streaming_probe.py --docs [mults]  (default 10 40)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from hive_plan_service_spark.session import (  # noqa: E402
    default_parallelism,
    get_spark,
    process_scratch_dir,
)
from hive_plan_service_spark.sources.catalog import (  # noqa: E402
    register_tables,
    table_path,
)
from hive_plan_service_spark.streaming.source import events_stream  # noqa: E402
from hive_plan_service_spark.streaming.windows import (  # noqa: E402
    session_windows,
    sliding_window_agg,
    tumbling_window_agg,
)


def replicated_events(spark, mult: int) -> str:
    ev = spark.table("events")  # ts already surfaced as timestamp
    n = ev.count()
    u_span = ev.agg(F.max("user_id")).collect()[0][0] + 1
    reps = spark.range(mult).select(F.col("id").alias("_rep"))
    feed = ev.crossJoin(reps).select(
        (F.col("event_id") + F.col("_rep") * F.lit(n)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_rep") * F.lit(u_span)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    path = os.path.join(process_scratch_dir("streaming_probe"), f"events_{mult}")
    feed.repartition(default_parallelism()).write.mode("overwrite").parquet(
        path
    )
    return path


def drive(sdf, mode: str):
    """Run a streaming frame to completion; return (wall, out_rows, progress)."""
    out_rows = []

    def sink(df, _eid):
        out_rows.append(df.count())

    ckpt = os.path.join(process_scratch_dir("streaming_probe"), f"ckpt_{uuid.uuid4().hex[:12]}")
    t0 = time.perf_counter()
    q = (
        sdf.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    progress = [json.loads(p.json) for p in q.recentProgress]
    # one-shot replay: the checkpoint is never resumed — drop it or
    # every probe invocation leaks a state-store tree in scratch
    shutil.rmtree(ckpt, ignore_errors=True)
    return wall, out_rows, progress


def state_breakdown(progress) -> dict:
    commit_ms = 0
    add_batch_ms = 0
    peak_rows = 0
    input_rows = 0
    for p in progress:
        add_batch_ms += int(p.get("durationMs", {}).get("addBatch", 0))
        input_rows += int(p.get("numInputRows", 0))
        for so in p.get("stateOperators", []):
            commit_ms += int(so.get("commitTimeMs", 0))
            peak_rows = max(peak_rows, int(so.get("numRowsTotal", 0)))
    return {
        "n_batches": len(progress),
        "input_rows": input_rows,
        "addbatch_ms_sum": add_batch_ms,
        "state_commit_ms_sum": commit_ms,
        "state_rows_peak": peak_rows,
    }


def probe_events(spark, mult: int) -> None:
    feed = replicated_events(spark, mult)
    # count the materialized feed (cheap parquet-footer count) instead
    # of assuming the sf0.1 base of 100k rows — SPARK_GRAFT_SF_DIR is
    # configurable and a wrong base silently corrupts every rows/s
    # figure in the probe artifact (r5 review)
    n_events = spark.read.parquet(feed).count()

    ops = {
        # last-batch complete-mode re-emission is part of the honest cost
        "tumbling_1h": (lambda: tumbling_window_agg(
            events_stream(spark, feed)), "complete"),
        "sliding_1h_15m": (lambda: sliding_window_agg(
            events_stream(spark, feed)), "complete"),
        "session_30m": (lambda: session_windows(
            events_stream(spark, feed)), "complete"),
        "stream_stream_join": (lambda: _ss_join(spark, feed), "append"),
    }
    for name, (build, mode) in ops.items():
        wall, out_rows, progress = drive(build(), mode)
        row = {"op": name, "mult": mult, "events": n_events,
               "wall_sec": round(wall, 2),
               "rows_per_sec": int(n_events / wall),
               "out_rows_last_batch": out_rows[-1] if out_rows else 0}
        row.update(state_breakdown(progress))
        print(json.dumps(row), flush=True)

    # continuous rollup: 10 mod-slice epochs, every epoch touching every
    # day (the hot-bucket regime; see scripts/rollup_probe.py)
    from hive_plan_service_spark.streaming.continuous_agg import (
        ContinuousHourlyRollup,
    )

    workdir = os.path.join(process_scratch_dir("streaming_probe"), f"rollup_{mult}")
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    roll = ContinuousHourlyRollup(spark, feed, workdir, compact_after=8)
    ev = spark.read.parquet(feed)
    epochs = 10
    times = []
    for i in range(epochs):
        batch = ev.filter(F.col("event_id") % epochs == i)
        t0 = time.perf_counter()
        roll._refresh_buckets(batch, i)
        times.append(time.perf_counter() - t0)
    print(json.dumps({
        "op": "continuous_rollup", "mult": mult, "events": n_events,
        "epochs": epochs,
        "wall_sec": round(sum(times), 2),
        "rows_per_sec": int(n_events / sum(times)),
        "first3_avg_sec": round(sum(times[:3]) / 3, 2),
        "last3_avg_sec": round(sum(times[-3:]) / 3, 2),
    }), flush=True)
    shutil.rmtree(workdir, ignore_errors=True)
    shutil.rmtree(feed, ignore_errors=True)


def _ss_join(spark, feed: str):
    ev = events_stream(spark, feed)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id", "user_id")


def probe_join_store(spark, mult: int) -> None:
    """Stream-stream join, HDFS vs RocksDB state store (VERDICT r4 #3
    follow-up): the 10M-event probe showed the join's cost floor is
    state-store COMMIT time (~127-130 s summed at both 1M and 10M — a
    per-(batch × partition × store) constant), not row volume. RocksDB
    (built into Spark, runtime-settable providerClass) is the published
    answer for large state; this probe measures whether the commit
    floor moves at fixture scale and records the knob's measured basis.
    """
    feed = replicated_events(spark, mult)
    n_events = spark.read.parquet(feed).count()  # see probe_events
    providers = {
        "hdfs": "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
        "rocksdb": "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    }
    for label, cls in providers.items():
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
        try:
            wall, out_rows, progress = drive(_ss_join(spark, feed), "append")
        finally:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        row = {
            "op": "stream_stream_join",
            "state_store": label,
            "mult": mult,
            "events": n_events,
            "wall_sec": round(wall, 2),
            "rows_per_sec": int(n_events / wall),
            "out_rows_last_batch": out_rows[-1] if out_rows else 0,
        }
        row.update(state_breakdown(progress))
        print(json.dumps(row), flush=True)
    shutil.rmtree(feed, ignore_errors=True)


def probe_join_store_auto(spark, mult: int) -> None:
    """Same stream-stream join, provider chosen by the MEASURED decision
    helper (VERDICT r5 #4): project state rows as plan arithmetic (the
    1h join window retains ~40% of this feed's events — the measured
    399k at 1M), let ``apply_state_store_conf`` pick the provider, then
    verify the projection against the run's actual peak state."""
    from hive_plan_service_spark.streaming.windows import (
        apply_state_store_conf,
    )

    feed = replicated_events(spark, mult)
    n_events = spark.read.parquet(feed).count()
    projected = int(n_events * 0.4)
    try:
        cls = apply_state_store_conf(spark, projected)
        wall, out_rows, progress = drive(_ss_join(spark, feed), "append")
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    row = {
        "op": "stream_stream_join_auto_store",
        "chosen_provider": cls.rsplit(".", 1)[-1],
        "projected_state_rows": projected,
        "mult": mult,
        "events": n_events,
        "wall_sec": round(wall, 2),
        "out_rows_last_batch": out_rows[-1] if out_rows else 0,
    }
    row.update(state_breakdown(progress))
    print(json.dumps(row), flush=True)
    shutil.rmtree(feed, ignore_errors=True)


def probe_docs(spark, mult: int) -> None:
    """Streaming dedup ingest over a mult x documents corpus (the
    scale_probe distinct-copy recipe), split into 4-file micro-batches
    so the epoch store actually grows between batches."""
    from scripts.scale_probe import multiplied_docs

    from hive_plan_service_spark.streaming.dedup_ingest import (
        StreamingDedupIngest,
    )

    corpus, path = multiplied_docs(spark, mult)
    n_docs = corpus.count()
    workdir = os.path.join(process_scratch_dir("streaming_probe"), f"dedup_ingest_{mult}")
    shutil.rmtree(workdir, ignore_errors=True)
    ingest = StreamingDedupIngest(spark, path, workdir)
    t0 = time.perf_counter()
    flags = ingest.run(max_files_per_trigger=8)
    n_flagged = flags.count()
    n_dups = flags.filter(F.col("is_dup")).count()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "op": "dedup_ingest", "mult": mult, "docs": n_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": int(n_docs / wall),
        "flagged": n_flagged, "dups": n_dups,
    }), flush=True)
    shutil.rmtree(workdir, ignore_errors=True)
    shutil.rmtree(path, ignore_errors=True)


def probe_counter(spark, mult: int) -> None:
    """B24 stateful counter (``applyInPandasWithState`` — the ONE
    Python-stage streaming path, excluded from the r5 event sweep) at
    mult× events: wall, events/s through the serial-by-semantics single
    key, and an EXACT cross-check of the streamed fold against the
    batch last-writer-wins replay of the same feed (sound here because
    the default single availableNow batch sorts globally, like the
    batch path; multi-batch equality is scoped to ts-monotone arrival,
    as with dedup ingest)."""
    from hive_plan_service_spark.operators.counter import (
        current_counter_value,
    )
    from hive_plan_service_spark.sources.catalog import counter_events_from
    from hive_plan_service_spark.streaming.counter import (
        stateful_counter_stream,
    )

    feed = replicated_events(spark, mult)
    n_events = spark.read.parquet(feed).count()
    t0 = time.perf_counter()
    streamed = stateful_counter_stream(spark, feed).collect()[0][0]
    wall = time.perf_counter() - t0
    batch = current_counter_value(
        counter_events_from(spark.read.parquet(feed))
    ).collect()[0][0]
    print(json.dumps({
        "op": "stateful_counter", "mult": mult, "events": n_events,
        "wall_sec": round(wall, 2),
        "events_per_sec": int(n_events / wall),
        "streamed_value": streamed, "batch_value": batch,
        "match": bool(streamed == batch),
    }), flush=True)
    shutil.rmtree(feed, ignore_errors=True)


def main() -> None:
    args = sys.argv[1:]
    docs_mode = "--docs" in args
    join_store_mode = "--join-store" in args
    join_store_auto = "--join-store-auto" in args
    counter_mode = "--counter" in args
    args = [a for a in args
            if a not in ("--docs", "--join-store", "--join-store-auto",
                         "--counter")]
    mults = [int(m) for m in args] or ([10, 40] if docs_mode else [10, 100])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-streaming-probe")
    register_tables(spark, sf_dir)
    for mult in mults:
        if join_store_auto:
            probe_join_store_auto(spark, mult)
        elif join_store_mode:
            probe_join_store(spark, mult)
        elif docs_mode:
            probe_docs(spark, mult)
        elif counter_mode:
            probe_counter(spark, mult)
        else:
            probe_events(spark, mult)
    spark.stop()


if __name__ == "__main__":
    main()
