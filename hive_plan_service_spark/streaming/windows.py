"""Streaming window operators (SURVEY.md B22/B23) and run helpers."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_plan_service_spark.functions.exact import epoch_seconds, money


def tumbling_window_agg(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 days",
) -> DataFrame:
    """Tumbling event-time window counts/sums per event_type.

    Watermarked so state is bounded (late rows beyond the delay are
    dropped); window start/end surface as epoch seconds so results are
    oracle-comparable. Money sums go through exact DECIMAL (the same
    determinism rule as batch — parallelism must not change the value).
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            # epoch emission must FLOOR (r9 lint): window.start is
            # hour-aligned so truncate==floor here, but every epoch
            # emission routes through exact.py so the rule is uniform.
            epoch_seconds("window.start").alias("window_start_epoch"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window_agg(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 days",
) -> DataFrame:
    """Sliding event-time windows (B22): each event lands in
    window/slide overlapping windows; state stays watermark-bounded.
    Same exact-DECIMAL money rule as the tumbling form.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            epoch_seconds("window.start").alias("window_start_epoch"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 days",
) -> DataFrame:
    """Gap-based session windows per user (B23).

    A session extends while consecutive events are < gap apart; the
    window closes at last_event + gap. Output keys on the session start.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            # session_window.start is the FIRST EVENT's timestamp —
            # sub-second micros survive, so truncating unix_timestamp
            # is the wrong second for pre-1970 events (r8 numfuzz
            # class). epoch_seconds floors.
            epoch_seconds("session_window.start").alias(
                "session_start_epoch"
            ),
            "n_events",
        )
    )


HDFS_BACKED_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def choose_state_store_provider(
    projected_state_rows: int,
    *,
    avg_row_bytes: int = 256,
    partitions: int | None = None,
    executor_heap_bytes: int = 4 << 30,
    heap_budget_fraction: float = 0.1,
) -> str:
    """Pick the streaming state-store provider from projected state size.

    Measured basis (ROUND5_NOTES §6, stream-stream join, quiet box,
    identical outputs from both providers): with 3.99M state rows the
    HDFS provider's in-heap map wins 7.2 s vs RocksDB's 14.5 s —
    RocksDB pays JNI + LSM compaction for spill-safety that in-heap
    state doesn't need. RocksDB is the right choice only when
    per-partition state approaches executor heap — exactly when the
    HDFS provider would OOM (100 TB rates with wide watermarks). This
    encodes that rule instead of the cargo-cult "always RocksDB".

    Large-state re-measurement (r8, scripts/largestate_probe.py,
    streaming dropDuplicates on a bigint key, both providers
    bit-identical incl. mid-stream restart): HDFS in-heap cost is
    LINEAR at 239–288 B per state row (1M → 276 MB, 10M → 2.39 GB,
    30M → 8.65 GB, > half a 16 GiB heap — the OOM cliff this function
    exists to dodge), while RocksDB stays ~0.3 GB in-memory with state
    spilled to SST files (30M keys → 370 MB SST) at comparable
    wall-clock (30M: 40.7 s vs 46.7 s). The default
    ``avg_row_bytes=256`` sits in the measured band for a narrow key;
    scale it up for wide state rows (session windows, join buffers).

    Decision: per-partition in-heap cost ≈ ``rows × avg_row_bytes × 2 /
    partitions`` (the HDFS provider keeps the current map plus the
    snapshot-in-flight copy); RocksDB iff that exceeds
    ``heap_budget_fraction × executor_heap_bytes`` (several partition
    maps commit concurrently per executor, so one partition must stay a
    small heap fraction). Defaults at the measured point — 3.99M rows,
    32 partitions → 64 MiB/partition vs a 410 MiB budget — choose HDFS,
    matching the measured winner.

    ``projected_state_rows`` is plan arithmetic, not a Spark job: rate ×
    watermark horizon for joins/windows, keyspace size for stateful
    counters.
    """
    if partitions is None:
        from hive_plan_service_spark.session import shuffle_partitions

        partitions = shuffle_partitions()
    per_partition = projected_state_rows * avg_row_bytes * 2 / max(1, partitions)
    if per_partition > heap_budget_fraction * executor_heap_bytes:
        return ROCKSDB_PROVIDER
    return HDFS_BACKED_PROVIDER


def apply_state_store_conf(
    spark, projected_state_rows: int, **kwargs
) -> str:
    """Set ``spark.sql.streaming.stateStore.providerClass`` from the
    measured decision rule (runtime-settable — the driver hands us a
    plain session, CLAUDE.md invariant 3); returns the chosen class."""
    cls = choose_state_store_provider(projected_state_rows, **kwargs)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
    return cls


def run_to_completion(
    streaming_df: DataFrame, *, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming DataFrame over all available input, synchronously.

    Memory sink + ``availableNow`` trigger: processes every pending file
    then stops — the batch-replay harness for correctness checks. Returns
    the sink contents as a (batch) DataFrame. ``complete`` mode emits all
    windows including those still above the final watermark; use
    ``append`` to observe finalized-only/late-drop semantics.
    """
    name = f"hpss_sink_{uuid.uuid4().hex[:12]}"
    q = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = streaming_df.sparkSession
    return spark.table(name)
