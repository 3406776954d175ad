"""Streaming window operators (SURVEY.md B22/B23) and run helpers."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_plan_service_spark.functions.exact import money


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
            F.unix_timestamp("window.start").cast("bigint").alias("window_start_epoch"),
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
            F.unix_timestamp("window.start").cast("bigint").alias("window_start_epoch"),
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
            F.unix_timestamp("session_window.start")
            .cast("bigint")
            .alias("session_start_epoch"),
            "n_events",
        )
    )


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
