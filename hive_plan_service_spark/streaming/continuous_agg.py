"""Continuous aggregate — an incrementally-maintained time rollup.

The "hypertable rollup" pattern: a materialized hourly rollup of the
event stream kept fresh by ``foreachBatch``. Each micro-batch
re-aggregates ONLY the hour buckets it touches and overwrites exactly
those partitions (dynamic partition overwrite) — the incremental-refresh
analog of the reference's cache refresh (processor §3.2), but windowed:
work per batch is O(touched buckets), not O(history).

Invariant (tested): after any prefix of batches, the rollup table equals
the full recompute over all events seen so far.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_plan_service_spark.functions.exact import money
from hive_plan_service_spark.streaming.source import events_stream


class ContinuousHourlyRollup:
    """Maintains ``<workdir>/rollup`` parquet, partitioned by day bucket,
    from a store of per-epoch PARTIAL aggregates (``<workdir>/seen_events``).

    ``track_batch_input_rows`` (tests only) records how many staged
    partial rows each refresh actually re-aggregated — the O(touched
    buckets) invariant is asserted, not assumed.
    """

    def __init__(
        self,
        spark: SparkSession,
        events_path: str,
        workdir: str,
        *,
        track_batch_input_rows: bool = False,
    ):
        self.spark = spark
        self.events_path = events_path
        self.out = os.path.join(workdir, "rollup")
        self.ckpt = os.path.join(workdir, "ckpt_rollup")
        self.seen = os.path.join(workdir, "seen_events")
        self.track = track_batch_input_rows
        self.batch_input_rows: list[int] = []

    def _refresh_buckets(self, batch_df: DataFrame, epoch_id: int) -> None:
        # stage PARTIAL aggregates, not raw rows: count and exact DECIMAL
        # sum per (hour, type) are commutative monoids, so touched
        # buckets re-aggregate from per-epoch partials losslessly —
        # the store is O(buckets seen), not O(events seen). At 100 TB
        # this is the difference between re-reading a day of events and
        # re-reading ≤ 24 × #types partial rows per day.
        # Day-partitioned with the epoch in the key: a replayed batch
        # (foreachBatch is at-least-once) dynamic-overwrites ITS OWN
        # (day, epoch) dirs instead of double-counting — idempotence
        # comes from the layout, not from the sink.
        staged = (
            batch_df.withColumn(
                "hour_bucket", F.expr("unix_timestamp(ts) div 3600")
            )
            .groupBy("hour_bucket", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(money("value")).alias("sv"),  # exact decimal partial
            )
            .withColumn("day_bucket", F.expr("hour_bucket div 24"))
            .withColumn("epoch", F.lit(epoch_id))
        )
        # cluster by day before the partitioned write: one file per
        # (day, epoch) dir instead of #shuffle-partitions × #days
        # fragments — file count stays O(days), the 100 TB metadata bound
        staged.repartition("day_bucket").write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("day_bucket", "epoch").parquet(self.seen)
        # bounded control-flow collect — one BIGINT per touched day — so
        # the re-read gets a *literal* IN filter that static-prunes the
        # day directories at scan planning (a broadcast semi-join would
        # need runtime DPP and still enumerate all files)
        touched = [
            r["day_bucket"] for r in staged.select("day_bucket").distinct().collect()
        ]
        if not touched:
            return
        touched_seen = self.spark.read.parquet(self.seen).filter(
            F.col("day_bucket").isin(touched)
        )
        if self.track:
            self.batch_input_rows.append(touched_seen.count())
        # merge partials across epochs: sums of counts / exact decimal
        # sums — associative, so any epoch arrival order yields the full
        # recompute bit-for-bit. Day-granular overwrite partitions keep
        # the file count (and the 100 TB metadata load) bounded.
        fresh = (
            touched_seen.groupBy("hour_bucket", "event_type")
            .agg(
                F.sum("n").alias("n"),
                F.sum("sv").cast("double").alias("total_value"),
            )
            .withColumn("day_bucket", F.expr("hour_bucket div 24"))
        )
        (
            fresh.repartition("day_bucket")  # one file per refreshed day dir
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day_bucket")
            .parquet(self.out)
        )

    def run(self, max_files_per_trigger: int | None = None) -> DataFrame:
        stream = events_stream(
            self.spark, self.events_path, max_files_per_trigger=max_files_per_trigger
        )
        q = (
            stream.writeStream.foreachBatch(self._refresh_buckets)
            .option("checkpointLocation", self.ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.spark.read.parquet(self.out)
