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


def _bucket_agg(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("hour_bucket", F.expr("unix_timestamp(ts) div 3600"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
    )


class ContinuousHourlyRollup:
    """Maintains ``<workdir>/rollup`` parquet, partitioned by hour bucket."""

    def __init__(self, spark: SparkSession, events_path: str, workdir: str):
        self.spark = spark
        self.events_path = events_path
        self.out = os.path.join(workdir, "rollup")
        self.ckpt = os.path.join(workdir, "ckpt_rollup")
        self.seen = os.path.join(workdir, "seen_events")

    def _refresh_buckets(self, batch_df: DataFrame, epoch_id: int) -> None:
        # keep the raw feed so touched buckets re-aggregate from ALL their
        # events, not just this batch's (idempotent per-bucket overwrite)
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy(
            "epoch"
        ).parquet(self.seen)
        # day-granular overwrite partitions: hour-partitioning would write
        # hundreds of small directories per refresh; day dirs keep the
        # file count (and the 100 TB metadata load) bounded
        touched_days = (
            batch_df.select(
                F.expr("unix_timestamp(ts) div 86400").alias("day_bucket")
            )
            .distinct()
        )
        if touched_days.isEmpty():
            return
        all_seen = self.spark.read.parquet(self.seen)
        fresh = (
            _bucket_agg(all_seen)
            .withColumn("day_bucket", F.expr("hour_bucket div 24"))
            .join(F.broadcast(touched_days), "day_bucket")
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
