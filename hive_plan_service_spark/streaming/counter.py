"""Stateful streaming counter (SURVEY.md B24) + upsert sink (B25).

The reference counter is a serial fold over commands (INCR/DECR/SET,
src/plan-server.ts:50–83) — order-dependent, so it is NOT a commutative
streaming aggregate. The streaming form is ``foreachBatch``: each
micro-batch of counter events is appended to a transactional log table
(the B25 idempotent-upsert pattern, keyed by epoch for exactly-once) and
the current value is the same last-writer-wins replay used in batch
(operators/counter.py) — guaranteeing stream/batch equivalence by
construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_plan_service_spark.operators.counter import current_counter_value
from hive_plan_service_spark.sources.catalog import counter_events_from
from hive_plan_service_spark.streaming.source import events_stream


def streaming_counter_value(
    spark: SparkSession, events_path: str, workdir: str
) -> DataFrame:
    """Replay the events feed as a stream; return the final counter value.

    Epoch-partitioned appends make re-delivered batches overwrite their
    own partition instead of double-counting (idempotent sink).
    """
    log_dir = os.path.join(workdir, "counter_log")
    ckpt = os.path.join(workdir, "ckpt_counter")

    ce = counter_events_from(events_stream(spark, events_path))

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(log_dir)
        )

    q = (
        ce.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    log = spark.read.parquet(log_dir).drop("epoch")
    return current_counter_value(log)
