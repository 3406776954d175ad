"""Refresh-as-a-stream (SURVEY.md B25; reference A13/A14, §3.2).

The reference's refresh endpoint publishes a command packet to the
processor queue and awaits completion (plan-server.ts:85–90). Here the
command feed is a stream and each micro-batch runs the refresh pipeline
inside ``foreachBatch`` — an idempotent overwrite of the materialized
entity tables (job-commit atomicity ↔ the reference's MULTI/EXEC), with
the stage-1→stage-2 dependency preserved.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hive_plan_service_spark.operators.bitmask import expand_groups_nested
from hive_plan_service_spark.streaming.source import events_stream


def streaming_refresh(
    spark: SparkSession, trigger_path: str, workdir: str
) -> DataFrame:
    """Run the refresh pipeline once per micro-batch of the trigger feed.

    Returns the materialized nested ``plan_group_entities`` table after
    the stream drains. The trigger batch *content* is irrelevant (the
    reference's CmdPacket carries no args) — its arrival is the command.
    """
    out = os.path.join(workdir, "materialized")
    ckpt = os.path.join(workdir, "ckpt_refresh")

    def _refresh(batch_df: DataFrame, epoch_id: int) -> None:
        # stage 1: plan entities
        spark.table("plans").write.mode("overwrite").parquet(
            os.path.join(out, "plan_entities")
        )
        # stage 2 consumes stage 1's committed output (processor:79–80)
        plans = spark.read.parquet(os.path.join(out, "plan_entities"))
        expand_groups_nested(spark.table("plan_groups"), plans).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, "plan_group_entities"))

    q = (
        events_stream(spark, trigger_path)
        .writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(out, "plan_group_entities"))
