"""Streaming sources (SURVEY.md B22): file-backed event streams.

The reference's refresh loop (§3.2) and counter mutations (§3.3) are
point-in-time effects; their streaming generalization reads an
append-only event feed. Locally that is the ``events`` parquet consumed
through ``readStream`` (file source — each new file is a micro-batch);
in production the same plan runs off Kafka/queue sources unchanged, since
everything downstream is declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_plan_service_spark.session import tune

def _events_schema(ts_type: T.DataType) -> T.StructType:
    """File schema of the events parquet; ``ts`` arrives either as a real
    TIMESTAMP (µs fixtures) or as BIGINT nanos (TIMESTAMP(NANOS) fixtures
    under nanosAsLong, see sources/catalog.py) — both generations of the
    driver's testdata exist in the wild, so the reader adapts."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def events_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over an events parquet path (file or directory).

    ``max_files_per_trigger=1`` turns a multi-file directory into an
    ordered sequence of micro-batches — how the watermark tests replay
    late data.

    The file source needs the schema up front; a cached pyarrow footer
    read decides whether ``ts`` is stored as BIGINT nanos or a real
    timestamp (metadata only — no data scan, no Spark reader build; see
    catalog.events_ts_is_long). Production queue sources declare their
    schema explicitly anyway.
    """
    import os

    from hive_plan_service_spark.sources.catalog import events_ts_is_long

    tune(spark)
    if max_files_per_trigger is None:
        # test hook (latefuzz gate, r9): pace a multi-file feed into
        # per-file micro-batches without changing any call site — the
        # arrival-order certification drives registered queries through
        # the same cross-batch paths a real paced feed exercises
        env = os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES")
        if env:
            max_files_per_trigger = int(env)
    ts_is_long = events_ts_is_long(path)
    reader = spark.readStream.schema(
        _events_schema(T.LongType() if ts_is_long else T.TimestampType())
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # the file source only accepts directories: stream the parent,
        # filtered to exactly this file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    if ts_is_long:
        # integer-divide nanos → µs (exact) before exposing a timestamp
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw
