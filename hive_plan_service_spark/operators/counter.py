"""Counter semantics (reference src/plan-server.ts:50–83, A9–A12).

The reference's ``plan-joined-count`` is a single Redis value mutated by
INCR/DECR/SET. In a distributed engine a mutable cell is an anti-pattern;
the counter becomes a *derived* value over an append-only event log:

    current = last SET value + Σ deltas after that SET      (A11 override)
            | Σ all deltas            if no SET ever        (A9/A10)
            | 0                       if the log is empty    (A12 default)

This is last-writer-wins + replay — exactly what the Redis commands
implement, but order-independent, parallelizable, and replayable (the
same expression runs as a Structured Streaming aggregate, see
streaming/). Events are totally ordered by (ts, event_id) so ties are
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def current_counter_value(counter_events: DataFrame) -> DataFrame:
    """Single-row DataFrame ``joined_count BIGINT`` per the rules above.

    Scale note: two scans of the (tiny relative to facts) log — one
    all-reduce for the latest SET, one filtered sum. No per-row state,
    no driver loop; both aggregations are map-side-combined.
    """
    ce = counter_events
    last_set = ce.filter(F.col("op") == "set").agg(
        F.max(F.struct("ts", "event_id", "set_value")).alias("s")
    ).select(
        F.col("s.ts").alias("set_ts"),
        F.col("s.event_id").alias("set_event_id"),
        F.col("s.set_value").alias("set_value"),
    )
    deltas = ce.filter(F.col("op") != "set")
    # cross join against the 1-row last_set (broadcast, no shuffle)
    after = deltas.crossJoin(F.broadcast(last_set)).filter(
        F.col("set_ts").isNull()
        | (F.col("ts") > F.col("set_ts"))
        | ((F.col("ts") == F.col("set_ts")) & (F.col("event_id") > F.col("set_event_id")))
    )
    base = last_set.select(
        F.coalesce(F.col("set_value"), F.lit(0)).cast("bigint").alias("base")
    )
    summed = after.agg(
        F.coalesce(F.sum("delta"), F.lit(0)).cast("bigint").alias("tail")
    )
    return base.crossJoin(summed).select(
        (F.col("base") + F.col("tail")).cast("bigint").alias("joined_count")
    )


def keyed_counter_values(counter_events: DataFrame, key: str) -> DataFrame:
    """Per-key counter values — the scale-out form of the global counter.

    The reference holds ONE Redis counter; at 100 TB the same semantics
    shard per key (e.g. per tenant): for each key, last SET wins and
    later deltas accumulate. One window pass to attach each key's latest
    SET, then an aggregate on the same partitioning (no second shuffle).
    Output: key, joined_count.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key)
    with_ls = counter_events.withColumn(
        "_ls",
        F.max(
            F.when(
                F.col("op") == "set",
                F.struct("ts", "event_id", "set_value"),
            )
        ).over(w),
    )
    after_set = (
        F.col("_ls").isNull()
        | (F.col("ts") > F.col("_ls.ts"))
        | ((F.col("ts") == F.col("_ls.ts")) & (F.col("event_id") > F.col("_ls.event_id")))
    )
    return (
        with_ls.groupBy(key)
        .agg(
            (
                F.coalesce(F.first("_ls.set_value"), F.lit(0))
                + F.coalesce(
                    F.sum(
                        F.when((F.col("op") != "set") & after_set, F.col("delta"))
                        .otherwise(F.lit(0))
                    ),
                    F.lit(0),
                )
            )
            .cast("bigint")
            .alias("joined_count")
        )
    )
