"""As-of join (B8) — latest right-side row at-or-before each left row.

Spark has no native ASOF JOIN. The scalable form is NOT a range join
(quadratic blowup) and NOT ``pd.merge_asof`` per group (Python
serialization of the whole fact table): it is union + ordered window —
tag both sides, union on (key, ts), and carry the last non-null right
value forward with ``last(..., ignorenulls=True)``. One shuffle on the
join key, linear work, spill-safe sort within partitions; this survives
100 TB where a theta-join would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    *,
    inclusive: bool = True,
    direction: str = "backward",
    right_seq: str | None = None,
) -> DataFrame:
    """Left rows + the as-of right ``value_cols``.

    ``direction="backward"`` (default): latest right row with
    right.ts ≤ left.ts — DuckDB ``ASOF JOIN`` / ``pd.merge_asof``
    semantics. ``direction="forward"``: earliest right row with
    right.ts ≥ left.ts (same machinery, traversal reversed).
    ``inclusive`` controls ties at exactly-equal timestamps.

    ``right_seq``: optional right-side column that totally orders right
    rows sharing a (key, ts) — the highest-``right_seq`` row wins, in
    both directions (the value observed after applying every update at
    that instant). Without it, ties pick an arbitrary but
    partition-stable right row; pass an event id for bit-for-bit
    determinism at any parallelism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns]
    seq_type = right.schema[right_seq].dataType if right_seq else None
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(0 if inclusive else 1).alias("_side"),
        F.lit(None).cast(seq_type or "bigint").alias("_seq"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_r_{v}") for v in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1 if inclusive else 0).alias("_side"),
        (F.col(right_seq) if right_seq else F.lit(None).cast("bigint")).alias("_seq"),
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
    ).select(*lcols, "_asof_ts", "_side", "_seq", *[f"_r_{v}" for v in value_cols])
    # traversal order: ascending for backward, descending for forward;
    # right rows sort before left rows at equal ts iff inclusive; among
    # right rows at one (key, ts) the last traversed (highest _seq) wins
    # — last(ignorenulls) takes the final non-null in frame order
    ts_order = (
        F.col("_asof_ts").asc()
        if direction == "backward"
        else F.col("_asof_ts").desc()
    )
    w = (
        W.partitionBy(key)
        .orderBy(ts_order, F.col("_side").desc(), F.col("_seq").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    unioned = l.unionByName(r)
    carried = unioned.select(
        *lcols,
        "_asof_ts",
        "_side",
        *[
            F.last(f"_r_{v}", ignorenulls=True).over(w).alias(v)
            for v in value_cols
        ],
    )
    is_left = F.col("_side") == (0 if inclusive else 1)
    return carried.filter(is_left).drop("_asof_ts", "_side")
