"""Bitmask-expansion join — the reference's flagship operator.

Re-expresses src/plan-processor.ts:44–71: each ``plan_groups`` row carries
a 64-bit membership mask; bit *i* set ⇔ the group contains the plan whose
``id == 2^i``. The reference loops bits 0..63 per group and probes a Redis
hash per set bit; here the whole expansion is one declarative plan:

* set-bit extraction with a higher-order ``filter`` over ``sequence(0,63)``
  — only set bits survive *before* the explode, so the row blowup is
  ``popcount(mask)``, not 64×;
* the per-row KV probe (processor:58) becomes a broadcast hash join
  against the plans dim (≤64 rows by construction — ids are single bits
  of a 64-bit mask);
* the re-nesting (processor:62 ``group.plans.push``) becomes
  ``collect_list(struct(...))``, sorted by plan id for determinism.

Intended 64-bit semantics (SURVEY.md §2.A finding): the reference's JS
``1 << i`` truncates to 32 bits, duplicating members and losing bits
31–63; this engine uses true BIGINT shifts, every member exactly once.

Scale: groups shuffle only for the final groupBy (keyed by group id, no
skew — popcount ≤ 64); plans always broadcast. At 100 TB of groups this
stays a single shuffle of the already-expanded (≤64×) stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SET_BITS = "filter(sequence(0, 63), b -> (mask & shiftleft(CAST(1 AS BIGINT), b)) != 0)"


def expand_groups_flat(groups: DataFrame, plans: DataFrame) -> DataFrame:
    """One row per (group, member plan): the exploded join form.

    Output: group_id, group_title, mask, plan_id, plan_title, optional.
    """
    members = groups.select(
        F.col("id").alias("group_id"),
        F.col("title").alias("group_title"),
        "mask",
        F.explode(F.expr(_SET_BITS)).alias("bit"),
    ).withColumn("plan_id", F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
    p = plans.select(
        F.col("id").alias("plan_id"),
        F.col("title").alias("plan_title"),
        "optional",
    )
    return members.join(F.broadcast(p), "plan_id", "inner").select(
        "group_id", "group_title", "mask", "plan_id", "plan_title", "optional"
    )


def expand_groups_nested(groups: DataFrame, plans: DataFrame) -> DataFrame:
    """The reference's materialized shape: plans re-nested per group.

    Output: id, title, mask, plans ARRAY<STRUCT<id,title,optional>>,
    sorted by *bit index* — the reference's bit-order iteration. Plan ids
    are single bits of a signed BIGINT, so bit 63 is ``-2^63``: sorting
    the raw signed id would put it first; the (id < 0, id) key puts it
    last, matching bits 0..63.
    """
    flat = expand_groups_flat(groups, plans)
    keyed = F.sort_array(
        F.collect_list(
            F.struct(
                (F.col("plan_id") < 0).alias("neg"),
                F.col("plan_id").alias("k"),
                F.struct(
                    F.col("plan_id").alias("id"),
                    F.col("plan_title").alias("title"),
                    F.col("optional"),
                ).alias("p"),
            )
        )
    )
    return (
        flat.groupBy(
            F.col("group_id").alias("id"),
            F.col("group_title").alias("title"),
            "mask",
        )
        .agg(F.transform(keyed, lambda s: s["p"]).alias("plans"))
    )
