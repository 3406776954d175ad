"""Batch merge/upsert (the true-upsert form of A5/A6).

The reference upserts entities by key into a Redis hash
(src/plan-processor.ts:39,68 ``hset``); its refresh happens to rewrite
everything, but the *operator* is keyed upsert. Without a Delta/Iceberg
MERGE (jars absent), the engine expresses it as the classic emulation:

    merged = source ∪ (target ⟕anti source on key)

— new/updated rows win, untouched rows survive. One shuffle on the key;
with both sides bucketed by the key (operators/joins.py) even that
shuffle disappears. Idempotent by construction: re-merging the same
source is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Rows of ``source`` replace same-key rows of ``target``; others kept."""
    kept = target.join(source.select(key), key, "left_anti")
    return kept.unionByName(source)
