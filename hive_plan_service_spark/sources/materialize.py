"""Materialized views — the reference's O2 optimization, generalized.

The reference's whole read path is a hand-built materialized view: the
processor denormalizes Postgres into Redis and readers never touch the
base tables (SURVEY.md §4 O2). OSS Spark has no automatic MV rewrite, so
the engine replicates the reference's own approach as a first-class
helper: build function → overwrite-committed parquet → reads routed to
the materialization, with input-fingerprint staleness so refresh is
skipped when sources are unchanged.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _fingerprint(paths: list[str]) -> str:
    parts = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                fp = os.path.join(p, f)
                parts.append(f"{fp}:{os.path.getmtime(fp)}:{os.path.getsize(fp)}")
        elif os.path.exists(p):
            parts.append(f"{p}:{os.path.getmtime(p)}:{os.path.getsize(p)}")
    return "|".join(parts)


class MaterializedView:
    """Overwrite-refreshed parquet materialization of a build function.

    ``inputs`` are the source paths whose modification fingerprint
    decides staleness. Refresh atomicity is the parquet job commit —
    readers see the old or the new materialization, never a mix (the
    MULTI/EXEC analog, processor:31,41).
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        build: Callable[[], DataFrame],
        inputs: list[str],
        storage_dir: str,
    ) -> None:
        self.spark = spark
        self.name = name
        self.build = build
        self.inputs = inputs
        self.path = os.path.join(storage_dir, name)
        self._meta = os.path.join(storage_dir, f"{name}.meta.json")

    def is_fresh(self) -> bool:
        if not os.path.exists(self._meta):
            return False
        with open(self._meta) as f:
            return json.load(f).get("fingerprint") == _fingerprint(self.inputs)

    def refresh(self, force: bool = False) -> bool:
        """Rebuild if stale (or forced). Returns True when a rebuild ran."""
        if not force and self.is_fresh():
            return False
        self.build().write.mode("overwrite").parquet(self.path)
        with open(self._meta, "w") as f:
            json.dump({"fingerprint": _fingerprint(self.inputs)}, f)
        return True

    def read(self) -> DataFrame:
        self.refresh()
        return self.spark.read.parquet(self.path)
