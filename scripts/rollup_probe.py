"""Continuous-rollup probe: per-batch refresh latency over a long stream.

Feeds the sf0.1 events through ``ContinuousHourlyRollup._refresh_buckets``
directly, one id-ordered slice per epoch, and times EVERY refresh. This is
the long-lived-stream regime the epoch store exists for: without
compaction per-batch cost grows with the number of epochs that ever
touched a hot day; with it (``compact_after``), cost must stay flat.

Usage: python scripts/rollup_probe.py [n_batches] [compact_after]
(defaults 30 and 8; pass compact_after=10**9 to see the uncompacted
growth curve). Prints one JSON line per epoch and a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from hive_plan_service_spark.session import get_spark, process_scratch_dir  # noqa: E402
from hive_plan_service_spark.sources.catalog import register_tables  # noqa: E402
from hive_plan_service_spark.streaming.continuous_agg import (  # noqa: E402
    ContinuousHourlyRollup,
)

n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 30
compact_after = int(sys.argv[2]) if len(sys.argv) > 2 else 8
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="rollup-probe")
register_tables(spark, sf_dir)

workdir = os.path.join(process_scratch_dir("rollup_probe"), "store")
shutil.rmtree(workdir, ignore_errors=True)
os.makedirs(workdir)
roll = ContinuousHourlyRollup(
    spark,
    os.path.join(sf_dir, "events.parquet"),
    workdir,
    track_batch_input_rows=True,
    compact_after=compact_after,
)

ev = spark.table("events").persist()
n = ev.count()
times = []
for i in range(n_batches):
    # mod-slice: every batch spans the full time range, so every epoch
    # touches every day — the hot-day regime where an uncompacted store's
    # per-refresh read grows O(#epochs) while compaction keeps it flat.
    # (Range-slicing by id would touch each day once and hide the cost.)
    batch = ev.filter(F.col("event_id") % n_batches == i)
    t0 = time.perf_counter()
    roll._refresh_buckets(batch, i)
    dt = round(time.perf_counter() - t0, 3)
    times.append(dt)
    print(
        json.dumps(
            {
                "epoch": i,
                "sec": dt,
                "staged_rows_read": roll.batch_input_rows[-1]
                if roll.batch_input_rows
                else None,
            }
        ),
        flush=True,
    )

first5 = sum(times[:5]) / 5
last5 = sum(times[-5:]) / 5
print(
    json.dumps(
        {
            "n_batches": n_batches,
            "compact_after": compact_after,
            "rows": n,
            "first5_avg_sec": round(first5, 3),
            "last5_avg_sec": round(last5, 3),
            "growth_ratio": round(last5 / first5, 2),
        }
    )
)
spark.stop()
