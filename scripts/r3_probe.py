"""Round-3 scratch probe: parity of the four converted canonical slots.

Run: python scripts/r3_probe.py [sf_dir ...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from pyspark.sql import SparkSession

from hive_plan_service_spark.session import tune
from hive_plan_service_spark.plans.registry import all_queries
from parity import check_query

QUERIES = [
    "b28_ann_ivf",
    "b27_dedup_minhash_lsh",
    "b27_dedup_simhash",
    "b28_ann_lsh_hyperplane",
    "b27_dedup_minhash_lsh_xx",
    "b27_dedup_simhash_xx",
]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
tune(spark)
sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

qs = all_queries()
fail = 0
for sf in sf_dirs:
    print(f"=== {sf} ===")
    for name in QUERIES:
        t0 = time.time()
        try:
            check_query(spark, qs[name], sf)
            print(f"{name}: OK ({time.time() - t0:.1f}s)")
        except Exception as e:
            fail += 1
            print(f"{name}: FAIL {str(e)[:500]}")

spark.stop()
sys.exit(1 if fail else 0)
