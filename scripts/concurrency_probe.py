"""Concurrent-queries-on-one-session certification.

A production 100 TB deployment serves many queries from one long-lived
SparkSession (thrift server, notebook clusters, orchestrated DAG fan-
out). That concurrency crosses every piece of session-shared state this
engine maintains: the catalog's idempotent-registration conf key, temp
views, scratch directories, streaming memory-sink names, and — new in
r6 — `apply_wide_row_conf`'s down-only conf ratchets, which a wide-row
twin may apply WHILE other queries are planning.

This probe runs ALL 50 canonical queries through the driver's own
parity gate (`tests.parity.check_query`, Spark vs DuckDB, value-exact)
from a thread pool over ONE shared session, with a chaos thread
interleaving wide-row twin calls (conf ratchets + heap-safe writes) the
whole time. PASS = every query value-matches its oracle under
concurrency and the chaos thread's twin results match its own serial
baseline.

Usage: python scripts/concurrency_probe.py [--threads 8]
Prints per-query JSON rows and one summary; exit 1 on any failure.
"""
from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import tempfile
import threading
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from hive_plan_service_spark.session import get_spark
    from hive_plan_service_spark.sources.catalog import register_tables
    from hive_plan_service_spark.plans import registry
    from tests.parity import check_query

    spark = get_spark(app_name="hpss-concurrency")
    register_tables(spark, sf_dir)
    reg = registry.all_queries()

    work: "queue.Queue[str]" = queue.Queue()
    for name in registry.CANONICAL:
        work.put(name)

    failures: list[str] = []
    lock = threading.Lock()
    done = threading.Event()

    def worker() -> None:
        while True:
            try:
                name = work.get_nowait()
            except queue.Empty:
                return
            t0 = time.perf_counter()
            try:
                check_query(spark, reg[name], sf_dir)
                ok, err = True, None
            except Exception as exc:  # noqa: BLE001 — report, don't die
                ok, err = False, f"{type(exc).__name__}: {exc}"[:300]
            with lock:
                if not ok:
                    failures.append(f"{name}: {err}")
                print(json.dumps({
                    "query": name, "ok": ok,
                    "wall_sec": round(time.perf_counter() - t0, 2),
                    **({"err": err} if err else {}),
                }), flush=True)

    def chaos() -> None:
        """Wide-row twin calls (conf ratchets, Arrow stages, heap-safe
        writes) interleaved with the whole pool's planning."""
        from pyspark.sql import functions as F

        from hive_plan_service_spark.operators.vectors import cosine_topk_np
        from hive_plan_service_spark.sources.writers import (
            write_parquet_heap_safe,
        )

        emb = spark.table("embeddings")
        qs = emb.filter(F.col("vec_id") < 4)
        baseline = sorted(
            map(tuple, cosine_topk_np(qs, emb, k=3).collect())
        )
        scratch = tempfile.mkdtemp(prefix="concurrency_chaos_")
        rounds = 0
        try:
            while not done.is_set():
                got = sorted(
                    map(tuple, cosine_topk_np(qs, emb, k=3).collect())
                )
                if got != baseline:
                    with lock:
                        failures.append(
                            "chaos: twin result diverged under concurrency"
                        )
                    return
                write_parquet_heap_safe(
                    qs, os.path.join(scratch, "w"), mode="overwrite"
                )
                rounds += 1
        finally:
            import shutil

            shutil.rmtree(scratch, ignore_errors=True)
            with lock:
                print(
                    json.dumps({"chaos_rounds": rounds}), flush=True
                )

    t0 = time.perf_counter()
    chaos_t = threading.Thread(target=chaos, daemon=True)
    chaos_t.start()
    pool = [threading.Thread(target=worker) for _ in range(args.threads)]
    for t in pool:
        t.start()
    for t in pool:
        t.join()
    done.set()
    chaos_t.join(timeout=120)
    print(json.dumps({
        "event": "summary",
        "queries": len(registry.CANONICAL),
        "threads": args.threads,
        "wall_sec": round(time.perf_counter() - t0, 1),
        "failures": failures,
    }), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
