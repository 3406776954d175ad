"""Memory-pressure / spill certification (VERDICT r5 item #1).

Every scale probe so far ran with 128 GiB of headroom; at 100 TB the
interesting failures are spills and broadcast OOMs. This probe re-runs
the heavy set inside a deliberately SMALL heap (default 4 GiB driver —
in local mode the driver heap IS the executor heap) with
``spark.memory.fraction`` lowered so execution memory is scarce, and
captures spill/peak metrics from the Spark event log. A workload
passes if it COMPLETES (spilling as needed) — an OOM instead of a
spill is exactly the class of failure this certifies against.

Each workload runs in its own SUBPROCESS: its own JVM (so
spark.driver.memory takes effect and an OOM can't poison the next
workload) and its own event-log dir (clean metric attribution).

Workloads:
    tpch   b09 + b04_q3 + b04_q5 at sf0.1 (registry paths)
    dedup  dedup_clusters_production over a mult× word-suffixed corpus
    pq     768-dim corpus build + twin PQ train/encode (pq_dim_probe)
    join   stream-stream join over mult× replicated events
           (provider from the measured decision helper)

Usage:
    python scripts/spill_probe.py --all [--heap 4g] [--fraction 0.3]
    python scripts/spill_probe.py --workload dedup --mult 40 [...]

Per workload prints one JSON row: wall, rows, memory/disk bytes
spilled, task peak execution memory, and rc. ``--all`` also prints a
summary line.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: (workload, default mult) — mults sized so each leg stresses a 4 GiB
#: heap without running for tens of minutes (raise via --mult).
DEFAULT_MULTS = {
    "tpch": 1, "dedup": 40, "pq": 500, "join": 100, "curation": 40,
}


def parse_event_log(log_dir: str) -> dict:
    """Sum spill / peak metrics over every task in the app's log.

    Spark 4 writes a rolling-log DIRECTORY (eventlog_v2_<app>/events_*)
    per application; older layouts write a single file. Handle both.
    """
    files: list[str] = []
    for p in glob.glob(os.path.join(log_dir, "*")):
        if os.path.isdir(p):
            files.extend(glob.glob(os.path.join(p, "events_*")))
        elif not p.endswith(".inprogress"):
            files.append(p)
    mem_spill = disk_spill = 0
    peak_exec = 0
    n_tasks = 0
    for path in sorted(files):
        with open(path, errors="replace") as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                tm = ev.get("Task Metrics") or {}
                if not tm:
                    continue
                n_tasks += 1
                mem_spill += tm.get("Memory Bytes Spilled", 0)
                disk_spill += tm.get("Disk Bytes Spilled", 0)
                peak_exec = max(peak_exec, tm.get("Peak Execution Memory", 0))
    return {
        "tasks": n_tasks,
        "memory_spill_mb": round(mem_spill / 1024**2, 1),
        "disk_spill_mb": round(disk_spill / 1024**2, 1),
        "task_peak_exec_mb": round(peak_exec / 1024**2, 1),
    }


# ----------------------------------------------------------------- inner


def _run_workload(name: str, mult: int, heap: str, fraction: str,
                  sf_dir: str) -> None:
    log_dir = tempfile.mkdtemp(prefix=f"spill_{name}_")
    from hive_plan_service_spark.session import get_spark
    from hive_plan_service_spark.sources.catalog import register_tables

    os.environ["SPARK_DRIVER_MEMORY"] = heap
    spark = get_spark(
        app_name=f"hpss-spill-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",  # parse as plain JSON lines
            "spark.memory.fraction": fraction,
        },
    )
    register_tables(spark, sf_dir)

    from pyspark.sql import functions as F  # noqa: F401

    t0 = time.perf_counter()
    rows = 0
    cleanup: list[str] = []
    if name == "tpch":
        from hive_plan_service_spark.plans.registry import all_queries

        reg = all_queries()
        for q in ("b09_agg_pricing_summary", "b04_join_q3_shipping_priority",
                  "b04_join_q5_local_supplier"):
            rows += reg[q].fn(spark, sf_dir).count()
    elif name == "dedup":
        from scripts.scale_probe import multiplied_docs
        from hive_plan_service_spark.plans.llm_ops import (
            dedup_clusters_production,
        )

        corpus, path = multiplied_docs(spark, mult)
        cleanup.append(path)
        corpus.createOrReplaceTempView("documents")
        t0 = time.perf_counter()  # corpus synthesis excluded
        rows = dedup_clusters_production(spark, sf_dir).count()
    elif name == "pq":
        from scripts.pq_dim_probe import widened_corpus, SUBSPACES, CODES, DIM
        from hive_plan_service_spark.operators import vectors as vx

        # No conf set here ON PURPOSE: the certification is that the
        # wide-row operators size their own unmanaged buffers
        # (session.apply_wide_row_conf inside the twins, heap-safe row
        # groups inside widened_corpus's write) with no caller help.
        unit, path = widened_corpus(spark, mult)
        cleanup.append(path)
        t0 = time.perf_counter()  # corpus synthesis excluded
        books = vx.pq_train_codebooks_np(
            unit, subspaces=SUBSPACES, codes=CODES, dim=DIM, max_iter=5
        )
        rows = vx.pq_encode_np(
            unit, books, subspaces=SUBSPACES, dim=DIM
        ).count()
    elif name == "curation":
        from scripts.scale_probe import multiplied_docs
        from hive_plan_service_spark.plans.llm_ops import (
            llm_corpus_clean_pipeline,
        )

        corpus, path = multiplied_docs(spark, mult)
        cleanup.append(path)
        corpus.createOrReplaceTempView("documents")
        t0 = time.perf_counter()  # corpus synthesis excluded
        rows = llm_corpus_clean_pipeline(spark, sf_dir).count()
    elif name == "join":
        from scripts.streaming_probe import (
            replicated_events,
            _ss_join,
            drive,
        )
        from hive_plan_service_spark.streaming.windows import (
            apply_state_store_conf,
        )

        feed = replicated_events(spark, mult)
        cleanup.append(feed)
        n_events = spark.read.parquet(feed).count()
        apply_state_store_conf(spark, int(n_events * 0.4))
        t0 = time.perf_counter()  # feed synthesis excluded
        wall, out_rows, _ = drive(_ss_join(spark, feed), "append")
        rows = n_events
    else:
        raise SystemExit(f"unknown workload {name}")
    wall = round(time.perf_counter() - t0, 2)
    spark.stop()
    row = {"workload": name, "mult": mult, "heap": heap,
           "memory_fraction": fraction, "wall_sec": wall, "rows": rows}
    row.update(parse_event_log(log_dir))
    print(json.dumps(row), flush=True)
    shutil.rmtree(log_dir, ignore_errors=True)
    for p in cleanup:
        shutil.rmtree(p, ignore_errors=True)


# ------------------------------------------------------------ orchestrate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--workload", choices=sorted(DEFAULT_MULTS))
    ap.add_argument("--mult", type=int, default=None)
    ap.add_argument("--heap", default="4g")
    ap.add_argument("--fraction", default="0.3")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if args.workload:
        _run_workload(
            args.workload,
            args.mult or DEFAULT_MULTS[args.workload],
            args.heap, args.fraction, sf_dir,
        )
        return
    if not args.all:
        ap.error("pass --all or --workload NAME")
    results = []
    for name in ("tpch", "dedup", "pq", "join", "curation"):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--workload", name,
               "--mult", str(args.mult or DEFAULT_MULTS[name]),
               "--heap", args.heap, "--fraction", args.fraction]
        proc = subprocess.run(
            cmd, cwd=REPO_ROOT, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines())
             if ln.startswith("{")),
            None,
        )
        if proc.returncode != 0 or line is None:
            results.append({"workload": name, "rc": proc.returncode,
                            "error": proc.stdout[-1500:]})
        else:
            results.append({**json.loads(line), "rc": 0})
        print(json.dumps(results[-1]), flush=True)
    ok = all(r.get("rc") == 0 for r in results)
    print(json.dumps({"ok": ok, "workloads": len(results)}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
