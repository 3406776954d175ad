"""Executor-loss determinism: SIGKILL a live executor JVM mid-query.

The r7 retry probe injects PYTHON-level task failures (an exception on
the first attempt); real clusters also lose whole executors — OOM
kills, preemption, hardware. That is a different recovery path: the
dead executor's SHUFFLE FILES go with it (standalone serves shuffle
blocks from the executor itself; no external shuffle service), so
downstream reducers hit FetchFailed and the scheduler RESUBMITS the
finished map stage for the lost partitions, while the standalone
master relaunches a replacement executor. At 100 TB this happens
hourly; every registered result must be bit-identical through it.

Protocol (one subprocess per phase, like localcluster_probe):

1. clean phase — ``local-cluster[3,4,2560]``: build multiplied
   distinct-content fixtures (invariant 23), run the heavy production
   shapes (capped dedup composition, PQ codebook-train+encode, IVF
   kmeans+assign, streaming dedup ingest, stateful counter), record
   order-insensitive fingerprints + wall times.
2. chaos phase — same topology, same shapes; a killer thread SIGKILLs
   one executor JVM at ~40% of each heavy shape's clean wall time,
   verifying a Spark job was ACTIVE at kill time (else the kill is
   recorded as a miss, and the probe fails if every kill missed).
3. compare — every fingerprint must match the clean phase exactly.

The probe also records how many distinct executor PIDs appeared per
phase: > workers in the chaos phase proves the master genuinely
relaunched replacements after the kills.

Usage: python scripts/executor_loss_probe.py            (orchestrates)
       ... --collect {clean,chaos} --out F.json         (one phase)
Exit 0 iff all fingerprints match, ≥1 kill landed mid-job, and the
kills actually removed live executor JVMs.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import threading
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# default topology: 3 workers so one kill leaves 2 live executors and
# the relaunch is observable; worker memory sized for the 2× shapes
os.environ.setdefault("SPARK_GRAFT_LC_MASTER", "local-cluster[3,4,2560]")

import localcluster_probe as lc  # noqa: E402  (harness reuse)


def executor_pids() -> set[int]:
    """PIDs of live executor JVMs (children forked by the in-driver
    standalone workers)."""
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True, text=True,
    ).stdout
    return {int(p) for p in out.split()}


class Killer:
    """Background executor assassin: waits ``delay_s``, requires an
    active Spark job, then SIGKILLs the lowest-PID executor."""

    def __init__(self, spark) -> None:
        self.spark = spark
        self.log: list[dict] = []
        self.seen_pids: set[int] = set()

    def observe(self) -> None:
        self.seen_pids |= executor_pids()

    def arm(self, delay_s: float, label: str) -> threading.Thread:
        def run() -> None:
            time.sleep(delay_s)
            self.observe()
            active = list(
                self.spark.sparkContext.statusTracker().getActiveJobsIds()
            )
            pids = executor_pids()
            entry = {
                "label": label, "delay_s": round(delay_s, 1),
                "active_jobs": active, "live_executors": len(pids),
            }
            if active and pids:
                victim = min(pids)
                os.kill(victim, signal.SIGKILL)
                entry["killed_pid"] = victim
                # verify the process is really gone (SIGKILL is async)
                for _ in range(50):
                    if victim not in executor_pids():
                        break
                    time.sleep(0.1)
                entry["confirmed_dead"] = victim not in executor_pids()
            else:
                entry["missed"] = True
            self.log.append(entry)
            print(f"    killer[{label}]: {entry}", flush=True)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t


def collect_phase(mode: str, out_path: str, walls: dict[str, float]) -> None:
    from pyspark.sql import functions as F

    from hive_plan_service_spark.operators import vectors as vx
    from hive_plan_service_spark.operators.kmeans import kmeans_integer_np
    from hive_plan_service_spark.plans.llm_ops import dedup_clusters_production
    from hive_plan_service_spark.sources.catalog import register_tables

    spark = lc.build_session("localcluster")
    killer = Killer(spark)
    killer.observe()
    result: dict = {"mode": mode, "master": spark.sparkContext.master}

    root = lc._scratch()
    docs_path = os.path.join(root, f"docs_{lc.DOCS_MULT}x")
    emb_path = os.path.join(root, f"emb_{lc.EMB_MULT}x")
    if mode == "clean":
        lc.build_fixtures(spark)
    else:
        register_tables(spark, lc.SF_DIR)

    shapes: dict = {}
    job_retries: list[dict] = []

    def run_shape(label: str, fn) -> None:
        """Run one shape; in chaos mode arm a kill and allow ONE
        job-level retry. localCheckpoint blocks (invariant 24) are
        deliberately unrecoverable under executor loss — Spark fails
        the job LOUDLY ("Checkpoint block not found"), never silently
        corrupts — and a 100 TB orchestrator answers that with a job
        retry. The certification is: transparent recovery OR loud
        failure + bit-identical retry."""
        t0 = time.time()
        if mode == "chaos":
            # 40% into the clean wall — mid-flight, past the scan stages
            killer.arm(max(1.0, 0.4 * walls.get(label, 10.0)), label)
        try:
            out = fn()
        except Exception as e:  # noqa: BLE001 — loud-failure path
            if mode != "chaos":
                raise
            job_retries.append({"shape": label, "err": str(e)[:300]})
            print(f"    {label}: loud failure after kill — job-level "
                  f"retry ({str(e)[:160]})", flush=True)
            out = fn()
        out[label]["wall_s"] = round(time.time() - t0, 1)
        shapes.update(out)
        killer.observe()

    def dedup_shape() -> dict:
        spark.read.parquet(docs_path).createOrReplaceTempView("documents")
        try:
            return {"dedup_clusters_capped": lc.fingerprint(
                dedup_clusters_production(spark, lc.SF_DIR)
            )}
        finally:
            register_tables(spark, lc.SF_DIR, force=True)

    def pq_shape() -> dict:
        corpus = spark.read.parquet(emb_path)
        books = vx.pq_train_codebooks_np(
            corpus, subspaces=4, codes=16, dim=64, max_iter=3
        ).localCheckpoint(eager=True)
        return {
            "pq_codebooks_np": lc.fingerprint(books),
            "pq_encode_np": lc.fingerprint(
                vx.pq_encode_np(corpus, books, subspaces=4, dim=64)
            ),
        }

    def ivf_shape() -> dict:
        corpus = spark.read.parquet(emb_path)
        cents = (
            kmeans_integer_np(
                corpus, k=16, dim=64, iters=3, vec="embedding",
                id_col="vec_id",
            )
            .select(
                F.col("code").cast("bigint").alias("centroid_id"),
                F.col("centroid").cast("array<float>").alias("embedding"),
            )
            .localCheckpoint(eager=True)
        )
        return {
            "kmeans_centroids_np": lc.fingerprint(cents),
            "ivf_assign_np": lc.fingerprint(vx.ivf_assign_np(corpus, cents)),
        }

    run_shape("dedup_clusters_capped", dedup_shape)
    run_shape("pq_encode_np", pq_shape)
    run_shape("ivf_assign_np", ivf_shape)

    from hive_plan_service_spark.plans.registry import all_queries

    qs = all_queries()
    for qname, key in (
        ("b27_stream_dedup_ingest", "stream_dedup_ingest"),
        ("b24_stateful_counter_applyinpandas", "stateful_counter"),
    ):
        run_shape(key, lambda q=qname, k=key: {
            k: lc.fingerprint(qs[q].fn(spark, lc.SF_DIR))
        })

    result["shapes"] = shapes
    result["kills"] = killer.log
    result["job_retries"] = job_retries
    result["distinct_executor_pids"] = len(killer.seen_pids)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(result, f)


def canonical_chaos(kill_every_s: float) -> None:
    """The driver's full t2 gate under sustained executor attrition:
    every CANONICAL slot must pass its DuckDB value-hash oracle while
    an assassin thread SIGKILLs one executor JVM every ``kill_every_s``
    seconds for the whole sweep. The oracle IS the clean reference
    here (DuckDB runs outside Spark), so no clean Spark phase is
    needed; loud failures get one job-level retry (the orchestrator
    contract for unrecoverable checkpoint blocks, see run_shape)."""
    from parity import check_query

    from hive_plan_service_spark.plans.registry import CANONICAL, all_queries

    spark = lc.build_session("localcluster")
    stop = threading.Event()
    kills: list[dict] = []
    seen: set[int] = set(executor_pids())

    def assassin() -> None:
        while not stop.wait(kill_every_s):
            pids = executor_pids()
            seen.update(pids)
            if not pids:
                continue
            active = list(
                spark.sparkContext.statusTracker().getActiveJobsIds()
            )
            victim = min(pids)
            os.kill(victim, signal.SIGKILL)
            kills.append({"pid": victim, "active_jobs": active})
            print(f"    assassin: killed {victim} "
                  f"(active jobs {active})", flush=True)

    threading.Thread(target=assassin, daemon=True).start()

    qs = all_queries()
    fails: list[dict] = []
    retries: list[dict] = []
    t_all = time.time()
    for name in CANONICAL:
        try:
            check_query(spark, qs[name], lc.CANON_SF_DIR)
        except Exception as e:  # noqa: BLE001 — loud failure: one retry
            retries.append({"slot": name, "err": str(e)[:200]})
            print(f"    {name}: loud failure — job-level retry", flush=True)
            try:
                check_query(spark, qs[name], lc.CANON_SF_DIR)
            except Exception as e2:  # noqa: BLE001
                fails.append({"slot": name, "err": str(e2)[:300]})
                print(f"{name}: FAIL {str(e2)[:200]}", flush=True)
    stop.set()
    seen.update(executor_pids())
    mid_job = [k for k in kills if k["active_jobs"]]
    summary = {
        "ok": not fails and len(mid_job) >= 2,
        "slots_ok": len(CANONICAL) - len(fails),
        "slots_total": len(CANONICAL),
        "failures": fails,
        "job_retries": retries,
        "kills": len(kills),
        "kills_mid_job": len(mid_job),
        "kill_every_s": kill_every_s,
        "distinct_executor_pids": len(seen),
        "workers": lc._WORKERS,
        "relaunch_observed": len(seen) > lc._WORKERS,
        "wall_s": round(time.time() - t_all, 1),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()
    sys.exit(0 if summary["ok"] else 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--collect", choices=["clean", "chaos"])
    ap.add_argument("--out")
    ap.add_argument("--walls", default="{}")
    ap.add_argument("--canonical", action="store_true",
                    help="all 50 canonical oracle checks under a "
                         "periodic executor assassin")
    ap.add_argument("--kill-every", type=float, default=15.0)
    args = ap.parse_args()
    if args.canonical:
        canonical_chaos(args.kill_every)
        return
    if args.collect:
        collect_phase(args.collect, args.out, json.loads(args.walls))
        return

    root = lc._scratch()
    paths = {m: os.path.join(root, f"execloss_{m}.json")
             for m in ("clean", "chaos")}
    try:
        walls: dict[str, float] = {}
        for mode, out in paths.items():  # clean first: builds fixtures
            t0 = time.time()
            print(f"=== phase {mode}", flush=True)
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--collect", mode, "--out", out,
                 "--walls", json.dumps(walls)],
                cwd=REPO_ROOT,
            ).returncode
            print(f"    phase {mode}: rc={rc} in {time.time() - t0:.0f}s",
                  flush=True)
            if rc != 0:
                print(json.dumps({"ok": False, "failed_phase": mode}))
                sys.exit(1)
            if mode == "clean":
                with open(out) as f:
                    walls = {
                        k: v["wall_s"]
                        for k, v in json.load(f)["shapes"].items()
                        if "wall_s" in v
                    }

        with open(paths["clean"]) as f:
            clean = json.load(f)
        with open(paths["chaos"]) as f:
            chaos = json.load(f)

        mismatches = []
        for name, fp in clean["shapes"].items():
            got = chaos["shapes"].get(name, {})
            if any(fp.get(k) != got.get(k) for k in ("n", "m1", "m2")):
                mismatches.append({"shape": name, "clean": fp, "chaos": got})
        kills = chaos.get("kills", [])
        landed = [k for k in kills
                  if k.get("confirmed_dead") and k.get("active_jobs")]
        summary = {
            "ok": not mismatches and len(landed) >= 1,
            "shape_fingerprints_match": not mismatches,
            "mismatches": mismatches,
            "kills_armed": len(kills),
            "kills_landed_mid_job": len(landed),
            "kills": kills,
            "job_retries": chaos.get("job_retries", []),
            "distinct_executor_pids_chaos": chaos["distinct_executor_pids"],
            "workers": lc._WORKERS,
            "relaunch_observed":
                chaos["distinct_executor_pids"] > lc._WORKERS,
            "shapes_clean_wall_s":
                {k: v.get("wall_s") for k, v in clean["shapes"].items()
                 if "wall_s" in v},
            "shapes_chaos_wall_s":
                {k: v.get("wall_s") for k, v in chaos["shapes"].items()
                 if "wall_s" in v},
        }
        print(json.dumps(summary), flush=True)
        sys.exit(0 if summary["ok"] else 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
