"""Large-state streaming certification (VERDICT r7 #4).

Every stateful surface had only run fixture-scale state (≤ ~10k state
rows). This probe drives Spark's state store itself — a streaming
``dropDuplicates`` whose state holds one row per distinct key — to
keyspaces in the millions, under BOTH providers (HDFSBacked in-heap vs
RocksDB), and certifies:

1. **bit-identity**: the deduplicated key multiset fingerprint
   (count + XOR of xxhash64(key)) is identical across providers and
   run shapes;
2. **restart**: the query is stopped mid-stream after ≥2 committed
   micro-batches and resumed from the checkpoint — the state store
   reloads (HDFS: snapshot+delta replay; RocksDB: SST load) and the
   final fingerprint matches the uninterrupted run;
3. **measured memory**: ``stateOperators[].memoryUsedBytes`` per
   provider at each keyspace size — the evidence behind
   streaming/windows.choose_state_store_provider's avg_row_bytes
   parameter (previously a 256 B estimate from the 4M-row r5 probe).

Feed: events.parquet multiplied as distinct keys (key = event_id ×
mult + rep — exactly rows × mult distinct), written as 32 files;
``maxFilesPerTrigger=4`` forces 8 micro-batches so state builds
incrementally like a real ingest.

Usage: python scripts/largestate_probe.py [n_keys ...]  (default 10000000)
Prints per-run lines + one JSON line; exit 0 iff all fingerprints agree.
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

from hive_plan_service_spark.session import (  # noqa: E402
    default_parallelism,
    get_spark,
    process_scratch_dir,
)
from hive_plan_service_spark.streaming.windows import (  # noqa: E402
    HDFS_BACKED_PROVIDER,
    ROCKSDB_PROVIDER,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def build_feed(spark, n_keys: int) -> tuple[str, int]:
    """Returns (path, exact distinct-key count). The feed carries
    n_events × ceil(n_keys/n_events) distinct uids — exceeding n_keys
    whenever the row count doesn't divide it (r9, ADVICE: comparing the
    ingest fingerprint against the REQUESTED size failed spuriously for
    sizes like 10_000_001 with all four fingerprints agreeing)."""
    base = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    n = base.count()
    mult = (n_keys + n - 1) // n
    path = os.path.join(process_scratch_dir("largestate"), f"feed_{n_keys}")
    if os.path.isdir(path):
        return path, n * mult
    reps = spark.range(mult).select(F.col("id").alias("_rep"))
    (
        base.crossJoin(reps)
        .select(
            (F.col("event_id") * mult + F.col("_rep")).alias("uid"),
            "event_type",
        )
        .repartition(default_parallelism())
        .write.mode("overwrite")
        .parquet(path)
    )
    return path, n * mult


def run_once(
    spark, feed: str, provider: str, *, restart_after: int | None = None
) -> dict:
    """One full ingest under ``provider``; returns fingerprint + metrics.

    ``restart_after``: stop the query after that many committed batches,
    then resume from the same checkpoint to completion.
    """
    tag = f"{'rocksdb' if 'RocksDB' in provider else 'hdfs'}" + (
        f"_restart{restart_after}" if restart_after else ""
    )
    work = os.path.join(process_scratch_dir("largestate"), f"run_{tag}")
    shutil.rmtree(work, ignore_errors=True)
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)

    schema = spark.read.parquet(feed).schema

    def sink(batch_df, epoch_id):
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            # pre-uppercased (r7 locale gate)
            .option("partitionOverwriteMode", "DYNAMIC")
            .partitionBy("epoch")
            .parquet(out_dir)
        )

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(feed)
            .dropDuplicates(["uid"])
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    t0 = time.time()
    q = start()
    interrupted = 0
    if restart_after:
        while True:
            done = len([p for p in q.recentProgress if p.get("numInputRows")])
            if done >= restart_after:
                q.stop()
                q.awaitTermination()
                interrupted = done
                break
            if not q.isActive:  # finished before the kill point
                break
            time.sleep(0.3)
        q = start()
    q.awaitTermination()
    progress = list(q.recentProgress)
    wall = round(time.time() - t0, 1)

    mem = 0
    rows_total = 0
    custom: dict = {}
    for p in progress:
        for so in p.get("stateOperators", []):
            mem = max(mem, so.get("stateOnCurrentVersionSizeBytes")
                      or so.get("memoryUsedBytes") or 0)
            rows_total = max(rows_total, so.get("numRowsTotal", 0))
            for k, v in (so.get("customMetrics") or {}).items():
                if "Memory" in k or "SstFileSize" in k or "PinnedBlocks" in k:
                    custom[k] = max(custom.get(k, 0), v)

    fp = (
        spark.read.parquet(out_dir)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("uid")).alias("x"),
        )
        .collect()[0]
    )
    res = {
        "run": tag, "wall_s": wall, "n": fp["n"], "xor": int(fp["x"]),
        "state_rows": rows_total, "state_mem_bytes": mem,
        "interrupted_after": interrupted, **custom,
    }
    print(json.dumps(res), flush=True)
    shutil.rmtree(work, ignore_errors=True)
    return res


def _capture_jvm_stderr() -> tuple[str, int]:
    """Redirect fd 2 (inherited by the JVM at launch) to a scratch file
    so uncaught stream-execution-thread exceptions are inspectable.
    Returns (log path, saved original fd 2) — the failure path must
    restore fd 2 and dump the log BEFORE the scratch dir is removed, or
    the probe's own traceback lands on a deleted inode (r9 review)."""
    path = os.path.join(process_scratch_dir("largestate"), "jvm_stderr.log")
    orig = os.dup(2)
    fd = os.open(path, os.O_CREAT | os.O_WRONLY | os.O_TRUNC)
    os.dup2(fd, 2)
    os.close(fd)
    return path, orig


def _scan_uncaught(path: str) -> tuple[int, list[str]]:
    """Classify uncaught-exception lines from the captured JVM stderr.

    Tolerated (r8 watch item, root-caused r9): a rare
    ``java.lang.StackOverflowError`` on the *stream execution thread*
    when ``q.stop()``'s interrupt lands while the thread is inside the
    py4j ``PythonProxyHandler`` call running the foreachBatch sink —
    the interrupt aborts the write job (benign; the replayed batch is
    idempotent through the epoch-partitioned sink) and the thread dies
    while py4j/Spark wrap the failure, overflowing during exception
    construction. Recovery is provably unaffected: every restart-run
    fingerprint matches the uninterrupted run. ANY other uncaught
    exception type fails the probe — the tolerance is class-exact so
    the noise can never mask a real failure.
    """
    tolerated = 0
    other: list[str] = []
    try:
        with open(path, errors="replace") as f:
            for line in f:
                if line.startswith("Exception in thread"):
                    if (
                        "stream execution thread" in line
                        and "java.lang.StackOverflowError" in line
                    ):
                        tolerated += 1
                    else:
                        other.append(line.strip())
    except OSError:
        pass
    return tolerated, other


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000_000]
    err_log, orig_fd2 = _capture_jvm_stderr()
    spark = get_spark(app_name="hpss-largestate")
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    all_runs = {}
    try:
        for n_keys in sizes:
            feed, expected_keys = build_feed(spark, n_keys)
            runs = [
                run_once(spark, feed, HDFS_BACKED_PROVIDER),
                run_once(spark, feed, ROCKSDB_PROVIDER),
                run_once(spark, feed, ROCKSDB_PROVIDER, restart_after=2),
                run_once(spark, feed, HDFS_BACKED_PROVIDER, restart_after=2),
            ]
            fps = {(r["n"], r["xor"]) for r in runs}
            agree = len(fps) == 1
            ok = ok and agree and runs[0]["n"] == expected_keys
            all_runs[n_keys] = runs
            print(
                f"=== {n_keys} keys: fingerprints "
                f"{'AGREE' if agree else 'DISAGREE: ' + str(fps)}; "
                f"n={runs[0]['n']} (expected {expected_keys})",
                flush=True,
            )
            shutil.rmtree(feed, ignore_errors=True)
    finally:
        # spark.stop() may itself raise (the tolerated-SOE class fires in
        # the stop path) — never let that skip the fd-2 restore, the
        # uncaught scan, or the log dump (r9 ADVICE find)
        try:
            spark.stop()
        except Exception as stop_exc:  # noqa: BLE001 - diagnostics path
            print(f"spark.stop() raised: {stop_exc!r}", flush=True)
        tolerated, other = _scan_uncaught(err_log)
        # restore fd 2 before deleting the log it pointed at, so a
        # propagating exception's traceback is visible; on the failure
        # path also dump the captured JVM stderr to stdout (run_gates
        # merges streams — without this a crashed probe leaves no
        # diagnostics anywhere, r9 review find)
        os.dup2(orig_fd2, 2)
        os.close(orig_fd2)
        if sys.exc_info()[0] is not None:
            try:
                with open(err_log, errors="replace") as f:
                    print(f.read()[-8000:], flush=True)
            except OSError:
                pass
        shutil.rmtree(process_scratch_dir("largestate"), ignore_errors=True)
    ok = ok and not other
    print(
        json.dumps(
            {
                "ok": ok,
                "soe_tolerated": tolerated,
                "uncaught_other": other,
                "sizes": {str(k): v for k, v in all_runs.items()},
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
