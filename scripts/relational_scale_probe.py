"""Relational-headliner scale probe (VERDICT r7 #2).

The LLM shapes carry 1–2M-doc linearity curves; the relational
headliners (q3 star join, the q1-shaped pricing aggregate, the window
suite) had never been probed past sf0.1 (~600k lineitem). This probe
multiplies the relational fixtures 10–50× as DISTINCT content
(invariant 23: per-copy key shifting, so cross-copy joins cannot
exist and pair/group structure is preserved per copy), materializes
them to scratch parquet, and times the three headliners reading from
storage — the same methodology as scripts/scale_probe.py for dedup.

Key shifting: o_orderkey/l_orderkey and c_custkey/o_custkey shift by
copy × (max_key + 1) so orders⋈lineitem and customer⋈orders still
match within a copy; l_suppkey/l_partkey stay unshifted (supplier and
part are NOT multiplied — the probed queries don't join them, and
intact FKs keep the directory usable by every other query).

For the largest mult, each query's last run is attributed from the
Spark event log (scripts/attribution_probe.parse_stages): the top
stages by summed task time, with the max/median task ratio — the
straggler/knee evidence. The knee test: wall-clock per input row must
not grow with mult (AQE `initialPartitionNum=256` from session.tune
should pick shuffle width from bytes at every scale — the r7 dedup
fix, invariant 28, now verified on byte-heavy relational shuffles).

Usage: python scripts/relational_scale_probe.py [mults...]   (default 1 10 50)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Prints a human table plus one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from scripts.attribution_probe import parse_stages  # noqa: E402
from hive_plan_service_spark.plans.registry import all_queries  # noqa: E402
from hive_plan_service_spark.session import (  # noqa: E402
    default_parallelism,
    get_spark,
    process_scratch_dir,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = (
    "b09_agg_pricing_summary",        # scan → filter → 8-agg hash aggregate
    "b04_join_q3_shipping_priority",  # dim filter + fact-fact join + top-k
    "b12_window_functions",           # per-customer window suite
)

#: input table each query's row-throughput is measured against
DRIVER_TABLE = {
    "b09_agg_pricing_summary": "lineitem",
    "b04_join_q3_shipping_priority": "lineitem",
    "b12_window_functions": "orders",
}

MULTIPLIED = ("customer", "orders", "lineitem")


def build_mult_dir(spark, sf_dir: str, mult: int) -> str:
    """Multiplied fixture directory (distinct keys per copy); symlinks
    for the untouched tables so the dir serves register_tables whole."""
    from tests.parity import TABLES

    out_dir = os.path.join(process_scratch_dir("relscale"), f"sf_{mult}x")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    base = {
        t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        for t in MULTIPLIED
    }
    ok_max = base["orders"].agg(F.max("o_orderkey")).collect()[0][0] + 1
    ck_max = base["customer"].agg(F.max("c_custkey")).collect()[0][0] + 1
    reps = spark.range(mult).select(F.col("id").alias("_rep"))
    shifted = {
        "customer": base["customer"].crossJoin(reps).withColumn(
            "c_custkey", F.col("c_custkey") + F.col("_rep") * F.lit(ck_max)
        ),
        "orders": base["orders"].crossJoin(reps).withColumns({
            "o_orderkey": F.col("o_orderkey") + F.col("_rep") * F.lit(ok_max),
            "o_custkey": F.col("o_custkey") + F.col("_rep") * F.lit(ck_max),
        }),
        "lineitem": base["lineitem"].crossJoin(reps).withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("_rep") * F.lit(ok_max)
        ),
    }
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t in shifted:
            # keep the original column ORDER (schema equality matters to
            # nothing downstream, but diffs stay readable) and drop _rep
            cols = [c for c in base[t].columns]
            shifted[t].select(*cols).repartition(
                default_parallelism()
            ).write.mode("overwrite").parquet(dst)
        else:
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), dst)
    return out_dir


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 50]
    log_dir = tempfile.mkdtemp(prefix="relscale_log_")
    spark = get_spark(
        app_name="hpss-relscale",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    registry = all_queries()
    base_rows = {
        t: spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).count()
        for t in set(DRIVER_TABLE.values())
    }

    results: list[dict] = []
    attrib: dict[str, list[dict]] = {}
    try:
        for mult in mults:
            t0 = time.time()
            mdir = build_mult_dir(spark, SF_DIR, mult)
            print(f"--- mult={mult}: fixture in {time.time() - t0:.0f}s",
                  flush=True)
            for name in QUERIES:
                fn = registry[name].fn
                from bench import materialize

                # .count() is not a sink: Catalyst prunes unreferenced
                # operators (b12's Window vanished — bench.materialize)
                materialize(fn(spark, mdir))  # warm: codegen + cache
                n_out = fn(spark, mdir).count()  # rows only, untimed
                walls = []
                t_mark = 0
                for _ in range(2):
                    t_mark = int(time.time() * 1000)
                    t0 = time.perf_counter()
                    materialize(fn(spark, mdir))
                    walls.append(time.perf_counter() - t0)
                drv = DRIVER_TABLE[name]
                in_rows = base_rows[drv] * mult
                wall = min(walls)
                row = {
                    "query": name, "mult": mult, "wall_s": round(wall, 3),
                    "input_rows": in_rows, "out_rows": n_out,
                    "mrows_per_s": round(in_rows / wall / 1e6, 2),
                }
                results.append(row)
                print(f"{name}: mult={mult} wall={row['wall_s']}s "
                      f"({row['mrows_per_s']} M {drv} rows/s, "
                      f"{n_out} out)", flush=True)
                if mult == max(mults):
                    # attribute the LAST (warm, minimum-adjacent) run
                    attrib[name] = [
                        {k: s[k] for k in ("stage", "name", "tasks",
                                           "wall_s", "task_time_s",
                                           "max_task_s", "p50_task_s",
                                           "max_over_median",
                                           "shuf_read_mb", "shuf_write_mb")}
                        for s in parse_stages(log_dir, t_mark)[:6]
                    ]
    finally:
        spark.stop()
        shutil.rmtree(log_dir, ignore_errors=True)
        shutil.rmtree(process_scratch_dir("relscale"), ignore_errors=True)

    # attribution table needs the (stopped) session's flushed log — it
    # was parsed per-query above, print it now
    for name, stages in attrib.items():
        print(f"\n=== attribution @ mult={max(mults)}: {name}")
        print(f"{'stage':>6} {'tasks':>5} {'wall':>7} {'tasktime':>9} "
              f"{'maxtask':>8} {'p50':>6} {'mx/med':>6} {'shR MB':>8} "
              f"{'shW MB':>8}  name")
        for s in stages:
            print(f"{s['stage']:>6} {s['tasks']:>5} {s['wall_s']:>7} "
                  f"{s['task_time_s']:>9} {s['max_task_s']:>8} "
                  f"{s['p50_task_s']:>6} {str(s['max_over_median']):>6} "
                  f"{s['shuf_read_mb']:>8} {s['shuf_write_mb']:>8}  "
                  f"{s['name'][:60]}")

    # knee check: per-row cost at the largest mult vs the smallest —
    # >1.5× growth is a knee (report, don't hard-fail: this is a probe)
    verdicts = {}
    for name in QUERIES:
        per = {r["mult"]: r["wall_s"] / r["input_rows"] for r in results
               if r["query"] == name}
        lo, hi = min(per), max(per)
        ratio = round(per[hi] / per[lo], 2)
        verdicts[name] = {"per_row_cost_ratio": ratio,
                          "knee": bool(ratio > 1.5)}
        print(f"\n{name}: per-row cost {hi}x/{lo}x = {ratio} "
              f"({'KNEE' if ratio > 1.5 else 'knee-free'})")
    print(json.dumps({"results": results, "verdicts": verdicts,
                      "attribution": attrib}), flush=True)
    sys.exit(1 if any(v["knee"] for v in verdicts.values()) else 0)


if __name__ == "__main__":
    main()
