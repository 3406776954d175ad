"""Same-box-window A/B of ANY registered query between HEAD and a past
commit — the standing drift-attribution tool (VERDICT r11 #3,
generalized from the r11 corpus-clean probe; the r8 extbench
precedent).

Use it the same day any per-query bench/extbench read moves beyond the
comparability band on an unchanged code path, instead of carrying a
watch item across rounds. The motivating case: r10 read
`llm_corpus_clean_pipeline` ~+11% over r9 (1.956 → 2.17–2.20 s) while
the engine diff on that query's path was docstring-only — the delta
had to be box state, and the honest way to prove that is to time BOTH
code versions back-to-back in one box window, removing the cross-round
calibration caveat entirely (settled as box: +0.3%, ROUND11_NOTES §2;
reproduced through this generic path in r12).

Method: `git worktree add --detach` the reference commit into scratch,
then run four interleaved subprocess measurements in A/B/B/A order
(HEAD, ref, ref, HEAD — symmetric around any monotone box drift). Each
measurement is an independent process (own JVM) in its own tree: warm
the query twice, adaptive min-of-N timed noop materializations
(bench.py's convergence rule), plus the tree's own pure-CPU
calibration. Verdict: the per-version minima are compared under the
same 10% raw-comparability band the bench contract uses —
`delta_pct` ≤ band ⇒ box attribution confirmed; beyond it with
agreeing calibrations ⇒ a real code regression (and the worktree makes
bisecting it immediate).

Verdict semantics (r11 ADVICE: `box` is gated on calibration
agreement): `box` = calibrations comparable AND |delta| within the
band; `code_regression` = comparable but beyond the band (bisect from
the worktree); `window_not_comparable` = the two versions' own
calibrations disagree by more than the band — the window was shifting,
rerun on a quieter box before attributing anything.

Usage: python scripts/ab_query.py [REF_COMMIT] [QUERY]
Defaults: 85d1e4b (the r9 stamp commit), llm_corpus_clean_pipeline.
Prints one JSON line; exit 0 iff all four measurements completed.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from bench import RAW_COMPARISON_BAND, raw_comparable  # noqa: E402
from hive_plan_service_spark.session import scratch_root  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: runs inside EACH tree (cwd = that tree): the tree's own registry,
#: materialize, and calibration — no cross-tree imports.
SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
import bench
from hive_plan_service_spark.plans.registry import all_queries
from hive_plan_service_spark.session import get_spark

sf_dir, name = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="hpss-ab")
spark.sparkContext.setLogLevel("ERROR")
fn = all_queries()[name].fn
for _ in range(2):
    bench.materialize(fn(spark, sf_dir))
runs = []
while True:
    t0 = time.perf_counter()
    bench.materialize(fn(spark, sf_dir))
    runs.append(time.perf_counter() - t0)
    if len(runs) >= 8:
        break
    if len(runs) >= 3:
        best, second = sorted(runs)[:2]
        if second <= 1.15 * best:
            break
cal = bench.calibrate(spark)
print("ABJSON " + json.dumps({
    "wall": round(min(runs), 4),
    "runs": [round(r, 4) for r in runs],
    "calibration_cpu_sec": cal,
}))
spark.stop()
"""


def measure(tree: str, query: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", SNIPPET, SF_DIR, query],
        cwd=tree, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    for ln in reversed(proc.stdout.splitlines()):
        if ln.startswith("ABJSON "):
            return json.loads(ln[len("ABJSON "):])
    raise RuntimeError(
        f"no ABJSON line from {tree} (rc={proc.returncode}):\n"
        + proc.stdout[-2000:]
    )


def main() -> int:
    ref = sys.argv[1] if len(sys.argv) > 1 else "85d1e4b"
    query = sys.argv[2] if len(sys.argv) > 2 else "llm_corpus_clean_pipeline"
    wt = tempfile.mkdtemp(prefix="ab_worktree_", dir=scratch_root())
    os.rmdir(wt)  # git worktree add wants to create it
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, ref],
        cwd=REPO_ROOT, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    runs: list[dict] = []
    try:
        # A/B/B/A: symmetric around monotone box drift within the window
        for label, tree in (("head", REPO_ROOT), (ref, wt),
                            (ref, wt), ("head", REPO_ROOT)):
            m = measure(tree, query)
            m["version"] = label
            runs.append(m)
            print(f"    {label}: wall {m['wall']}s "
                  f"(cal {m['calibration_cpu_sec']})", flush=True)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO_ROOT,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    head_min = min(m["wall"] for m in runs if m["version"] == "head")
    ref_min = min(m["wall"] for m in runs if m["version"] == ref)
    cal_head = min(m["calibration_cpu_sec"] for m in runs
                   if m["version"] == "head")
    cal_ref = min(m["calibration_cpu_sec"] for m in runs
                  if m["version"] == ref)
    delta_pct = round(100.0 * (head_min - ref_min) / ref_min, 1)
    comparable = raw_comparable(cal_head, cal_ref)
    # r11 ADVICE: a within-band delta under DISAGREEING calibrations is
    # a shifting window, not proof of box attribution — `box` requires
    # comparable calibrations too.
    if not comparable:
        verdict = "window_not_comparable"
    elif abs(delta_pct) <= 100 * RAW_COMPARISON_BAND:
        verdict = "box"
    else:
        verdict = "code_regression"
    print(json.dumps({
        "query": query, "ref": ref, "sf_dir": SF_DIR,
        "head_min": head_min, "ref_min": ref_min,
        "delta_pct": delta_pct,
        "cal_head_min": cal_head, "cal_ref_min": cal_ref,
        "cals_comparable": comparable,
        "verdict": verdict,
        "runs": runs,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
