"""Cross-process concurrency certification.

A 100 TB deployment runs MANY Spark applications against the same
hosts: scratch volumes (`spark.local.dir`, /tmp, /dev/shm) are shared
between processes that know nothing about each other. The in-process
concurrency gate (scripts/concurrency_probe.py — 50 queries, one
shared session) cannot see cross-process interference: the r7
"transient 49/50" class was exactly that — two suites racing on a
fixed overwrite path under the shared scratch root
(session.process_scratch_dir is the fix; tests/test_scratch_isolation
is the static lint; THIS probe is the live certification).

Runs two full driver_sim sweeps (all 50 canonical slots, DuckDB
value-hash oracles, sf0.01) in SEPARATE concurrent processes, started
staggered by a few seconds so their per-query phases interleave
differently run to run. Both must be 50/50.

Run: python scripts/multiproc_probe.py [sf_dir]
Exit 0 iff both concurrent sweeps pass every oracle.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cmd = [sys.executable, os.path.join(REPO_ROOT, "scripts", "driver_sim.py"),
           sf_dir, "16"]  # 16 cores each — 2x suites share the 32-core box
    t0 = time.time()
    procs = []
    for i in range(2):
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
        ))
        time.sleep(3)  # stagger so phases interleave, not lock-step
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate()
        tail = [ln for ln in out.splitlines() if ln.strip()][-1:]
        print(f"proc {i}: rc={p.returncode} {tail[0] if tail else ''}", flush=True)
        if p.returncode != 0:
            ok = False
            fails = [ln for ln in out.splitlines() if ": FAIL" in ln]
            print("\n".join(fails[:10]), flush=True)
    print(f"=== multiproc {'OK' if ok else 'FAIL'} in {time.time() - t0:.0f}s ===",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
