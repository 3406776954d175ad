"""Retry-determinism pin (r6 VERDICT #2).

The suite session is ``local[8]`` — ONE task attempt, so injected task
failures would fail the job instead of retrying. The pin therefore runs
``scripts/retry_probe.py --quick`` in a subprocess: a ``local[16,4]``
session, chaos identity stages under every fixture view (attempt 0 of
every 3rd partition raises), and bit-identity asserted for the seeded
sketch/top-k slots plus all four np index-build twins at sf0.001.

Slow (~1 JVM startup + two sweep passes); the full 50-slot sweep at
sf0.01 is the ``retry`` gate in scripts/run_gates.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_retry_probe_quick():
    proc = subprocess.run(
        [sys.executable, "scripts/retry_probe.py", "--quick"],
        cwd=REPO_ROOT,
        text=True,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        timeout=900,
    )
    lines = [
        ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")
    ]
    assert proc.returncode == 0 and lines, proc.stdout[-3000:]
    summary = json.loads(lines[-1])
    assert summary["ok"], summary
    # chaos must actually have fired — a probe that injects nothing
    # certifies nothing
    assert summary["injected_failures"] > 0, summary
    assert summary["mismatched"] == [] and summary["np_twin_mismatched"] == []
