"""Guard for the r7 cross-process scratch race: ``scratch_root()`` is
machine-shared (``/dev/shm/hpss_scratch``), so any FIXED-name subdir
written with ``mode("overwrite")`` races with a concurrent suite — one
process's committer deletes files the other's read job already listed
(FAILED_READ_FILE.FILE_NOT_EXIST / UNABLE_TO_INFER_SCHEMA /
TASK_WRITE_FAILED; the "transient 49/50" class, reproduced 25/25 on
the old fixed paths with two racing processes). Engine code must reach
scratch through ``session.process_scratch_dir`` (PID-keyed, stable
within a process) or a per-call ``mkdtemp``/uuid dir — never by
joining a literal name onto ``scratch_root()``. The live
certification is scripts/roworder_probe.py + the cores7 gate, both of
which historically flaked only when suites shared the box.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "hive_plan_service_spark")


def test_no_fixed_paths_joined_onto_shared_scratch_root():
    # session.py defines scratch_root/process_scratch_dir and may join
    # onto it (the jvmtmp layout is intentionally process-shared).
    pat = re.compile(r"os\.path\.join\(\s*scratch_root\(\)")
    bad: list[str] = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py") or fn == "session.py":
                continue
            path = os.path.join(root, fn)
            with open(path, encoding="utf-8") as f:
                for i, line in enumerate(f, 1):
                    if pat.search(line):
                        bad.append(f"{path}:{i}: {line.strip()}")
    assert not bad, (
        "fixed paths joined onto the machine-shared scratch_root() race "
        "across processes — use session.process_scratch_dir(name) or "
        "mkdtemp(dir=scratch_root()):\n" + "\n".join(bad)
    )


def test_process_scratch_dir_is_pid_keyed_and_stable():
    from hive_plan_service_spark.session import process_scratch_dir, scratch_root

    d1 = process_scratch_dir("guard_probe")
    d2 = process_scratch_dir("guard_probe")
    assert d1 == d2, "must be stable within one process (overwrite semantics)"
    assert d1.startswith(scratch_root() + os.sep)
    assert d1.endswith(f"_pid{os.getpid()}"), d1
    assert os.path.isdir(d1)
