"""Guard for the r7 locale-gate find: Spark's per-write option path
upper-cases ``partitionOverwriteMode`` with the JVM DEFAULT locale
(InsertIntoHadoopFsRelationCommand.scala:68 — ``withName(toUpperCase)``
without ``Locale.ROOT``), so a lowercase "dynamic" becomes "DYNAMİC"
under tr_TR and every epoch-partitioned streaming sink dies. The fix is
to pass the value pre-uppercased; this lint keeps future sites honest.
The live certification is the ``locale`` gate (scripts/run_gates.py):
the full canonical sweep under a Turkish JVM locale + LC_ALL=C.
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "hive_plan_service_spark")


def test_partition_overwrite_mode_values_are_pre_uppercased():
    pat = re.compile(r"""["']partitionOverwriteMode["']\s*,\s*["']([^"']+)["']""")
    bad: list[str] = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path, encoding="utf-8") as f:
                for i, line in enumerate(f, 1):
                    m = pat.search(line)
                    if m and m.group(1) not in ("DYNAMIC", "STATIC"):
                        bad.append(f"{path}:{i}: {m.group(1)!r}")
    assert not bad, (
        "partitionOverwriteMode option values must be pre-uppercased "
        "(Turkish-locale JVM trap, r7 locale gate):\n" + "\n".join(bad)
    )
