"""Guard for the r8 numfuzz epoch-emission class: Spark's
``unix_timestamp`` / ``CAST(ts AS LONG)`` / integer ``div`` all truncate
toward zero, while the epoch/bucket definition (and DuckDB ``epoch_us //``)
FLOORS — they disagree on every pre-1970 sub-second timestamp (wrong
hour/day bucket, wrong session-start second). The r8 fix routed every
oracle-checked emission through ``functions/exact.py``'s
``epoch_seconds``/``epoch_micros``/``floor_div``; this lint (VERDICT r8
task 6) pins the rule for future operators, the same way
test_locale_guard.py pins option-value casing.

Two checks:

1. Source lint — the token ``unix_timestamp`` may appear ONLY in
   functions/exact.py (where the divergence is documented and the floor
   helpers live). Comment lines are stripped so prose mentions stay legal.
2. Oracle lint — registered DuckDB oracle SQL must never call bare
   ``epoch(``: it returns DOUBLE, which rounds ``.999999`` past the next
   second at year-9999 magnitude (r8 numfuzz find). Only the integer
   ``epoch_us``/``epoch_ms`` forms are allowed.
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hive_plan_service_spark",
)

ALLOWED = {os.path.join("functions", "exact.py")}


def test_unix_timestamp_only_in_exact_py():
    bad: list[str] = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, PKG)
            if rel in ALLOWED:
                continue
            with open(path, encoding="utf-8") as f:
                for i, line in enumerate(f, 1):
                    code = line.split("#", 1)[0]
                    if "unix_timestamp" in code:
                        bad.append(f"{rel}:{i}: {line.strip()}")
    assert not bad, (
        "epoch emission must go through functions/exact.py "
        "(unix_timestamp truncates toward zero; floor is required — "
        "r8 numfuzz class):\n" + "\n".join(bad)
    )


def test_oracles_use_integer_epoch_only():
    from hive_plan_service_spark.plans.registry import all_queries

    # bare epoch( — i.e. not epoch_us( / epoch_ms( and not preceded by
    # an identifier character (so window_start_epoch etc. don't match)
    bare_epoch = re.compile(r"(?<![\w])epoch\s*\(")
    bad: list[str] = []
    for name, q in all_queries().items():
        if not q.oracle:
            continue
        sql = "\n".join(line.split("--", 1)[0] for line in q.oracle.splitlines())
        if bare_epoch.search(sql):
            bad.append(name)
    assert not bad, (
        "oracle SQL must use integer epoch_us()/epoch_ms(), never the "
        "DOUBLE-valued epoch() (rounds at extreme magnitude — r8 "
        "numfuzz find): " + ", ".join(bad)
    )
