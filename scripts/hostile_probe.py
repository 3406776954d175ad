"""Hostile-content oracle parity sweep over the TPC-H string columns.

tests/test_oracle_parity.py pins full Spark↔DuckDB parity for the
document oracles on hostile content; this probe generalizes the net to
the WHOLE registry: it rewrites every string column of the relational
fixtures (region nation customer supplier part orders lineitem) with a
deterministic pool of hostile values — quotes, backslashes, JSON /
regex / LIKE metacharacters, unicode (CJK, emoji, accents), mixed and
trailing whitespace, literal null/NaN tokens — then runs EVERY oracled
registered query through the driver-grade parity check. Numeric/date
columns (all keys) are untouched, so joins and date logic still
exercise; events/documents/embeddings are symlinked (events' physical
ts type is sniff-contractual — invariant 3; documents has its own
committed pytest net).

Control characters and '/' are deliberately excluded from the pool:
plan titles derive from nation names and the a08 JSON oracle REJECTS
control characters by documented design (ROUND5_NOTES §2), and hostile
partition-column values must stay path-safe for the layout queries.
Quotes and backslashes DO flow through a08 — this probe is the
live-query proof of the §2 escape hardening.

Usage: python scripts/hostile_probe.py   (env SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.001)
Prints one JSON line: {"queries": N, "failures": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from hive_plan_service_spark.plans.registry import all_queries  # noqa: E402
from hive_plan_service_spark.session import get_spark  # noqa: E402
from tests.parity import TABLES, check_query  # noqa: E402

POOL = [
    'He said "hello there" and left',
    "back\\slash C:\\temp\\file paths",
    '{"json": [1, 2], "k": "v\\" q"}',
    "regex meta .* [set]? (group+) {2,3} alt|anchor ^s e$",
    "like meta 100% guaranteed _underscore_",
    "café naïve déjà vu façade",
    "日本語 テスト 🚀 emoji",
    "null NULL NaN None Infinity -0",
    "<b>tags</b> &amp; entities",
    "O'Brien's 'single' quotes; drop table t; --",
    "a,b;c:d-e_f|g",
    "0x1F 42.5e-3 1_000_000",
    # Bare decimal / scientific numerals landing at substr position 10
    # (9-char prefixes): DuckDB TRY_CAST rounds '42.5'→43 and parses
    # '1e3'→1000 where Spark try_cast yields NULL — pins the b21
    # integral-only oracle guard (r5 ADVICE).
    "decimalX 42.5",
    "sciNote#9 1e3",
    "MiXeD CaSe WORDS lower",
    "trailing space ",
    " leading space",
    "multi  space   words\u00a0nbsp",
]

MUTATED = ("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem")

#: --nulls mode: tables whose string columns get every-7th-value NULLed.
#: nation/region are excluded — their names feed the derived `plans`
#: titles, and a NULL title RAISES in a08 by documented design
#: (ROUND5_NOTES §2/§10), which would report an intended guard as a
#: sweep failure.
NULLABLE = ("customer", "supplier", "part", "orders", "lineitem",
            "documents")


def empty_dir(sf_dir: str) -> str:
    """Every table 0-row with its EXACT arrow schema preserved (events'
    physical ts type is sniff-contractual — slice(0,0) keeps it)."""
    out = tempfile.mkdtemp(prefix="hostile_sf_empty_")
    for t in TABLES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), f"{out}/{t}.parquet")
    return out


def hostile_dir(sf_dir: str, *, nulls: bool = False) -> str:
    out = tempfile.mkdtemp(prefix="hostile_sf_")
    mutated = NULLABLE if nulls else MUTATED
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t not in mutated:
            os.symlink(src, dst)
            continue
        tbl = pq.read_table(src)
        cols = []
        for ci, field in enumerate(tbl.schema):
            col = tbl.column(ci)
            if pa.types.is_string(field.type) or pa.types.is_large_string(
                field.type
            ):
                n = len(tbl)
                if nulls:
                    vals = col.to_pylist()
                    col = pa.array(
                        [
                            None if (i + ci) % 7 == 0 else v
                            for i, v in enumerate(vals)
                        ],
                        field.type,
                    )
                else:
                    col = pa.array(
                        [POOL[(i * 7 + ci) % len(POOL)] for i in range(n)],
                        field.type,
                    )
            cols.append(col)
        pq.write_table(
            pa.table(dict(zip(tbl.schema.names, cols))), dst
        )
    return out


def main() -> None:
    nulls = "--nulls" in sys.argv[1:]
    empty = "--empty" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    hostile = empty_dir(sf_dir) if empty else hostile_dir(sf_dir, nulls=nulls)
    spark = get_spark(app_name="hpss-hostile-probe")
    failures = []
    n = 0
    for name, q in sorted(all_queries().items()):
        if not q.oracle:
            continue
        n += 1
        try:
            check_query(spark, q, hostile)
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            failures.append(f"{name}: {str(ex).splitlines()[0][:200]}")
    print(json.dumps({"queries": n, "failures": failures}), flush=True)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
