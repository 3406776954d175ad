"""Skewed-data oracle gate (VERDICT r7 #1 — the untested axis).

Every prior correctness sweep ran on UNIFORM fixtures (the driver
generator draws keys near-uniformly, and the scale probes multiply
distinct content — invariant 23). A real 100 TB corpus is Zipfian:
one customer owns a third of the orders, one domain owns half the
documents, genuinely-duplicated boilerplate forms an LSH bucket far
past the ``max_bucket`` design point. This probe builds a
deterministic skewed COPY of the driver-scale fixtures and re-runs
the driver's own 50-slot DuckDB value-hash gate on it — Spark and the
oracle both read the same skewed parquet, so any failure is a real
divergence the uniform gates could not see (hot-key partial-aggregate
merge order, over-cap bucket handling, top-k ties created by mass
concentration).

Skew applied (index-based, seed-free, so the fixture is a pure
function of the input):

  orders     30% of o_custkey  → the hottest existing customer
  lineitem   30% of l_suppkey  → one supplier (hot reducer for the
             per-supplier aggregates and supplier joins)
  customer   40% of c_nationkey → one nation (hot dim group)
  events     30% of user_id → one user; 50% of event_type → one type
             (hot streaming/session/window groups)
  documents  50% of source → one domain; every 10th doc's text
             REPLACED by shared boilerplate (hot shingle/LSH bucket,
             ~50 docs ≫ per-band bucket uniqueness at this scale);
             n_chars kept consistent with the new text
  embeddings 30% of vectors → one base vector + tiny per-row jitter
             (hot IVF cell / hyperplane-LSH bucket); 50% of labels →
             one label

region/nation/supplier/part keep their original files (nation names
feed the derived ``plans`` titles — a08's payload contract).

Usage: python scripts/skew_probe.py [sf_dir]   (default sf0.01)
Exit 0 iff the full driver gate is green on the skewed fixtures.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

#: long enough that every shingle/n-gram consumer sees a real token
#: stream (the degenerate-corpus guard covers the SHORT case); 12
#: distinct sentences so the hot bucket is one bucket, not many.
BOILERPLATE = " ".join(
    f"boilerplate{i} legal footer common all rights reserved" for i in range(12)
)


def _remap_int(tbl: pa.Table, col: str, num: int, den: int) -> tuple[pa.Table, int, int]:
    """Remap every row with index % den < num to the column's first
    value (an existing key — referential integrity preserved)."""
    vals = tbl.column(col).to_numpy(zero_copy_only=False).copy()
    hot = vals[0]
    mask = (np.arange(len(vals)) % den) < num
    vals[mask] = hot
    idx = tbl.schema.get_field_index(col)
    return (
        tbl.set_column(idx, tbl.schema.field(idx), pa.array(vals, tbl.schema.field(idx).type)),
        int(mask.sum()),
        int(hot),
    )


def _remap_str(tbl: pa.Table, col: str, num: int, den: int) -> tuple[pa.Table, int, str]:
    vals = tbl.column(col).to_pylist()
    hot = vals[0]
    n = 0
    for i in range(len(vals)):
        if i % den < num:
            vals[i] = hot
            n += 1
    idx = tbl.schema.get_field_index(col)
    return (
        tbl.set_column(idx, tbl.schema.field(idx), pa.array(vals, tbl.schema.field(idx).type)),
        n,
        hot,
    )


def build_skewed(sf_dir: str, out_dir: str) -> dict:
    """Write the skewed fixture copy; return the hot-share stats."""
    stats: dict = {}
    from tests.parity import TABLES  # noqa: PLC0415 — repo-root import

    untouched = {"region", "nation", "supplier", "part"}
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t in untouched:
            os.symlink(src, dst)
            continue
        tbl = pq.read_table(src)
        if t == "orders":
            tbl, n, hot = _remap_int(tbl, "o_custkey", 3, 10)
            stats["orders_hot_custkey"] = {"key": hot, "rows": n}
        elif t == "lineitem":
            tbl, n, hot = _remap_int(tbl, "l_suppkey", 3, 10)
            stats["lineitem_hot_suppkey"] = {"key": hot, "rows": n}
        elif t == "customer":
            tbl, n, hot = _remap_int(tbl, "c_nationkey", 4, 10)
            stats["customer_hot_nationkey"] = {"key": hot, "rows": n}
        elif t == "events":
            tbl, n, hot = _remap_int(tbl, "user_id", 3, 10)
            stats["events_hot_user"] = {"key": hot, "rows": n}
            tbl, n, hot_s = _remap_str(tbl, "event_type", 1, 2)
            stats["events_hot_type"] = {"key": hot_s, "rows": n}
        elif t == "documents":
            tbl, n, hot_s = _remap_str(tbl, "source", 1, 2)
            stats["documents_hot_source"] = {"key": hot_s, "rows": n}
            texts = tbl.column("text").to_pylist()
            n_boiler = 0
            for i in range(len(texts)):
                if i % 10 == 0:
                    texts[i] = BOILERPLATE
                    n_boiler += 1
            ti = tbl.schema.get_field_index("text")
            tbl = tbl.set_column(
                ti, tbl.schema.field(ti),
                pa.array(texts, tbl.schema.field(ti).type),
            )
            ci = tbl.schema.get_field_index("n_chars")
            tbl = tbl.set_column(
                ci, tbl.schema.field(ci),
                pa.array([len(s) if s is not None else None for s in texts],
                         tbl.schema.field(ci).type),
            )
            stats["documents_boilerplate"] = {"rows": n_boiler}
        elif t == "embeddings":
            vecs = tbl.column("embedding").to_pylist()
            base = list(vecs[0])
            dim = len(base)
            n_hot = 0
            for i in range(len(vecs)):
                if i % 10 < 3:
                    v = list(base)
                    # tiny deterministic jitter so the hot cell is a
                    # cluster, not byte-identical rows (dedup-by-value
                    # queries must still see distinct vectors)
                    v[i % dim] = np.float32(v[i % dim] + 1e-3 * (1 + i % 7))
                    vecs[i] = v
                    n_hot += 1
            vi = tbl.schema.get_field_index("embedding")
            tbl = tbl.set_column(
                vi, tbl.schema.field(vi),
                pa.array(vecs, tbl.schema.field(vi).type),
            )
            tbl, n, hot_l = _remap_int(tbl, "label", 1, 2)
            stats["embeddings_hot_cell"] = {"rows": n_hot}
            stats["embeddings_hot_label"] = {"key": hot_l, "rows": n}
        pq.write_table(tbl, dst)
    return stats


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = tempfile.mkdtemp(prefix="skew_sf_")
    try:
        stats = build_skewed(sf_dir, out_dir)
        for k, v in stats.items():
            print(f"skew fixture: {k} = {v}", flush=True)
        print("=== driver_sim oracle gate on the skewed dir ===", flush=True)
        return subprocess.call(
            [sys.executable,
             os.path.join(REPO_ROOT, "scripts", "driver_sim.py"), out_dir]
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
