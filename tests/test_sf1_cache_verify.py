"""Corrupted-cache injection test for the sf1 fixture cache
(VERDICT r11 #1): the r11 stamp's sf1 gate ran entirely on a cache
hit, so hit integrity is load-bearing evidence. The gate's meta now
carries per-table content fingerprints written at build time
(scripts/sf1_gate.table_fingerprints) and every hit re-scans and
asserts them (verify_cached_fixtures). This test exercises the whole
verify path at test scale: build a mult=2 replica of the sf0.001
fixtures, prove a clean verify passes, flip ONE byte in the middle of
a cached parquet part file, and assert the verify fails LOUDLY
(SystemExit — either a decode error or a fingerprint mismatch,
depending on where inside the compressed page the flip lands; both are
the loud path by design).
"""

from __future__ import annotations

import glob
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)


def test_sf1_cache_fingerprints_detect_corruption(spark, sf_dir, tmp_path):
    import sf1_gate

    out = str(tmp_path / "sf1_cache_probe")
    os.makedirs(out)
    counts = sf1_gate.build_sf1(spark, sf_dir, out, mult=2)
    assert counts["lineitem"] > 0
    meta = {
        "mult": 2,
        "counts": counts,
        "fingerprints": sf1_gate.table_fingerprints(spark, out),
    }

    # clean verify passes (the every-hit path)
    sf1_gate.verify_cached_fixtures(spark, out, meta)

    # a meta without fingerprints (pre-v2 / mangled entry) is loud too
    with pytest.raises(SystemExit, match="no content fingerprints"):
        sf1_gate.verify_cached_fixtures(spark, out, {"counts": counts})

    # flip one byte mid-file in a replicated table's data pages
    part = sorted(
        glob.glob(os.path.join(out, "documents.parquet", "part-*.parquet"))
    )[0]
    with open(part, "rb") as f:
        data = bytearray(f.read())
    data[len(data) // 2] ^= 0xFF
    with open(part, "wb") as f:
        f.write(data)

    with pytest.raises(SystemExit, match="failed content verification"):
        sf1_gate.verify_cached_fixtures(spark, out, meta)
