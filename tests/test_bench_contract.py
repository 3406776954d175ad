"""The driver parses bench.py's single JSON line — pin its shape."""

from __future__ import annotations

import json

import bench


def test_bench_payload_shape(spark, sf_dir):
    payload = bench.run(
        spark,
        sf_dir,
        names=("b09_agg_pricing_summary", "b04_join_inner_broadcast"),
        calibration_rows=100_000,  # shape check, not a real calibration
    )
    encoded = json.dumps(payload)
    decoded = json.loads(encoded)
    assert set(decoded) == {
        "metric",
        "value",
        "unit",
        "queries",
        "sf",
        "calibration_cpu_sec",
        "calibration_quiet_ref",
        "calibration_pyarrow_sec",
        "calibration_pyarrow_quiet_ref",
        "calibration_cpu_session_min",
        "calibration_pyarrow_session_min",
        "value_normalized",
        "raw_comparison_band",
        "timing_passes",
        "sink",
    }
    # round-over-round comparability rule (VERDICT r9 #1, BASELINE.md):
    # the artifact states the calibration-agreement band under which its
    # RAW total may be compared with another round's
    assert decoded["raw_comparison_band"] == bench.RAW_COMPARISON_BAND
    # calibration v2 (VERDICT r8 #2): the Arrow/py-worker/tmpfs probe is
    # carried in the contract artifact (reported, not normative for the
    # CPU-only contract normalization; extbench normalizes by the
    # composite — see scripts/bench_extended.py)
    assert decoded["calibration_pyarrow_sec"] > 0
    assert (
        decoded["calibration_pyarrow_quiet_ref"] == bench.PYARROW_QUIET_REF
    )
    # ratchet provenance (VERDICT r10 #6): every artifact logs the
    # quietest calibration drawn in its own session next to the
    # ratchet-down refs; the session min can never exceed the single
    # post-timing draw that normalization keys on
    assert 0 < decoded["calibration_cpu_session_min"] <= (
        decoded["calibration_cpu_sec"]
    )
    assert 0 < decoded["calibration_pyarrow_session_min"] <= (
        decoded["calibration_pyarrow_sec"]
    )
    # min-of-2-full-passes rule (VERDICT r7 #6, BASELINE.md): the
    # artifact declares how many complete timing passes fed each
    # per-query minimum, so a judge can see cold-start robustness is
    # structural, not luck
    assert decoded["timing_passes"] == 2
    # full-materialization rule (r8, BASELINE.md): .count() is not a
    # valid sink — Catalyst prunes any operator the count doesn't need
    # (b12's Window node vanished: 0.21 s counted vs 0.91 s real). The
    # noop sink computes every output column of every row.
    assert decoded["sink"] == "noop"
    assert decoded["unit"] == "sec"
    assert isinstance(decoded["value"], (int, float)) and decoded["value"] > 0
    # the box-speed reference must be a real measurement, and must NOT
    # count toward the headline total (it is not a query)
    assert decoded["calibration_cpu_sec"] > 0
    # load-normalization contract (VERDICT r4 #2): normalized never
    # exceeds raw (the factor is capped at 1), and the quiet reference
    # the judge should divide by is carried IN the artifact so
    # round-over-round comparison needs no notes-based attribution
    assert decoded["calibration_quiet_ref"] == bench.CALIBRATION_QUIET_REF
    assert 0 < decoded["value_normalized"] <= decoded["value"] + 1e-9
    # normalization must apply ONLY at the exact 50M-row reference
    # workload: this shrunken probe must report factor 1 (normalized ==
    # raw), not a deflated number computed against an incomparable
    # calibration (r5 review: >= let larger probes deflate normalized)
    assert decoded["value_normalized"] == decoded["value"]
    assert set(decoded["queries"]) == {
        "b09_agg_pricing_summary",
        "b04_join_inner_broadcast",
    }
    assert all(v >= 0 for v in decoded["queries"].values())
    assert abs(sum(decoded["queries"].values()) - decoded["value"]) < 0.01


def test_quiet_ref_ratchet_not_stale():
    """VERDICT r11 #4: the ratchet rule — a quiet-ref constant must be
    updated in the same round a quieter session minimum is observed —
    was remembered, not enforced. Every bench/extbench artifact (r11+)
    carries `calibration_*_session_min` provenance; this test fails BY
    NAME if any checked-in artifact recorded a session minimum quieter
    than the CURRENT constant, naming the artifact to cite when
    ratcheting down. The first artifact recording a quieter window
    lands at stamp / round close, so a stale ref surfaces at the next
    pytest run — enforcement lags the evidence by at most one gate run.
    (Refs unbeaten since r5/r9: cpu 0.427, pyarrow 0.4405.)"""
    import glob
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stale: list[str] = []
    for path in sorted(
        glob.glob(os.path.join(repo, "BENCH_r*.json"))
        + glob.glob(os.path.join(repo, "EXTBENCH_r*.json"))
    ):
        with open(path) as f:
            doc = json.load(f)
        # the driver wraps bench.py's payload under "parsed"
        payload = doc.get("parsed", doc) if isinstance(doc, dict) else {}
        if not isinstance(payload, dict):
            continue
        for field, ref, const in (
            ("calibration_cpu_session_min", bench.CALIBRATION_QUIET_REF,
             "bench.CALIBRATION_QUIET_REF"),
            ("calibration_pyarrow_session_min", bench.PYARROW_QUIET_REF,
             "bench.PYARROW_QUIET_REF"),
        ):
            got = payload.get(field)
            if isinstance(got, (int, float)) and 0 < got < ref:
                stale.append(
                    f"{os.path.basename(path)}: {field}={got} beats "
                    f"{const}={ref}"
                )
    assert not stale, (
        "quiet-ref ratchet is stale — a checked-in artifact observed a "
        "quieter window than the constant; ratchet the constant down in "
        "bench.py citing the artifact:\n" + "\n".join(stale)
    )


def test_raw_comparable_band_semantics():
    """BASELINE.md round-10 rule: raw totals are comparable iff the two
    artifacts' CPU calibrations agree within the pinned band (the capped
    normalized series is asymmetric across box states — r8 6.51 vs r9
    8.32 normalized for flat raw — so cross-round verdicts use raw,
    gated on calibration agreement)."""
    band = bench.RAW_COMPARISON_BAND
    assert band == 0.10
    # symmetric: order of arguments never matters
    assert bench.raw_comparable(0.427, 0.460)   # 7.7% apart — comparable
    assert bench.raw_comparable(0.460, 0.427)
    # the r8/r9 official pair (0.578 vs 0.460, 26% apart) must be
    # flagged NOT comparable — exactly the misread the rule prevents
    assert not bench.raw_comparable(0.578, 0.460)
    assert not bench.raw_comparable(0.460, 0.578)
    # boundary: exactly 1+band is still comparable, just past is not
    assert bench.raw_comparable(1.0, 1.0 + band)
    assert not bench.raw_comparable(1.0, 1.0 + band + 1e-9)
    # degenerate calibrations are never comparable
    assert not bench.raw_comparable(0.0, 0.427)
    assert not bench.raw_comparable(0.427, -1.0)


def test_bench_headline_names_are_registered():
    from hive_plan_service_spark.plans.registry import all_queries

    missing = [n for n in bench.HEADLINE if n not in all_queries()]
    assert not missing, f"bench names drifted from the registry: {missing}"


def test_latest_gates_artifact_covers_every_defined_gate():
    """VERDICT r7 #3: GATES_r07.json held 25 rows while run_gates.py
    defined 30 — gates added late had no checked-in artifact. From r8
    on, the newest GATES_r{N}.json must contain EXACTLY the gate set
    run_gates.py defines (regenerate it as the round's last act).
    Artifacts from r7 and earlier are grandfathered."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = glob.glob(os.path.join(repo, "GATES_r*.json"))
    if not arts:
        return
    latest = max(arts, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    rnd = int(re.search(r"r(\d+)", latest).group(1))
    if rnd <= 7:
        return

    # During a `run_gates --round N` stamp, this pytest run IS one of
    # the gates producing the artifact it would otherwise check — the
    # newest on disk legitimately predates gates added this round. The
    # stamp sets the env var TO THE ROUND NUMBER for its pytest gate
    # only; the exemption is honored only when that value names a round
    # STRICTLY newer than the newest artifact on disk (a normal stamp
    # of round N sees r{N-1} as newest: N > N-1 passes). Strict `>`
    # (r10 ADVICE find): under `>=`, a stale SPARK_GRAFT_GATES_STAMP=N
    # exported in a dev shell kept the pin disarmed throughout round
    # N+1 development, exactly the window the pin protects. The cost:
    # RE-stamping a round whose GATES_rN.json already landed requires
    # deleting that stale artifact first (N > N is false) — the right
    # friction, since a re-stamp supersedes it anyway.
    stamp = os.environ.get("SPARK_GRAFT_GATES_STAMP", "")
    if stamp.isdigit() and int(stamp) > rnd:
        return
    import sys

    sys.path.insert(0, os.path.join(repo, "scripts"))
    from run_gates import GATES

    with open(latest) as f:
        artifact = json.load(f)
    have = set(artifact["gates"])
    defined = set(GATES)
    assert have == defined, (
        f"{os.path.basename(latest)} gate set drifted from run_gates.py: "
        f"missing {sorted(defined - have)}, extra {sorted(have - defined)}"
    )
    assert artifact["ok"], f"{os.path.basename(latest)} is not green"
    # stamp wall budget (VERDICT r10 #3): the matrix has grown every
    # round — per-gate walls live in the artifact (wall_s), and the
    # total is pinned under run_gates.STAMP_WALL_BUDGET_S so gate
    # growth past ~2 h is a conscious constant-raise, not silent creep.
    # Artifacts from r10 and earlier predate the field.
    if rnd >= 11:
        from run_gates import STAMP_WALL_BUDGET_S

        assert artifact["wall_budget_s"] == STAMP_WALL_BUDGET_S
        total = artifact["total_wall_s"]
        assert total <= STAMP_WALL_BUDGET_S, (
            f"{os.path.basename(latest)} matrix wall {total}s exceeds "
            f"the {STAMP_WALL_BUDGET_S}s budget — raise it consciously "
            "or trim gates"
        )
        walls = {g: r["wall_s"] for g, r in artifact["gates"].items()}
        assert all(isinstance(w, (int, float)) for w in walls.values())
