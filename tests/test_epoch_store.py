"""Property tests for the epoch-store read rule (streaming/epoch_store.py).

The crash-safety argument for both streaming maintainers reduces to one
pure function: given any set of partition values on disk — raw epochs,
any number of bases from current or stale compactions, in any crash
state — ``live_epochs`` must select a set whose multiset-union of
covered epochs equals exactly "every raw epoch ever staged, once".
These tests model that algebra directly (no Spark needed).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hive_plan_service_spark.streaming import epoch_store


def test_base_epoch_coverage_roundtrip():
    for e in [0, 1, 7, 123456]:
        assert epoch_store.coverage(epoch_store.base_epoch(e)) == e
        assert epoch_store.base_epoch(e) < 0


@given(st.lists(st.integers(min_value=0, max_value=200), unique=True))
def test_live_epochs_no_bases_keeps_all_raws(raws):
    base, live = epoch_store.live_epochs(list(raws))
    assert base is None
    assert live == sorted(raws)


@st.composite
def _crash_states(draw):
    """Simulate a maintainer history: epochs 0..n-1 staged in order, a
    compaction possibly ran at some subset of epochs (each folding
    everything <= that epoch into a base), GC may have partially or fully
    failed — so ANY subset of superseded raws/bases may still be on disk.
    Returns (dir_values, n) where correctness demands the selection
    cover exactly raw epochs (cov_max, n) beyond the newest base."""
    n = draw(st.integers(min_value=1, max_value=50))
    compactions = draw(
        st.lists(st.integers(min_value=0, max_value=n - 1), unique=True)
    )
    values = set()
    # newest base always present once written; stale things linger per GC luck
    for e in range(n):
        values.add(e)
    for c in compactions:
        values.add(epoch_store.base_epoch(c))
    # partial GC: drop any subset of values that a completed GC would have
    # deleted (raws <= max compaction, bases older than the newest)
    if compactions:
        newest = max(compactions)
        deletable = {v for v in values if 0 <= v <= newest} | {
            epoch_store.base_epoch(c) for c in compactions if c != newest
        }
        doomed = draw(st.sets(st.sampled_from(sorted(deletable)))) if deletable else set()
        values -= doomed
    return sorted(values), n, (max(compactions) if compactions else None)


@given(_crash_states())
@settings(max_examples=300)
def test_live_epochs_selection_is_exactly_once(state):
    """Newest base + raws beyond its coverage ⇒ every staged epoch is
    represented exactly once, in every reachable crash/GC state."""
    values, n, newest_compaction = state
    base, live = epoch_store.live_epochs(values)
    if newest_compaction is None:
        assert base is None
        covered = set(live)
    else:
        assert base == epoch_store.base_epoch(newest_compaction)
        covered = set(range(newest_compaction + 1)) | set(live)
        assert all(v > newest_compaction for v in live)
    assert covered == set(range(n)), (values, base, live)


def test_live_epochs_high_epoch_count_longevity():
    """Long-lived store (r5 VERDICT #6): 2,000 epochs, compaction every
    8th epoch (250 bases), GC lazy enough that EVERY superseded base and
    half the folded raws still linger. The read rule must still pick the
    newest base + exactly the raws beyond its coverage — and stay O(n)
    driver-side arithmetic (directory values in, ints out).

    The 200-epoch Spark-backed twin (scripts/epoch_longevity_probe.py)
    checks the same rule against real parquet with truth recomputes;
    this pins the pure algebra at 10× that history length.
    """
    n = 2000
    compactions = list(range(7, n, 8))  # 7, 15, ..., 1999
    newest = max(compactions)
    values = set(range(n)) | {epoch_store.base_epoch(c) for c in compactions}
    # lazy GC: drop only every other folded raw; keep all stale bases
    values -= {e for e in range(0, newest + 1, 2)}
    base, live = epoch_store.live_epochs(sorted(values))
    assert base == epoch_store.base_epoch(newest)
    assert live == list(range(newest + 1, n))
    assert set(range(newest + 1)) | set(live) == set(range(n))


def test_live_epochs_exhaustive_small_histories():
    """EXHAUSTIVE check for n ≤ 6: every compaction subset × every
    partial-GC state. The read rule has no size-dependent branches, so
    small-history exhaustion plus the sampled property above covers the
    algebra end to end (~17k states, pure Python)."""
    from itertools import chain, combinations

    def subsets(xs):
        return chain.from_iterable(combinations(xs, r) for r in range(len(xs) + 1))

    checked = 0
    for n in range(1, 7):
        for compactions in subsets(range(n)):
            values = set(range(n)) | {
                epoch_store.base_epoch(c) for c in compactions
            }
            if compactions:
                newest = max(compactions)
                deletable = sorted(
                    {v for v in values if 0 <= v <= newest}
                    | {
                        epoch_store.base_epoch(c)
                        for c in compactions
                        if c != newest
                    }
                )
            else:
                newest, deletable = None, []
            for doomed in subsets(deletable):
                state = sorted(values - set(doomed))
                base, live = epoch_store.live_epochs(state)
                if newest is None:
                    assert base is None
                    covered = set(live)
                else:
                    assert base == epoch_store.base_epoch(newest)
                    assert all(v > newest for v in live)
                    covered = set(range(newest + 1)) | set(live)
                assert covered == set(range(n)), (state, base, live)
                checked += 1
    assert checked > 5000  # sanity: the sweep actually enumerated
