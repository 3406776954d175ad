"""Fixture physical types are NOT contractual (CLAUDE.md invariant 3).

The driver regenerates the parquet fixtures every round, and the
``events.ts`` physical type has already flipped once (round 2:
TIMESTAMP(NANOS) → timestamp[µs], silently scaling every streaming
timestamp 1000×). Every fixture reader therefore branches on the
OBSERVED dtype (sources/catalog.py, streaming/source.py) — but the
fixture on disk only ever exercises one branch per round. This test
rewrites ``events`` under the *other* physical type and asserts both
generations produce identical results through the batch catalog AND
the streaming source, so a future regen can't land on an untested
branch.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_plan_service_spark.sources.catalog import TABLES, register_tables, table_path

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def flipped_sf_dir(tmp_path_factory):
    """A fixture dir identical to SF_DIR except events.ts carries the
    OTHER physical type (µs ↔ ns). Non-events tables are symlinked."""
    src_events = table_path(SF_DIR, "events")
    t = pq.read_table(src_events)
    cur = t.schema.field("ts").type
    target = pa.timestamp("ns") if cur == pa.timestamp("us") else pa.timestamp("us")
    i = t.schema.get_field_index("ts")
    flipped = t.set_column(i, pa.field("ts", target), t.column("ts").cast(target))

    out = tmp_path_factory.mktemp("sf_flipped")
    for name in TABLES:
        dst = str(out / f"{name}.parquet")
        if name == "events":
            pq.write_table(flipped, dst)
        else:
            os.symlink(table_path(SF_DIR, name), dst)
    return str(out)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_flipped_events_dtype_reads_differently_but_means_the_same(spark, flipped_sf_dir):
    # Sanity: the rewrite actually changed the physical type Spark sees
    # (under nanosAsLong one generation arrives as bigint, the other as
    # timestamp) — otherwise this test isn't covering the dormant branch.
    raw_a = dict(spark.read.parquet(table_path(SF_DIR, "events")).dtypes)["ts"]
    raw_b = dict(spark.read.parquet(table_path(flipped_sf_dir, "events")).dtypes)["ts"]
    assert raw_a != raw_b
    # NANOS → bigint (nanosAsLong); µs → timestamp_ntz (isAdjustedToUTC
    # false in the fixture footer) or timestamp depending on writer.
    assert "bigint" in {raw_a, raw_b}
    assert ({raw_a, raw_b} - {"bigint"}) <= {"timestamp", "timestamp_ntz"}


@pytest.mark.parametrize(
    "query_name",
    [
        "a09_counter_deltas",  # batch catalog path (derived counter_events view)
        "b17_datetime_functions",  # batch catalog path (direct ts arithmetic)
        "b22_stream_tumbling_window",  # streaming source path (schema sniff)
    ],
)
def test_event_queries_agree_across_physical_types(spark, flipped_sf_dir, query_name):
    from hive_plan_service_spark.plans.registry import all_queries

    q = all_queries()[query_name]
    register_tables(spark, SF_DIR, force=True)
    expected = _rows(q.fn(spark, SF_DIR))
    register_tables(spark, flipped_sf_dir, force=True)
    got = _rows(q.fn(spark, flipped_sf_dir))
    assert got == expected
    assert len(got) > 0


def test_ts_sniff_cache_invalidates_on_rewrite(tmp_path):
    """The footer-sniff cache keys on (realpath, mtime, size): a fixture
    regenerated IN PLACE under the other physical type must re-sniff,
    not serve the stale answer (invariant 3 — physical types are not
    contractual and the driver rewrites testdata every round)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_plan_service_spark.sources.catalog import events_ts_is_long

    p = str(tmp_path / "events.parquet")
    us = pa.table({"ts": pa.array([1, 2], type=pa.timestamp("us"))})
    pq.write_table(us, p)
    assert events_ts_is_long(p) is False  # µs → real timestamp

    time.sleep(0.01)  # ensure a distinct mtime even on coarse clocks
    ns = pa.table({"ts": pa.array([1, 2], type=pa.timestamp("ns"))})
    pq.write_table(ns, p)
    os.utime(p)  # belt and braces: force an mtime bump
    assert events_ts_is_long(p) is True  # INT64/NANOS → LongType


def test_ts_sniff_treats_integer_annotation_as_long(tmp_path):
    """An INT64 with a non-Timestamp logical annotation (e.g. a writer
    that stamps Int(bitWidth=64)) reads as a numeric in Spark, never a
    timestamp — the sniff must classify by 'is it an annotated micro/ms
    Timestamp' (the only INT64 Spark surfaces as a timestamp), not by
    'is the annotation empty' (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_plan_service_spark.sources.catalog import events_ts_is_long

    p = str(tmp_path / "events.parquet")
    annotated = pa.table({"ts": pa.array([1, 2], type=pa.uint64())})
    pq.write_table(annotated, p)  # footer: INT64 + Int(bitWidth=64,...)
    assert events_ts_is_long(p) is True

    p2 = str(tmp_path / "events_ms.parquet")
    ms = pa.table({"ts": pa.array([1, 2], type=pa.timestamp("ms"))})
    pq.write_table(ms, p2)  # Timestamp(milliseconds) → real timestamp
    assert events_ts_is_long(p2) is False


def test_ts_sniff_directory_uses_newest_file(tmp_path):
    """A replay dir assembled from two fixture generations is declared
    by its NEWEST file (the generation still being appended), not by
    whichever old file sorts first lexicographically (ADVICE r4)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_plan_service_spark.sources.catalog import events_ts_is_long

    d = tmp_path / "feed"
    d.mkdir()
    old = str(d / "a_old_generation.parquet")  # sorts FIRST
    pq.write_table(
        pa.table({"ts": pa.array([1, 2], type=pa.timestamp("us"))}), old
    )
    time.sleep(0.01)
    new = str(d / "z_new_generation.parquet")  # newest mtime
    pq.write_table(
        pa.table({"ts": pa.array([1, 2], type=pa.timestamp("ns"))}), new
    )
    os.utime(new)
    assert events_ts_is_long(str(d)) is True  # ns generation wins


def test_ts_sniff_fails_fast_on_empty_dir(tmp_path):
    """An empty feed directory is a caller error at stream setup — the
    sniff must raise (like the old spark.read-based one), not guess a
    schema and defer the failure to the first mid-stream micro-batch."""
    import pytest

    from hive_plan_service_spark.sources.catalog import events_ts_is_long

    d = tmp_path / "feed"
    d.mkdir()
    with pytest.raises(FileNotFoundError):
        events_ts_is_long(str(d))
