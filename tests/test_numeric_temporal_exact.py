"""Pins for the r8 numeric/temporal exactness layer.

Three groups:
1. functions/exact.py's floor-semantics helpers (epoch_seconds /
   floor_div / epoch_micros) against Python's floor division on the
   edge values the numfuzz gate injects — including the pre-1970
   sub-second timestamps where Spark's own unix_timestamp/div
   TRUNCATE toward zero (the r8 divergence class).
2. The numfuzz pools' domain invariants: each pool must stay inside
   the column domain it mutates (money → DECIMAL(18,2), rate →
   DECIMAL(8,4), events.value → int64 micro-quantizable), so the gate
   keeps probing hostile-but-in-contract values rather than
   domain-violating ones (a ±1e300 event value correctly crashes BOTH
   engines' exact sums — that is the domain boundary, not a bug).
3. The DuckDB-side emulations the oracles rely on, exercised directly:
   guarded-VARCHAR double→decimal (exact where DuckDB's native cast
   scales in double and drifts past ~2^46/10^s) and the
   subtract-remainder floor-div (DuckDB integer // truncates).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from hive_plan_service_spark.functions.exact import (
    epoch_micros,
    epoch_seconds,
    floor_div,
)
from scripts.hostile_probe import (
    INT64_POOL,
    MONEY_POOL,
    RATE_POOL,
    TS_POOL,
    VALUE_POOL,
)

EDGE_TS = [
    dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
    dt.datetime(1970, 1, 1),
    dt.datetime(1969, 12, 31, 23, 59, 59, 1),
    dt.datetime(1900, 1, 1),
    dt.datetime(9999, 12, 31, 23, 59, 59, 999999),
    dt.datetime(2024, 6, 1, 12, 34, 56, 789012),
] + TS_POOL


def test_epoch_seconds_floors_not_truncates(spark):
    df = spark.createDataFrame([(t,) for t in EDGE_TS], "ts timestamp")
    got = {
        r["ts"]: (r["es"], r["um"])
        for r in df.select(
            "ts",
            epoch_seconds("ts").alias("es"),
            epoch_micros("ts").alias("um"),
        ).collect()
    }
    epoch = dt.datetime(1970, 1, 1)
    for t in EDGE_TS:
        us = round((t - epoch).total_seconds() * 1e6)
        us = (t - epoch) // dt.timedelta(microseconds=1)  # exact integer
        assert got[t][1] == us, t
        assert got[t][0] == us // 1_000_000, (t, got[t][0], us // 1_000_000)


def test_floor_div_matches_python(spark):
    vals = [-1, 1, 0, -999_999, -1_000_000, -1_000_001, 999_999,
            2**53 + 1, -(2**53) - 1, 253_402_300_799_999_999]
    df = spark.createDataFrame([(v,) for v in vals], "x bigint")
    for d in (86_400, 1_000_000, 3_600_000_000):
        got = {
            r["x"]: r["q"]
            for r in df.select("x", floor_div(F.col("x"), d).alias("q")).collect()
        }
        for v in vals:
            assert got[v] == v // d, (v, d, got[v], v // d)


def test_pool_domains():
    for v in MONEY_POOL:
        assert abs(v) < 10**16, f"money pool {v} exceeds DECIMAL(18,2)"
        assert math.isfinite(v)
    for v in RATE_POOL:
        assert abs(v) < 10**4, f"rate pool {v} exceeds DECIMAL(8,4)"
    for v in VALUE_POOL:
        # micro-quantization domain: |v| * 1e6 must fit int64
        assert abs(v) * 1_000_000 < 2**63, f"value pool {v} not int64-µ-safe"
    for v in INT64_POOL:
        assert -(2**63) <= v <= 2**63 - 1


def test_duckdb_guarded_varchar_decimal_cast_matches_spark(spark):
    """The oracle emulation for double→DECIMAL(p,s): exact vs Spark's
    BigDecimal HALF_UP on every pool value (DuckDB's native cast is
    wrong past ~2^46/10^s; the bare VARCHAR path turns subnormals into
    ±0.01 — the abs-guard handles them)."""
    d = duckdb.connect()
    df = spark.createDataFrame([(v,) for v in MONEY_POOL], "x double")
    srows = {
        r["x"]: r["s"]
        for r in df.select(
            "x", F.col("x").cast("decimal(19,2)").cast("string").alias("s")
        ).collect()
    }
    for v in MONEY_POOL:
        duck = d.execute(
            "SELECT CAST((CASE WHEN abs(x) < 0.005 THEN CAST(0 AS DECIMAL(19,2)) "
            "ELSE CAST(CAST(x AS VARCHAR) AS DECIMAL(19,2)) END) AS VARCHAR) "
            "FROM (SELECT CAST(? AS DOUBLE) AS x)",
            [v],
        ).fetchone()[0]
        spark_s = srows[v]
        # string forms may differ in sign of zero only ('0.00' both)
        assert duck == spark_s, (v, duck, spark_s)


def test_duckdb_integer_floordiv_emulation():
    d = duckdb.connect()
    for x in (-1, -999_999, -1_000_000, -1_000_001, 1, 999_999, 0,
              253_402_300_799_999_999, -(2**53) - 1):
        for div in (1_000_000, 86_400_000_000):
            got = d.execute(
                f"SELECT (x - ((x % {div} + {div}) % {div})) // {div} "
                "FROM (SELECT ?::BIGINT AS x)",
                [x],
            ).fetchone()[0]
            assert got == x // div, (x, div, got)


@pytest.mark.parametrize("ntz", [True, False])
def test_epoch_micros_accepts_both_timestamp_flavors(spark, ntz):
    """Fixture parquet surfaces as TIMESTAMP or TIMESTAMP_NTZ depending
    on the writer (invariant 3) — epoch_micros must take both."""
    t = dt.datetime(1969, 12, 31, 23, 59, 59, 999999)
    df = spark.createDataFrame(
        [(t,)], f"ts timestamp{'_ntz' if ntz else ''}"
    )
    assert df.select(epoch_micros("ts").alias("u")).collect()[0]["u"] == -1
