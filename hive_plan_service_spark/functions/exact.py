"""Exact (order-independent) numeric aggregation helpers.

Parallel summation of DOUBLE is non-associative: at 100 TB the partial
sums arrive in nondeterministic order, so two runs (or Spark vs. the
DuckDB oracle) disagree in the last ulps. The engine therefore
accumulates money/rate columns as exact DECIMAL and converts to DOUBLE
only at the output boundary — deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c: Column | str) -> Column:
    """Cents-precision DECIMAL view of a money DOUBLE column."""
    return _col(c).cast("decimal(18,2)")


def rate(c: Column | str) -> Column:
    """Small ratio (discount/tax) as DECIMAL(8,4)."""
    return _col(c).cast("decimal(8,4)")


def dsum(c: Column, alias: str) -> Column:
    """Exact decimal sum, emitted as DOUBLE.

    Spark's decimal→double (BigDecimal.doubleValue) is correctly rounded.
    DuckDB's direct decimal→double double-rounds once the scaled int128
    exceeds 2^53, so oracle SQL must spell this as
    ``CAST(CAST(SUM(...) AS VARCHAR) AS DOUBLE)`` — the string path is
    correctly rounded and therefore bit-identical to Spark's.
    """
    return F.sum(c).cast("double").alias(alias)


def davg(c: Column, alias: str) -> Column:
    """Order-independent mean: exact decimal sum / count, as DOUBLE."""
    return (F.sum(c).cast("double") / F.count(c)).alias(alias)


def floor_div(c: Column, divisor: int) -> Column:
    """FLOOR division of a BIGINT column — exact for any sign.

    Spark's ``div`` (and ``CAST(ts AS LONG)``/``unix_timestamp``)
    truncate toward zero, while the epoch/bucketing definition (and
    DuckDB's ``//`` and ``epoch()``) FLOOR — they disagree on every
    negative non-multiple (r8 numfuzz find: 1969-12-31T23:59:59.999999
    bucketed as 0 by Spark and −1 by the oracle). Computed as
    subtract-positive-remainder then integer ``div``: ``col - rem`` is
    an EXACT multiple of the divisor, so truncating int64 division
    equals floor for any operand magnitude — no float path (r9: the
    earlier double-division form was exact only while the numerator
    stayed under 2^53+trailing-zero headroom; pure int64 has no such
    precondition). Domain: |col| must stay below 2^63 − divisor (the
    subtract would overflow at Long.MIN_VALUE + rem and ANSI mode
    throws); every epoch/bucket input is ≤ ~3·10^17 µs, 4 orders of
    magnitude inside the bound.
    """
    col = _col(c)
    rem = ((col % divisor) + divisor) % divisor
    return F.call_function("div", col - rem, F.lit(divisor))


def epoch_micros(c: Column | str) -> Column:
    """Exact BIGINT epoch microseconds of a timestamp column.

    The fixture parquet may surface as TIMESTAMP or TIMESTAMP_NTZ
    depending on the writer's isAdjustedToUTC flag (invariant 3:
    physical types are not contractual) — ``unix_micros`` rejects NTZ,
    so cast first; under the session's pinned UTC zone the NTZ→TS cast
    is instant-preserving and a no-op for TS inputs.
    """
    return F.unix_micros(_col(c).cast("timestamp"))


def epoch_seconds(c: Column | str) -> Column:
    """FLOOR epoch seconds of a timestamp (exact integer arithmetic).

    ``F.unix_timestamp`` truncates sub-second parts toward zero, which
    is wrong (≠ floor) for pre-1970 timestamps; this floors, the
    conventional definition. NOTE the DuckDB oracle twin is NOT the
    bare ``epoch_us(ts) // 1000000`` — DuckDB integer ``//`` ALSO
    truncates toward zero (invariant 7); oracles must use the
    subtract-positive-remainder idiom
    ``(u - ((u % 1000000 + 1000000) % 1000000)) // 1000000``.
    (The oracle side must use ``epoch_us`` too: DuckDB ``epoch()``
    returns DOUBLE, and at year-9999 magnitude .999999 µs round past
    the next second — r8 numfuzz find.)
    """
    return floor_div(epoch_micros(c), 1_000_000)
