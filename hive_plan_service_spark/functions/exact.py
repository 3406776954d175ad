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
