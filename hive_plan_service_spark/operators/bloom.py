"""Approximate-membership pre-filter (Bloom-style) for shuffle reduction.

The 100 TB join problem: a fact-side shuffle moves every row, even the
ones no dim key will ever match. Engines solve it with runtime bloom
filters (Spark's own InjectRuntimeFilter does this below the API when
thresholds allow). This operator is the explicit, plan-visible form: a
fixed-width position set built from the key side (k hashes into m bits),
broadcast as ONE row, and applied to the fact scan *before* the join
shuffle — rows that can't match never enter the exchange. The final
join stays exact (the filter only passes a superset), so correctness is
oracle-checkable while the plan carries the pre-filter.

Design points:
- positions are ``pmod(xxhash64(key, seed_i), m)`` — deterministic,
  JVM-side, no Python;
- the collected structure is an ``array_sort(collect_set(pos))`` of at
  most m BIGINTs: size is bounded by the filter width, NOT the key
  cardinality, so the broadcast is fixed-size (CLAUDE.md invariant 9
  allows the hint);
- probe is k ``array_contains`` lookups per fact row inside codegen.

False-positive rate follows the standard bloom bound
``(1 - e^(-k·n/m))^k``; choose m ≈ 8–16 bits/key. A packed bitmask
(m/64 longs with shiftleft/bit_or) would shrink the broadcast 64× at the
cost of readability; the position-set form keeps the same asymptotics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default filter width (bits) and hash count.
DEFAULT_M = 1 << 16
DEFAULT_K = 3


def _positions(key: Column, m: int, k: int) -> list[Column]:
    # xxhash64(key, i): the literal second argument varies the hash per
    # round — k independent position streams from one JVM hash family
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)]


def bloom_build(
    keys: DataFrame, key_col: str, *, m: int = DEFAULT_M, k: int = DEFAULT_K
) -> DataFrame:
    """1-row DataFrame holding the set positions for ``keys[key_col]``.

    Map-side partial ``collect_set`` keeps the shuffle at one row per
    partition (each ≤ m positions); the final array is sorted for
    deterministic output.
    """
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m, k))).alias("p")
    )
    return pos.agg(F.array_sort(F.collect_set("p")).alias("bloom_bits"))


def bloom_prefilter(
    fact: DataFrame,
    key_col: str,
    bits: DataFrame,
    *,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of ``fact`` whose key passes the filter (superset of matches).

    The 1-row ``bits`` relation is broadcast (fixed-size by construction)
    and every probe stays in whole-stage codegen.
    """
    probed = fact.crossJoin(F.broadcast(bits))
    cond = reduce(
        Column.__and__,
        [
            F.array_contains(F.col("bloom_bits"), p)
            for p in _positions(F.col(key_col), m, k)
        ],
    )
    return probed.filter(cond).drop("bloom_bits")
