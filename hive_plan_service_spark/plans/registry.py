"""Query/operator registry — the verified inventory of SURVEY.md §2.

Every operator the engine implements registers exactly one named query
here: a PySpark builder ``fn(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB oracle SQL string over the same
parquet fixtures. ``__spark_entry__.py`` exposes this registry to the
driver's correctness harness; the pytest parity suite runs the identical
comparison locally.

Cross-engine determinism rules (every registered query obeys these so the
order-insensitive value hash matches bit-for-bit):

* Aggregate doubles through exact DECIMAL accumulation, cast to DOUBLE
  only at the output — parallel float summation is order-nondeterministic.
* Never bare-cast DOUBLE→integer (Spark truncates, DuckDB rounds):
  use explicit floor/round.
* Output only flat scalar columns in oracle-checked queries; timestamps
  leave as TIMESTAMP only when exactly representable, else epoch BIGINT.
* Alias every computed column identically in builder and oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = ()


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register an operator query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Name → Query, import side effects resolved."""
    import hive_plan_service_spark.plans  # noqa: F401  (populates registry)

    return dict(sorted(_REGISTRY.items()))


def query_fns() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
