"""Rows-only queries (no SQL oracle) must still be run-to-run deterministic:
the driver's weaker check and any cross-round comparison depend on it.
"""

from __future__ import annotations

import pytest

from hive_plan_service_spark.plans.registry import all_queries
from tests.parity import canonical_rows

_ROWS_ONLY = sorted(n for n, q in all_queries().items() if q.oracle is None)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_is_deterministic(spark, sf_dir, name):
    q = all_queries()[name]
    a = canonical_rows(q.fn(spark, sf_dir).toPandas())
    b = canonical_rows(q.fn(spark, sf_dir).toPandas())
    assert a == b, f"{name} differs across identical runs"
