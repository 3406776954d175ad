"""The local twin of the driver's t2 gate: every registered query vs DuckDB."""

from __future__ import annotations

import pytest

from hive_plan_service_spark.plans.registry import all_queries
from tests.parity import check_query

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    check_query(spark, _QUERIES[name], sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)
