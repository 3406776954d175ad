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


@pytest.mark.parametrize("name", ["b28_ann_pq", "b28_ann_ivf_kmeans"])
def test_kmeans_queries_survive_partitioning_change(spark, sf_dir, name):
    """The k-means-trained ANN queries must not move when the SESSION's
    default parallelism knobs do — the proxy for running on a
    differently-sized cluster. Since r3 this holds by construction
    (integer-Lloyd trainer, operators/kmeans.py) rather than by a pinned
    training partitioning; the test stays as the regression tripwire."""
    q = all_queries()[name]
    a = canonical_rows(q.fn(spark, sf_dir).toPandas())
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = canonical_rows(q.fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, f"{name} moved with session partitioning"


def test_kmv_histogram_estimator_survives_partitioning_change(spark, sf_dir):
    """The portable approx-aggregate estimators (KMV distinct + histogram
    quantiles) are pure integer rank/threshold arithmetic, so the result
    must be bit-identical at any parallelism — the property that lets the
    DuckDB oracle (a single-threaded engine) recompute them at all."""
    q = all_queries()["b11_approx_aggregates"]
    a = canonical_rows(q.fn(spark, sf_dir).toPandas())
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = canonical_rows(q.fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b, "b11 estimator moved with session partitioning"
