"""The driver-window contract: ``__spark_entry__.queries()`` exposes at
most 50 canonical queries (the driver verifies only the first 50 sorted
names — round-1 lesson), every SURVEY §2 operator tag is represented in
that window, and every canonical output is flat scalars (the driver's
rows-only canonicalizer dies on array/struct cells — the round-1 a08 /
b11_approx_percentile failure).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

from hive_plan_service_spark.plans.registry import (
    CANONICAL,
    all_queries,
    canonical_queries,
)

_OP_TAG = re.compile(r"^[AB]\d+$")


def test_canonical_fits_driver_window():
    assert len(CANONICAL) <= 50
    assert len(set(CANONICAL)) == len(CANONICAL)
    assert set(CANONICAL) <= set(all_queries())


def test_every_operator_tag_is_in_the_window():
    all_tags = {
        t for q in all_queries().values() for t in q.tags if _OP_TAG.match(t)
    }
    canon_tags = {
        t for q in canonical_queries().values() for t in q.tags if _OP_TAG.match(t)
    }
    assert all_tags == canon_tags, (
        f"operator tags with no driver-visible query: {sorted(all_tags - canon_tags)}"
    )


def test_entry_exposes_exactly_the_canonical_tier():
    import __spark_entry__ as e

    qs = e.queries()
    assert set(qs) == set(CANONICAL)
    assert set(e.oracle_sql()) <= set(qs)


@pytest.mark.parametrize("name", sorted(CANONICAL))
def test_canonical_output_is_flat_scalars(spark, sf_dir, name):
    schema = canonical_queries()[name].fn(spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: nested columns {bad} would break the driver canonicalizer"
    # decimals cross the Arrow boundary as Python objects and diverge
    # from DuckDB's double path — registry invariant: cast to DOUBLE
    dec = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
    assert not dec, f"{name}: decimal columns {dec} violate the flat-double invariant"


def _exact_b11_twins(spark):
    return {
        r["o_orderstatus"]: r
        for r in spark.table("orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        )
        .collect()
    }


def test_approx_aggregates_track_exact_values(spark, sf_dir):
    """b11 canonical (portable KMV + histogram) stays near the exact twins.

    KMV with K=1024 has relative σ ≈ 1/√K ≈ 3.1% (exact below K distinct
    keys); the 8192-cent histogram bins bound the quantile error at $40.96.
    Deterministic, so this can only fail loudly on a fixture regen.
    """
    from hive_plan_service_spark.plans.registry import all_queries

    approx = {
        r["o_orderstatus"]: r
        for r in canonical_queries()["b11_approx_aggregates"]
        .fn(spark, sf_dir)
        .collect()
    }
    exact = _exact_b11_twins(spark)
    assert set(approx) == set(exact)
    for status, e in exact.items():
        a = approx[status]
        assert abs(a["n_custs_est"] - e["n_custs"]) <= 0.15 * e["n_custs"] + 5
        assert abs(a["p50_est_cents"] / 100.0 - float(e["p50"])) <= 0.05 * float(e["p50"]) + 41.0
        assert abs(a["p95_est_cents"] / 100.0 - float(e["p95"])) <= 0.05 * float(e["p95"]) + 41.0

    native = {
        r["o_orderstatus"]: r
        for r in all_queries()["b11_approx_aggregates_native"]
        .fn(spark, sf_dir)
        .collect()
    }
    for status, e in exact.items():
        n = native[status]
        assert abs(n["n_custs_approx"] - e["n_custs"]) <= 0.1 * e["n_custs"] + 5
        assert abs(float(n["p50"]) - float(e["p50"])) <= 0.1 * float(e["p50"])
        assert abs(float(n["p95"]) - float(e["p95"])) <= 0.1 * float(e["p95"])
