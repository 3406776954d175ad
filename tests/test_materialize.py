"""Materialized-view layer: build-on-read, staleness skip, change detection."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from hive_plan_service_spark.sources.catalog import register_tables
from hive_plan_service_spark.sources.materialize import MaterializedView


def test_materialized_view_lifecycle(spark, sf_dir, tmp_path):
    register_tables(spark, sf_dir)
    src = str(tmp_path / "src")
    spark.table("orders").limit(100).write.parquet(src)

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return (
            spark.read.parquet(src)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    mv = MaterializedView(spark, "orders_by_status", build, [src], str(tmp_path))

    first = {(r["o_orderstatus"], r["n"]) for r in mv.read().collect()}
    assert calls["n"] == 1
    direct = {
        (r["o_orderstatus"], r["n"])
        for r in build().collect()
    }
    calls["n"] -= 1  # the comparison build above doesn't count
    assert first == direct

    # unchanged inputs → read() skips the rebuild
    mv.read().count()
    assert calls["n"] == 1

    # touch the source → stale → rebuilt exactly once
    time.sleep(0.01)
    part = next(p for p in os.listdir(src) if p.endswith(".parquet"))
    os.utime(os.path.join(src, part))
    mv.read().count()
    assert calls["n"] == 2


def test_skewed_join_correctness(spark, sf_dir):
    """90%-hot-key join: salted result == plain result (AQE or not)."""
    from hive_plan_service_spark.operators.joins import salted_join

    register_tables(spark, sf_dir)
    li = spark.table("lineitem").withColumn(
        "skew_key",
        F.when(F.col("l_linenumber") > 1, F.lit(0)).otherwise(F.col("l_orderkey")),
    ).select("skew_key", "l_quantity")
    dim = spark.table("orders").select(
        F.col("o_orderkey").alias("skew_key"), "o_totalprice"
    )
    plain = li.join(dim, "skew_key")
    salted = salted_join(li, dim, "skew_key", salt=16)
    assert plain.count() == salted.count()


def test_ansi_mode_overflow_raises(spark, sf_dir):
    """ANSI mode is on: arithmetic overflow errors instead of wrapping."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    register_tables(spark, sf_dir)
    with _pytest.raises((ArithmeticException, Py4JJavaError, Exception)) as ei:
        spark.sql(
            "SELECT CAST(9223372036854775807 AS BIGINT) + CAST(1 AS BIGINT)"
        ).collect()
    assert "overflow" in str(ei.value).lower() or "ARITHMETIC" in str(ei.value)


def test_gated_connectors_fail_typed(spark):
    """Absent jars surface as ConnectorUnavailable with the fix named."""
    import pytest as _pytest

    from hive_plan_service_spark.sources.connectors import (
        ConnectorUnavailable,
        read_table_format,
    )

    with _pytest.raises(ConnectorUnavailable) as ei:
        read_table_format(spark, "delta", "/tmp/nonexistent_delta").collect()
    assert "delta" in str(ei.value)
