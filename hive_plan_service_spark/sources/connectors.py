"""Gated external connectors (B1 closure).

JDBC and table-format (Delta/Iceberg/Hudi) sources are part of the
engine's source registry surface, but their jars are not in this image.
Each reader is a thin, *honest* gate: it attempts the real Spark call
and converts the missing-dependency failure into a typed error with the
exact jar/package needed — no fakes, no silent fallbacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    """The connector's runtime dependency is absent in this deployment."""


def read_jdbc(
    spark: SparkSession, url: str, table: str, driver: str | None = None, **options
) -> DataFrame:
    """``spark.read.jdbc`` with a typed error when the driver jar is absent.

    (The reference reads Postgres directly — src/plan-processor.ts:30,45;
    on a cluster this is the equivalent ingest path, typically used once
    to land the data in parquet, after which scans are columnar.)
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        if "ClassNotFoundException" in str(e) or "No suitable driver" in str(e):
            raise ConnectorUnavailable(
                f"JDBC driver missing for {url!r}: add the driver jar "
                "(e.g. org.postgresql:postgresql) to spark.jars.packages"
            ) from e
        raise


def read_table_format(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Delta/Iceberg/Hudi reader, gated on the format's jars."""
    try:
        return spark.read.format(fmt).load(path)
    except Exception as e:
        msg = str(e)
        if "Failed to find" in msg or "ClassNotFoundException" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            packages = {
                "delta": "io.delta:delta-spark_2.13",
                "iceberg": "org.apache.iceberg:iceberg-spark-runtime",
                "hudi": "org.apache.hudi:hudi-spark-bundle",
            }
            raise ConnectorUnavailable(
                f"{fmt} support needs {packages.get(fmt, 'its runtime jar')} "
                "on the classpath (spark.jars.packages)"
            ) from e
        raise
