"""Join strategy utilities for scale (SURVEY.md §2.B B4 hardening).

Two shuffle-elimination/skew tools Catalyst does not apply on its own:

* **bucketed co-location** — persist both join sides bucketed by the join
  key; later equi-joins read bucket-aligned files and skip the shuffle
  entirely (the 100 TB answer for repeatedly-joined fact tables).
* **salted join** — when one side's key distribution is heavily skewed
  and AQE's skew splitting isn't available (e.g. non-AQE paths, stream
  joins), explode the build side over a salt domain and spread the probe
  side's hot keys across it. Result is identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table keyed for joins."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a fresh in-memory catalog doesn't know about a previous run's files
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two same-bucketed tables — shuffle-free by construction."""
    return spark.table(left_table).join(spark.table(right_table), key)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side.

    The right side is replicated ``salt`` times — keep it the smaller
    side. Rows pair exactly once: left salt = hash(whole row) mod salt,
    right carries every salt value. Only left-preserving join types are
    allowed: an unmatched RIGHT row exists once per salt value, so
    ``right``/``full`` would emit it ``salt`` times — not identical to
    the plain join.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}; "
            f"got {how!r} — unmatched right rows would duplicate per salt"
        )
    lcols, rcols = left.columns, [c for c in right.columns if c != key]
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt))
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = l.join(r, [key, "_salt"], how)
    return joined.drop("_salt")
