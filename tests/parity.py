"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs a registered query's DataFrame builder and its oracle SQL over the
same parquet fixtures and compares row count, schema shape, and an
order-insensitive canonical row multiset — strictly (floats bit-exact),
because the engine is designed to be deterministic cross-engine.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    import os

    con = duckdb.connect()
    try:
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            # a fixture table may be a DIRECTORY of part files (the
            # latefuzz probe splits events into micro-batch files, r9);
            # DuckDB needs an explicit glob where Spark reads the dir
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0:  # numpy array
        return tuple(_canon_value(x) for x in v)
    if hasattr(v, "asDict"):  # pyspark Row (nested struct)
        return tuple(sorted((k, _canon_value(x)) for k, x in v.asDict().items()))
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, bool):
        return v
    return v


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            try:
                if v is not None and not isinstance(v, (list, tuple, bytes)) and pd.isna(v):
                    v = None
            except (TypeError, ValueError):
                pass
            vals.append(_canon_value(v))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = canonical_rows(spark_pdf)
    d_rows = canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")


def check_query(spark, query, sf_dir: str) -> None:
    sdf = query.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if query.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only: must run and be well-formed
        return
    duck_pdf = run_oracle(query.oracle, sf_dir)
    compare_frames(spark_pdf, duck_pdf, name=query.name)
