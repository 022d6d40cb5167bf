"""Local replica of the driver's DuckDB-oracle differential check.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, normalizes both results (column-name sort, row sort, float
rounding, timestamp → UTC-naive), and compares values. Mirrors the
driver's row-count + schema + order-insensitive value comparison so
oracle drift is caught at sf0.001 in seconds instead of at round
verification.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import pandas as pd

from nyc_taxi_etl_pyspark_spark.sources.tables import TABLES


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _normalize_cell(v.item())
    return v


def normalize_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_normalize_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _kind(dtype) -> str:
    """Collapse a pandas dtype to a comparison kind. Integer-vs-float
    matters: DuckDB ``sum(INTEGER)`` returns HUGEINT, which pandas widens
    to float64 (``2004.0``) while Spark emits int64 (``2004``) — tuple
    equality treats them as equal but a value HASH does not (the exact
    failure signature of q_winsorize in CORRECTNESS_r02: rows ✓ schema ✓
    hash ✗). Oracle SQL must CAST integer sums to BIGINT."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    spark_pd = spark_df.toPandas()
    if sorted(spark_pd.columns) != sorted(oracle_df.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(spark_pd.columns)} "
            f"oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_pd) != len(oracle_df):
        problems.append(
            f"{name}: row count spark={len(spark_pd)} oracle={len(oracle_df)}"
        )
        return problems
    for c in spark_pd.columns:
        sk, ok = _kind(spark_pd[c].dtype), _kind(oracle_df[c].dtype)
        if sk != ok and "other" not in (sk, ok):
            problems.append(
                f"{name}: dtype-kind mismatch on '{c}': spark={sk} "
                f"({spark_pd[c].dtype}) oracle={ok} ({oracle_df[c].dtype}) "
                "— numerically equal values hash differently; CAST the "
                "oracle expression (e.g. AS BIGINT)"
            )
    s_rows = normalize_frame(spark_pd)
    o_rows = normalize_frame(oracle_df)
    if s_rows != o_rows:
        diffs = [
            (i, s, o) for i, (s, o) in enumerate(zip(s_rows, o_rows)) if s != o
        ][:5]
        problems.append(f"{name}: value mismatch, first diffs: {diffs}")
    return problems
