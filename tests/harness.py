"""Local replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle on the same parquet tables and
compares row count, column names, and an order-insensitive value hash —
so we catch any cross-engine divergence before the driver does.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

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


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v: object) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    rows = [
        "\x1f".join(_norm_cell(r[c]) for c in cols) for _, r in df[cols].iterrows()
    ]
    return sorted(rows)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        problems.append(f"values differ; spark-only sample={diff_a} duck-only sample={diff_b}")
    return problems


def run_case(spark, sf_dir: str, spark_fn, sql: str | None) -> list[str]:
    sdf = spark_fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if sql is None:
        return [] if len(spark_pdf) >= 0 else ["spark query failed"]
    con = duck_connect(sf_dir)
    try:
        duck_pdf = con.execute(sql).fetchdf()
    finally:
        con.close()
    return compare(spark_pdf, duck_pdf)
