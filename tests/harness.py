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
    # Defensive against a memory-pressured box (round 4: 18 oracle
    # OutOfMemoryExceptions on the driver, allocations as small as 2 KiB):
    # cap DuckDB's budget well below free RAM and give it a disk spill
    # directory so heavy oracles (recursive CTEs, wide sorts) spill
    # instead of dying. Never lets one oracle's peak poison the next.
    spill = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".duckdb_spill")
    os.makedirs(spill, exist_ok=True)
    try:
        con.execute("SET memory_limit='4GB'")
        con.execute(f"SET temp_directory='{spill}'")
        con.execute("SET preserve_insertion_order=false")
    except duckdb.Error:
        pass  # older duckdb without a setting: run with defaults
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


def _arrow_family(t) -> str:
    """Canonical type family for the cross-engine schema check. The
    driver's value hash is arrow-type-sensitive (round 3: DuckDB
    HUGEINT → decimal128 vs Spark BIGINT → int64 failed the hash with
    identical values), so local green must imply matching arrow type
    families. Width differences within a family (int32/int64,
    decimal precision) hash identically after the driver's value
    canonicalization — only family and decimal scale matter."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal(scale={t.scale})"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_family(t.value_type)}>"
    return str(t)


def compare_arrow_types(spark_tbl, duck_tbl) -> list[str]:
    problems = []
    duck_types = {f.name: f.type for f in duck_tbl.schema}
    for f in spark_tbl.schema:
        dt = duck_types.get(f.name)
        if dt is None:
            continue  # column-set mismatch is reported by compare()
        sf, df_ = _arrow_family(f.type), _arrow_family(dt)
        if sf != df_:
            problems.append(
                f"arrow type family differs on {f.name}: "
                f"spark={f.type}({sf}) duck={dt}({df_})"
            )
    return problems


def run_case(spark, sf_dir: str, spark_fn, sql: str | None) -> list[str]:
    sdf = spark_fn(spark, sf_dir)
    spark_tbl = sdf.toArrow()
    spark_pdf = spark_tbl.to_pandas()
    if sql is None:
        return [] if len(spark_pdf) >= 0 else ["spark query failed"]
    con = duck_connect(sf_dir)
    try:
        duck_tbl = con.execute(sql).fetch_arrow_table()
    finally:
        con.close()
    duck_pdf = duck_tbl.to_pandas()
    return compare(spark_pdf, duck_pdf) + compare_arrow_types(spark_tbl, duck_tbl)
