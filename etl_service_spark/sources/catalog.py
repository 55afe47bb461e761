"""Catalog of the synthetic test tables + schema normalization.

Plays the role of the reference's connection/config resolution chain
(`Step.GetRealizationConnections`, Step.cs:1285-1767): given a "source
directory" (one parquet file per table), expose typed DataFrames and
registered temp views.

Normalization rules (applied identically on the DuckDB-oracle side by
`oracle_prelude()` in plans/queries.py):

- ``events.ts`` has appeared in TWO parquet encodings across testdata
  generations, and ``load_table`` adapts to whichever it finds:
    * TIMESTAMP(MICROS) — the current encoding, read natively as
      TIMESTAMP_NTZ;
    * TIMESTAMP(NANOS) — the legacy encoding, which Spark reads as a
      long under ``nanosAsLong`` (kept enabled for old directories).
  Either way we expose BOTH:
    * ``ts_us``  — bigint microseconds since epoch (for NANOS input:
      nanos // 1000, truncation) — the cross-engine-stable
      representation;
    * ``ts``     — TIMESTAMP_NTZ built from ts_us.
  DuckDB's ``epoch_us(ts)`` performs the same truncation, so values
  hash-match.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos → micros (truncating), keep both representations
            # integer DIV, not `/`: epoch-nanos ≈ 1.7e18 exceeds double's 2^53
            df = df.withColumn("ts_us", F.expr("ts DIV 1000"))
        else:
            # parquet TIMESTAMP(MICROS) → timestamp_ntz; session tz is UTC,
            # so the ltz round-trip is the identity and ts_us is exact
            df = df.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        df = df.withColumn("ts", F.timestamp_micros(F.col("ts_us")).cast("timestamp_ntz"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_with_schema_evolution(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Read a landing directory whose parquet drops have DRIFTED
    schemas (columns added over time, int widened to long) into one
    DataFrame: ``mergeSchema`` unions the footers' schemas, older
    files surface the missing columns as NULL.

    Schema drift is a fact of life for a multi-month landing zone at
    100 TB — upstream teams add columns without coordinating. The
    merge cost is footer-only (no data read), so it scales with file
    COUNT, not bytes; pair with ``align_to_schema`` (operators/align)
    to land the merged relation onto the governed target schema with
    defaults instead of NULLs. Mirrors the reference's mapping.csv
    rename step (Helper.cs mapping load) which tolerates extra source
    columns by selection rather than failure."""
    return (
        spark.read.option("mergeSchema", "true")
        # landing zones nest drops in per-batch/per-date subdirectories
        .option("recursiveFileLookup", "true")
        .parquet(landing_dir)
    )
