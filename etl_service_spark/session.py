"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; the same settings are what we
would ship to a real cluster (AQE on, Arrow on, sane shuffle
partitioning). On a 1000-executor cluster only the master/shuffle
numbers change — every operator in this package expresses its plan
declaratively so Catalyst/AQE pick the physical strategy.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "etl_service_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Notes on the non-obvious configs:

    - ``spark.sql.legacy.parquet.nanosAsLong``: legacy/back-compat —
      older testdata generations stored events.ts as TIMESTAMP(NANOS),
      which Spark refuses by default; with this flag such files read as
      long and the catalog layer converts (see catalog.load_table). The
      current testdata stores TIMESTAMP(MICROS), which reads natively;
      the flag is inert for it but kept so old directories still load.
    - shuffle partitions == cores in local mode; on a real cluster this
      would be ~2-3x total cores, with AQE coalescing the tail.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # FAIR + per-workflow pools (orchestrator sets
        # spark.scheduler.pool per step thread): concurrent workflows
        # share executors instead of FIFO-starving each other
        .config("spark.scheduler.mode", "FAIR")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
