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


def cluster_conf(
    total_cores: int,
    executor_cores: int = 4,
    executor_mem_gb: int = 16,
    target_partition_mb: int = 256,
) -> dict[str, str]:
    """Deployment profile for a real cluster (e.g. 1000 executors x 4
    cores against ~100 TB) — the numbers that change when leaving
    local mode, with the reasoning pinned here so ops doesn't have to
    re-derive it:

    - shuffle partitions ~2.5x total cores: enough tasks that AQE can
      coalesce the small tail and split skewed ones, not so many that
      scheduler overhead dominates. AQE skew-join splitting is ON —
      the salted twins (events_salted_*, graph_pagerank_salted) are
      for the skew AQE cannot fix (pre-shuffle hub aggregation state,
      iterative joins reusing one exchange).
    - maxPartitionBytes sizes scan partitions so a task's working set
      (page-compressed parquet expands ~2-4x decoded) fits the
      per-core memory slice: mem_gb / cores, headroom for the hash
      side of joins.
    - broadcast threshold stays generous (dims up to 256 MB): every
      broadcastable join in this engine (dims, centroids, fan-out
      relations, spine tables) is bounded by design, and a shuffled
      dim join at 100 TB costs far more than a bigger broadcast.
    - observability/resilience: speculation for straggler re-launch,
      excludeOnFailure for flaky hosts, shuffle+RDD compression on.
    """
    shuffle_parts = int(total_cores * 2.5)
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.default.parallelism": str(shuffle_parts),
        "spark.executor.cores": str(executor_cores),
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "3",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024 * 1024),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.speculation": "true",
        "spark.excludeOnFailure.enabled": "true",
        "spark.shuffle.compress": "true",
        "spark.rdd.compress": "true",
        "spark.scheduler.mode": "FAIR",
        "spark.sql.session.timeZone": "UTC",
    }
