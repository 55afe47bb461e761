"""Distributed prefix scan: global rank + running sum WITHOUT a
single-partition window.

A global ``ROW_NUMBER() / SUM() OVER (ORDER BY ...)`` is the textbook
way to write cumulative analytics (Pareto curves, top-p cutoffs,
quantile tables) — and the textbook 100 TB failure: Spark plans an
empty-frame window as Exchange SinglePartition, one task sorting and
scanning the entire relation. The scalable shape is the classic
two-phase scan (Blelloch, "Prefix sums and their applications", 1990;
the same decomposition Spark's own SortExec uses for range
partitioning):

1. ``repartitionByRange`` on the sort key — partitions are disjoint,
   range-ordered slices, so partition id IS the coarse rank;
2. per-partition local rank / cumsum (a window PARTITIONED by the
   range slice — every task works independently);
3. per-partition (count, sum) totals — n_partitions rows — turned
   into exclusive offsets by a window over that TINY relation, then
   broadcast-joined back and added to the local values.

The only single-partition work is the offsets window over
``n_parts`` rows. No driver collect anywhere; results are a pure
function of the sort key (ties must be broken by a unique column),
independent of where the sampled range boundaries land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_ranked_cumsum(
    df: DataFrame, value: str, tiebreak: str, n_parts: int = 32
) -> DataFrame:
    """Adds ``rk`` (1-based global rank) and ``cum`` (inclusive running
    sum of ``value``) under the total order (value DESC, tiebreak ASC).

    ``value`` should be an exact type (integer cents / DECIMAL): the
    running sum is then bit-identical to a single-window oracle no
    matter how rows are split across partitions. ``tiebreak`` must be
    unique per row — that is what makes the total order (and therefore
    rank and cumsum) well-defined independent of partition boundaries.
    """
    order = [F.col(value).desc(), F.col(tiebreak).asc()]
    part = df.repartitionByRange(n_parts, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    totals = part.groupBy("_pid").agg(
        F.count("*").alias("_cnt"), F.sum(value).alias("_sum")
    )
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(off_w), F.lit(0).cast("long")).alias("_rk_off"),
        F.coalesce(F.sum("_sum").over(off_w), F.lit(0).cast("long")).alias("_cum_off"),
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn(
        "_lrk", F.row_number().over(Window.partitionBy("_pid").orderBy(*order))
    ).withColumn("_lcum", F.sum(value).over(local_w))
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("rk", (F.col("_lrk").cast("long") + F.col("_rk_off")))
        .withColumn("cum", (F.col("_lcum") + F.col("_cum_off")))
        .drop("_pid", "_lrk", "_lcum", "_rk_off", "_cum_off")
    )
