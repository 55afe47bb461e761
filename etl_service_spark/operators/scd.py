"""Slowly-changing-dimension Type-2 merge.

The reference copies dimensions wholesale (D1/D2) and leaves history
to the target warehouse; the Spark-native engine keeps the history
itself: ``scd2_merge`` folds a new attribute snapshot into a
versioned dimension table — close the open row of every key whose
tracked attributes changed, insert the new version, keep everything
else byte-stable.

Scale shape: ONE full-outer hash join between the open slice and the
snapshot on the business key (both sides shuffle once on that key;
the closed-history slice is untouched and appended verbatim —
history cost is O(1) per batch, not O(history)). Pair the output
with ``write_copy_idempotent`` partitioned on ``valid_from`` so a
replayed batch overwrites only its own version-partition (update
unit = recovery unit, as everywhere else in this repo).

The registry query ``dim_scd2_merge`` derives a deterministic
"snapshot" from the customer table (every 7th key gets a changed
balance), so the whole merge has a value-level DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    batch_ts: str,
) -> DataFrame:
    """Fold ``updates`` (key + tracked attrs, one row per key) into the
    SCD2 table ``current`` (key + tracked + valid_from, valid_to).

    Rows with ``valid_to IS NULL`` are open. A key absent from the
    snapshot stays open (partial snapshots are the norm); a new key
    inserts its first version; a changed key closes at ``batch_ts``
    and re-opens with the new values."""
    closed_history = current.filter(F.col("valid_to").isNotNull())
    open_rows = current.filter(F.col("valid_to").isNull())

    # explicit presence marker: testing a VALUE column for NULL would
    # misclassify an update row whose first tracked attribute is NULL
    # as absent from the snapshot (its change silently lost, or a new
    # key dropped entirely)
    u = updates.select(
        F.col(key),
        *[F.col(c).alias(f"__u_{c}") for c in tracked],
        F.lit(True).alias("__u_present"),
    )
    j = open_rows.join(u, key, "full_outer")

    changed = None
    for c in tracked:
        diff = ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        changed = diff if changed is None else (changed | diff)
    in_update = F.col("__u_present").isNotNull()
    in_open = F.col("valid_from").isNotNull()

    untouched = j.filter(in_open & (~in_update | ~changed)).select(
        key, *tracked, "valid_from", "valid_to"
    )
    closed = (
        j.filter(in_open & in_update & changed)
        .select(key, *tracked, "valid_from")
        .withColumn("valid_to", F.lit(batch_ts))
    )
    opened = (
        j.filter(in_update & (~in_open | changed))
        .select(key, *[F.col(f"__u_{c}").alias(c) for c in tracked])
        .withColumn("valid_from", F.lit(batch_ts))
        .withColumn("valid_to", F.lit(None).cast("string"))
    )
    return closed_history.unionByName(untouched).unionByName(closed).unionByName(
        opened
    )


# --------------------------------------------------- registry instance
V0, V1 = "2025-01-01", "2025-06-01"


def scd2_customers(spark, sf_dir: str) -> DataFrame:
    """Deterministic instance: v0 dimension = customers at V0 (balance
    in exact cents); snapshot = every 7th key with balance +100.00 and
    5 brand-new keys. The merge must close/reopen exactly the %7 keys
    and insert the new ones."""
    cust = spark.table("customer").select(
        F.col("c_custkey").alias("custkey"),
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("acctbal_cents"),
    )
    current = cust.withColumn("valid_from", F.lit(V0)).withColumn(
        "valid_to", F.lit(None).cast("string")
    )
    updates = cust.withColumn(
        "acctbal_cents",
        F.when(F.col("custkey") % 7 == 0, F.col("acctbal_cents") + 10000).otherwise(
            F.col("acctbal_cents")
        ),
    ).unionByName(
        spark.range(5).select(
            (F.col("id") + 90_000_000).alias("custkey"),
            F.lit(0).cast("bigint").alias("acctbal_cents"),
        )
    )
    return scd2_merge(current, updates, "custkey", ["acctbal_cents"], V1)


def scd2_oracle_sql() -> str:
    """Single-statement DuckDB twin of :func:`scd2_customers`."""
    return f"""
WITH cust AS (
  SELECT c_custkey AS custkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
),
updates AS (
  SELECT custkey,
         CASE WHEN custkey % 7 = 0 THEN acctbal_cents + 10000
              ELSE acctbal_cents END AS acctbal_cents
  FROM cust
  UNION ALL
  SELECT 90000000 + i, CAST(0 AS BIGINT)
  FROM (SELECT unnest(range(5)) AS i)
),
changed AS (SELECT custkey FROM cust WHERE custkey % 7 = 0)
SELECT c.custkey, c.acctbal_cents, '{V0}' AS valid_from,
       CASE WHEN ch.custkey IS NULL THEN NULL ELSE '{V1}' END AS valid_to
FROM cust c LEFT JOIN changed ch ON c.custkey = ch.custkey
UNION ALL
SELECT u.custkey, u.acctbal_cents, '{V1}', NULL
FROM updates u
WHERE u.custkey % 7 = 0 OR u.custkey >= 90000000
"""


def scd2_pit_lookup(spark, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the query SCD2 history exists
    FOR: join each fact row to the dimension version in effect at its
    event time (valid_from <= t < valid_to, open version = NULL
    valid_to). Facts = orders probing two dates that straddle the
    scd2_customers merge boundary, so March probes must resolve to the
    ORIGINAL balance of the %7-changed keys (their later version is
    invisible at that time) and September probes to the updated one.

    Scale shape: the join is EQUI on the dimension key — the range
    predicate is a residual filter over that key's few versions, never
    a pair blowup (versions-per-key is bounded by change frequency, not
    corpus size). Output is aggregated per (probe_date, version) so the
    oracle is a full value check. Reference parity: the reference's
    destructive truncate-and-fill loads (CommandExecuter.cs) have no
    history to probe; this is the standard warehouse companion of D1's
    dimension copy."""
    dim = scd2_customers(spark, sf_dir)
    probes = spark.table("orders").select(
        F.col("o_custkey").alias("custkey"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("2025-03-01"))
        .otherwise(F.lit("2025-09-01"))
        .alias("probe_date"),
    )
    j = probes.join(dim, "custkey").filter(
        (F.col("valid_from") <= F.col("probe_date"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("probe_date")))
    )
    return j.groupBy("probe_date", "valid_from").agg(
        F.count("*").alias("n_lookups"),
        F.sum("acctbal_cents").alias("sum_cents"),
    )


def scd2_pit_oracle_sql() -> str:
    """DuckDB twin: the scd2 merge oracle as a nested-WITH subquery +
    the same equi-join with residual range predicate."""
    return f"""
WITH dim AS ({scd2_oracle_sql()}),
probes AS (
  SELECT o_custkey AS custkey,
         CASE WHEN o_orderkey % 2 = 0 THEN '2025-03-01'
              ELSE '2025-09-01' END AS probe_date
  FROM orders
)
SELECT p.probe_date, d.valid_from,
       COUNT(*) AS n_lookups,
       CAST(SUM(d.acctbal_cents) AS BIGINT) AS sum_cents
FROM probes p JOIN dim d ON d.custkey = p.custkey
WHERE d.valid_from <= p.probe_date
  AND (d.valid_to IS NULL OR d.valid_to > p.probe_date)
GROUP BY p.probe_date, d.valid_from
"""
