"""Deterministic cardinality sketch: K-minimum-values (KMV).

`approx_count_distinct` (HyperLogLog) exists in both Spark and DuckDB,
but their implementations differ, so estimates cannot cross-validate.
KMV (Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM'02) is fully determined by the hash function: keep the k
smallest distinct hash values; with U = kth_min / 2^32 as the fraction
of hash space covered, the distinct-count estimate is (k-1)/U. With the
same multiplicative hash on both engines the sketch — and therefore the
estimate — is bit-identical, which makes it oracle-checkable while
still being a genuine sublinear-memory sketch.

Scale shape: DISTINCT on (group, hash) is one map-side-combined
shuffle; ranking the k minima per group is a window on the (already
tiny) distinct relation. On a cluster the same sketch merges by
keeping the k smallest of each partition's k smallest — the classic
mergeable-summary property; the SQL here is the exact serial
equivalent of that merge."""

from __future__ import annotations

# Odd multiplier mod 2^32 is a bijection: distinct inputs keep distinct
# hashes. +1 keeps the value strictly positive (division guard) without
# reordering anything.
_HV = "1 + ((user_id * 2654435761) % 4294967296)"


def quantiles_sql(view: str = "events") -> tuple[str, str]:
    """Per-type value-distribution report via DISCRETE percentiles.

    percentile_disc / quantile_disc return an actual element of the
    group (the first value at cumulative distribution >= p) — no
    interpolation, so no FP arithmetic and the cross-engine match is
    exact. The continuous variants interpolate and would differ in the
    last ulp. One hash-aggregation; Spark computes all three
    percentiles in a single sort-based aggregate per group."""
    spark_sql = f"""
SELECT event_type,
       COUNT(*) AS n,
       MIN(value) AS v_min,
       percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
       percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
       percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
       MAX(value) AS v_max
FROM {view}
GROUP BY event_type
"""
    duck_sql = f"""
SELECT event_type,
       COUNT(*) AS n,
       MIN(value) AS v_min,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.9) AS p90,
       quantile_disc(value, 0.99) AS p99,
       MAX(value) AS v_max
FROM {view}
GROUP BY event_type
"""
    return spark_sql, duck_sql


def kmv_distinct_sql(k: int = 32, view: str = "events") -> str:
    """Distinct user_id per event_type: exact count alongside the KMV
    estimate from the k-th smallest hash. Same SQL text both engines —
    pure integer arithmetic plus one deterministic double division."""
    return f"""
WITH h AS (
  SELECT DISTINCT event_type, {_HV} AS hv FROM {view}
),
rk AS (
  SELECT event_type, hv,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
)
SELECT event_type,
       COUNT(*) AS n_distinct_exact,
       CAST(FLOOR(CASE WHEN COUNT(*) >= {k}
                 THEN ({k - 1} * 4294967296.0) / MAX(CASE WHEN rn = {k} THEN hv END)
                 ELSE COUNT(*) END) AS BIGINT) AS n_distinct_kmv
FROM rk
GROUP BY event_type
"""


def zscore_outliers_sql(z_thresh: int = 2, view: str = "events") -> tuple[str, str]:
    """Per-type z-score outliers with EXACT moment arithmetic: sums and
    sums-of-squares accumulate in DECIMAL (associative, order-free),
    variance = (n*sumsq - sum^2) / n^2 uses one decimal-exact numerator,
    and only the final sqrt/division happen in double — the same two
    correctly-rounded FP ops on identical operands in both engines.
    Population std; rows with |v - mean| > z*std. One aggregation +
    one broadcast-joined filter pass."""
    template = f"""
WITH m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
  FROM {view}
  GROUP BY event_type
),
stats AS (
  SELECT event_type, n,
         s1 / n AS mean,
         SQRT((s2 - s1 * s1 / n) / n) AS std
  FROM m
)
SELECT e.event_id, e.event_type, e.value,
       FLOOR(((e.value - t.mean) / t.std) * 1e6) / 1e6 AS z
FROM {view} e JOIN stats t ON e.event_type = t.event_type
WHERE ABS(e.value - t.mean) > {z_thresh} * t.std
"""
    return template, template
