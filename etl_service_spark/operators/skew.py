"""Skew handling: salting for hot keys (SCALE.md ground rules).

Spark's map-side partial aggregation already tames skewed ALGEBRAIC
aggregations, and AQE splits skewed sort-merge join partitions at
runtime. Salting is the explicit tool for the remaining cases:

- **salted_agg**: two-phase aggregation — salt the key, partial-agg
  over (key, salt) so a hot key spreads across ``n_salts`` reducers,
  then merge partials. Worth it for holistic/heavy aggregates
  (collect_*, exact distinct) or when one key dominates a stage.
- **salted_broadcastable_join**: replicate the small side once per
  salt value and join on (key, salt) — a hot join key's rows spread
  over ``n_salts`` tasks instead of one straggler.

Both are RESULT-IDENTICAL to the unsalted plan (aggregation is
associative; the join replication is exact), so each has a plain-SQL
DuckDB oracle in the registry — the salt never leaks into the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "_salt"


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[tuple[Column, Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs``: (partial_agg_expr, merge_agg_expr_over('<alias>_p'), alias)
    triples, e.g. ``(F.count('*'), F.sum('n_p'), 'n')``. The salt is
    derived from monotonically_increasing_id — any assignment works,
    the merge phase is associative."""
    salted = df.withColumn(SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    partial = salted.groupBy(key, SALT_COL).agg(
        *[p.alias(f"{alias}_p") for p, _, alias in aggs]
    )
    return partial.groupBy(key).agg(*[m.alias(alias) for _, m, alias in aggs])


def salted_broadcastable_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated n_salts times: a hot key's rows land on n_salts tasks.
    (With a truly broadcastable small side Spark's BroadcastHashJoin
    already avoids skew — this is the pattern for when the small side
    exceeds the broadcast threshold and the join must shuffle.)"""
    big_s = big.withColumn(SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    small_r = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_s.join(small_r, on=[key, SALT_COL])
    return joined.drop(SALT_COL)
