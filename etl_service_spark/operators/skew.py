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


def bloom_prefilter_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
    k: int = 3,
    m: int = 65536,
) -> DataFrame:
    """Semi-join reduction through a broadcast Bloom bitset (Bloom,
    CACM'70) — the runtime-filter pattern Catalyst injects for shuffle
    joins (InjectRuntimeFilter; its bloom_filter_agg/might_contain
    expressions are internal, not SQL-resolvable, so this builds the
    same shape from public built-ins).

    Regime: the key side is too big to broadcast as a join hash table
    but its m-bit set is not (m/8 bytes regardless of key count; FPR
    ~= (1 - e^(-kn/m))^k). The fact side is probed MAP-SIDE against
    the broadcast bitset — k xxhash64 bit tests, O(1) array access
    per row inside codegen, no Python — and only survivors (true
    members + FPR false positives) enter the exact semi-join shuffle;
    at a 1% hit rate that shuffle carries ~1% of the fact table. The
    exact semi join then removes the false positives, so the result is
    IDENTICAL to a plain semi join (the registry pins it against that
    oracle: the filter never leaks).

    Build shape: positions -> 64-bit words via bit_or aggregation
    (<= m/64 rows), densified into ONE array<bigint> row and broadcast
    via crossJoin — the same bounded single-row build the plan audit
    whitelists; no driver collect.
    """
    n_words = (m + 63) // 64
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(keys_key), F.lit(i)), F.lit(m))
                    for i in range(k)
                ]
            )
        ).alias("pos")
    ).distinct()
    words = pos.groupBy(F.expr("CAST(pos DIV 64 AS INT)").alias("w")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))").alias(
            "mask"
        )
    )
    bits = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask"))).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}),"
            " i -> coalesce(element_at(wm, i), CAST(0 AS BIGINT)))"
        ).alias("_bf")
    )
    tests = []
    for i in range(k):
        p = f"pmod(xxhash64({fact_key}, {i}), {m})"
        tests.append(
            f"(shiftright(element_at(_bf, CAST({p} DIV 64 AS INT) + 1),"
            f" CAST({p} % 64 AS INT)) & 1) = 1"
        )
    pruned = (
        fact.crossJoin(F.broadcast(bits)).filter(" AND ".join(tests)).drop("_bf")
    )
    # resolve the probe side's column against ITS dataframe: a bare
    # F.col(keys_key) is ambiguous whenever fact_key == keys_key (the
    # common same-name join) and fails analysis
    probe = keys.select(keys_key).distinct()
    return pruned.join(probe, pruned[fact_key] == probe[keys_key], "left_semi")


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
