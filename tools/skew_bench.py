#!/usr/bin/env python
"""Skew-robustness micro-bench: measure salted vs unsalted aggregation
and join on a deliberately Zipfian fixture, so the skew machinery has a
MEASURED payoff, not an asserted one.

Fixture: N rows whose key distribution is "one pathological hub plus a
uniform tail" — the worst case for a hash-partitioned shuffle (one task
receives hot_frac of all rows; every other task finishes and waits).
This is the shape a power-law corpus produces at 100 TB: one stopword
shingle, one bot user, one null-ish join key.

Measured paths (each min-of-repeats, after a warm-up):

- groupBy(key).agg(sum, count)            — straggler task = hot_frac·N rows
- skew.salted_agg same aggregate          — two-stage partial: hot key split n_salts ways
- shuffled big-big join on key            — hot key's rows all meet on one task
- skew.salted_broadcastable_join          — big side salted, small side replicated

Results print as ONE JSON line; record them in BASELINE_LOCAL.md.
Run: python tools/skew_bench.py [N_rows] (default 4,000,000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_service_spark.operators import skew  # noqa: E402
from etl_service_spark.session import get_spark  # noqa: E402

HOT_FRAC = 0.3  # requested hub share; realized share is 1/int(1/HOT_FRAC)
TAIL_KEYS = 100_000
REPEATS = 3


def _fixture(spark, n_rows: int):
    """Deterministic Zipf-ish events: 30% of rows on key 0, the rest
    uniform over TAIL_KEYS keys."""
    hot_mod = int(1 / HOT_FRAC)
    df = spark.range(n_rows).select(
        F.when(F.col("id") % hot_mod == 0, F.lit(0))
        .otherwise((F.col("id") * 2654435761) % TAIL_KEYS)
        .alias("user_id"),
        ((F.col("id") * 31 % 997) / 10.0).alias("value"),
    )
    return df.localCheckpoint(eager=True)  # pin: generation cost out of the timings


def _time(fn) -> float:
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = get_spark("skew_bench")
    # force shuffle joins: the salted-join pattern exists for the case
    # where the small side EXCEEDS the broadcast threshold
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # measure raw skew, not AQE rescue

    big = _fixture(spark, n_rows)
    dim = spark.range(TAIL_KEYS).select(
        F.col("id").alias("user_id"), (F.col("id") % 50).alias("segment")
    ).union(
        spark.range(1).select(F.lit(0).alias("user_id"), F.lit(99).alias("segment"))
    ).distinct().localCheckpoint(eager=True)

    def agg_plain():
        big.groupBy("user_id").agg(
            F.sum("value").alias("s"), F.count("*").alias("n")
        ).write.format("noop").mode("overwrite").save()

    def agg_salted():
        skew.salted_agg(
            big,
            "user_id",
            [(F.sum("value"), F.sum("s_p"), "s"), (F.count("*"), F.sum("n_p"), "n")],
        ).write.format("noop").mode("overwrite").save()

    def join_plain():
        big.join(dim, "user_id").select(F.sum("value")).write.format("noop").mode(
            "overwrite"
        ).save()

    def join_salted():
        skew.salted_broadcastable_join(big, dim, "user_id").select(
            F.sum("value")
        ).write.format("noop").mode("overwrite").save()

    agg_plain()  # warm the JVM/codegen once
    out = {
        "n_rows": n_rows,
        "hot_frac": round(1 / int(1 / HOT_FRAC), 4),  # realized share (1/3), not the requested 0.3
        "agg_unsalted_sec": _time(agg_plain),
        "agg_salted_sec": _time(agg_salted),
        "join_unsalted_sec": _time(join_plain),
        "join_salted_sec": _time(join_salted),
    }
    out["agg_speedup"] = round(out["agg_unsalted_sec"] / out["agg_salted_sec"], 2)
    out["join_speedup"] = round(out["join_unsalted_sec"] / out["join_salted_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
