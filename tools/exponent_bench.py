#!/usr/bin/env python
"""Three-point per-decade exponent bench for the POST-r8 operators.

VERDICT r10 #6: BASELINE_LOCAL.md's exponent table (tools/scale_bench
--three) covers the r8 spine; the 15 operators added in rounds 9-10
had only sf0.1->sf1 ratios — and those ratios were themselves suspect
for the documents/embeddings families until round 11 fixed gen_sf1's
unscaled-twin regression. This tool pins all three points on honest
twins:

- sf0.1:  /root/testdata/sf0.1 (the driver's bench scale)
- sf1~:   /tmp/etl_sf1.0  (gen_sf1, 10x EVERY scaled table)
- sf10~:  /tmp/etl_sf10   (gen_sf1 --copies 100 — 100x TPC-H/events
          AND 100x documents/embeddings, unlike scale_bench's twins
          which symlink the TPC-H tables unscaled)

Per query: min-of-2 wall after a session warm-up, one SparkSession for
the whole run (the steady-state cost a long-lived cluster session
pays). e = log10(wall ratio) per decade; a bounded design reads ~1.

Run: SPARK_GRAFT_DRIVER_MEM=64g python tools/exponent_bench.py
     [--skip-sf10] [--only=a,b,c]
Prints one JSON line; paste the table into BASELINE_LOCAL.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.gen_sf1 import build_twin  # noqa: E402
from tools.scale_bench import _heap_mb  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/etl_sf1.0"
SF10 = "/tmp/etl_sf10"

# the 15 registry entries added in rounds 9-10 (ROUND9/10_NOTES
# "Registry widening"), i.e. everything newer than the r8 spine table
POST_R8 = [
    # round 9
    "privacy_k_map",
    "text_source_unigram_tvd",
    "graph_bfs_layers",
    "events_rollup_consistency",
    "events_peak_concurrency",
    "ann_ivfpq_topk",
    "ann_ivfpq_recall",
    "text_source_overlap_jaccard",
    "basket_association_rules",
    # round 10
    "text_source_diversity_gini",
    "ann_int8_recall",
    "dim_scd2_invariants",
    "dq_order_totals_recon",
    "dedup_incremental_exact",
    "dedup_incremental_neardup",
]


def main() -> int:
    only = next(
        (a.split("=", 1)[1].split(",") for a in sys.argv[1:] if a.startswith("--only=")),
        None,
    )
    skip10 = "--skip-sf10" in sys.argv[1:]
    if not skip10 and _heap_mb(os.environ.get("SPARK_GRAFT_DRIVER_MEM")) < 16 * 1024:
        print(
            "the sf10 point needs a larger local heap: rerun with "
            "SPARK_GRAFT_DRIVER_MEM=64g (box has 128 GiB), or --skip-sf10",
            file=sys.stderr,
        )
        return 2

    points: list[tuple[str, str]] = [("sf01", SF01)]
    if not os.path.isdir(SF1):
        build_twin(SF1, 10)
    points.append(("sf1", SF1))
    if not skip10:
        if not os.path.isdir(SF10):
            build_twin(SF10, 100)
        points.append(("sf10", SF10))

    from etl_service_spark.functions import portable as P
    from etl_service_spark.plans.queries import registry, views
    from etl_service_spark.session import get_spark

    spark = get_spark("exponent_bench")
    P.warm_udfs(spark)
    cases = registry()
    names = [n for n in POST_R8 if only is None or n in only]
    out: dict[str, dict] = {n: {} for n in names}
    for sf_name, sf_dir in points:
        views(spark, sf_dir)
        for n in names:
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                cases[n].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.monotonic() - t0)
            out[n][sf_name] = round(best, 2)
            print(f"{sf_name} {n}: {out[n][sf_name]}s", flush=True)
    for n in names:
        r = out[n]
        if "sf1" in r and r["sf01"] > 0:
            r["e_01_to_1"] = round(math.log10(max(r["sf1"] / r["sf01"], 0.01)), 2)
        if "sf10" in r and r.get("sf1", 0) > 0:
            r["e_1_to_10"] = round(math.log10(max(r["sf10"] / r["sf1"], 0.01)), 2)
    print(json.dumps({"queries": out, "points": [p for p, _ in points]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
