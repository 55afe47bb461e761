#!/usr/bin/env python
"""One-session sweep over the headliners recording wall, job count and
stage count per query (two passes; pass 2 recorded — staging memos and
page cache warm). Queries whose wall is dominated by SEQUENTIAL jobs
(driver probes, staging rounds, iterative folds) are the overhead-bound
tail the plan audit cannot see; this is the measurement that finds
them.

Run: python tools/overhead_sweep.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINERS  # noqa: E402
from etl_service_spark.functions import portable as P  # noqa: E402
from etl_service_spark.plans.queries import registry, views  # noqa: E402
from etl_service_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_file = sys.argv[1] if len(sys.argv) > 1 else "/tmp/overhead_sweep.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("overhead_sweep")
    cases = registry()
    views(spark, sf_dir)
    P.warm_udfs(spark)
    st = spark.sparkContext.statusTracker()
    rec = {}
    for pass_no in (1, 2):
        for name in HEADLINERS:
            case = cases[name]
            jobs_before = max(st.getJobIdsForGroup(None) or [], default=-1)
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            t0 = time.monotonic()
            case.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            new_jobs = [j for j in (st.getJobIdsForGroup(None) or []) if j > jobs_before]
            n_stages = sum(
                len(st.getJobInfo(j).stageIds)
                for j in new_jobs
                if st.getJobInfo(j) is not None
            )
            if pass_no == 2:
                rec[name] = {
                    "wall": round(wall, 3),
                    "jobs": len(new_jobs),
                    "stages": n_stages,
                }
    with open(out_file, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    top = sorted(rec.items(), key=lambda kv: -kv[1]["jobs"])
    print("most jobs:")
    for name, r in top[:25]:
        print(f"  jobs={r['jobs']:3d} stages={r['stages']:3d} wall={r['wall']:7.3f}  {name}")
    tot = sum(r["wall"] for r in rec.values())
    print(f"total warm wall: {tot:.1f} s over {len(rec)} queries -> {out_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
