#!/usr/bin/env python
"""Per-query profiler for the optimization rounds: run one (or more)
registry queries in a warm session with the noop sink, and report

- wall seconds for N repeats (first = staging-cold, rest = warm),
- the number of Spark jobs and stages the query submitted (status
  tracker delta — sequential job barriers are invisible in a plan but
  dominate multi-round folds),
- the formatted physical plan (optional, --plan), written to a file
  for the plans/r11 before/after record.

Run: python tools/profile_query.py <query>[,<query>...] [--repeats=3]
         [--plan=plans/r11/<name>_before.txt] [--sf=/root/testdata/sf0.1]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_service_spark.functions import portable as P  # noqa: E402
from etl_service_spark.plans.queries import registry, views  # noqa: E402
from etl_service_spark.session import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1].split(",")
    repeats = 3
    plan_out = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[2:]:
        if a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
        elif a.startswith("--plan="):
            plan_out = a.split("=", 1)[1]
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark("profile_query")
    cases = registry()
    views(spark, sf_dir)
    P.warm_udfs(spark)
    st = spark.sparkContext.statusTracker()
    for name in names:
        case = cases[name]
        if plan_out:
            df = case.spark(spark, sf_dir)
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            os.makedirs(os.path.dirname(plan_out), exist_ok=True)
            with open(plan_out, "w") as f:
                f.write(f"-- {name} @ {sf_dir}\n" + buf.getvalue())
            print(f"{name}: plan -> {plan_out}")
        walls = []
        for i in range(repeats):
            jobs_before = st.getJobIdsForGroup(None) or []
            n_jobs_before = max(jobs_before, default=-1)
            spark.sparkContext.setJobDescription(f"profile:{name}:{i}")
            t0 = time.monotonic()
            df = case.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            spark.sparkContext.setJobDescription(None)
            jobs_after = st.getJobIdsForGroup(None) or []
            new_jobs = [j for j in jobs_after if j > n_jobs_before]
            n_stages = 0
            for j in new_jobs:
                ji = st.getJobInfo(j)
                if ji is not None:
                    n_stages += len(ji.stageIds)
            walls.append(wall)
            print(
                f"{name} run{i}: {wall:7.3f} s   jobs={len(new_jobs)} stages={n_stages}"
            )
        print(f"{name}: min={min(walls):.3f} warm_min={min(walls[1:] or walls):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
