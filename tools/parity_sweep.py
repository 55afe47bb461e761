#!/usr/bin/env python
"""Full-registry cross-engine parity sweep at an ARBITRARY scale factor.

The driver's correctness gate (and tests/test_correctness.py) compares
every query to its DuckDB oracle at sf0.01. Some divergence only
appears at scale — e.g. integer overflow under ANSI mode once a group's
moment sums cross 2^63 (found in events_value_time_corr at sf0.1), or
decimal-precision saturation. This sweep runs the SAME value-level
comparison at whatever sf directory you point it at.

Run: python tools/parity_sweep.py [/root/testdata/sf0.1]
Exit code 1 on any mismatch; prints one line per failing query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from harness import run_case  # noqa: E402

from etl_service_spark.functions import portable as P  # noqa: E402
from etl_service_spark.plans.queries import registry, views  # noqa: E402
from etl_service_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("parity_sweep")
    views(spark, sf_dir)
    P.warm_udfs(spark)
    cases = registry()
    bad = 0
    for name, case in sorted(cases.items()):
        try:
            problems = run_case(spark, sf_dir, case.spark, case.oracle)
        except Exception as e:  # noqa: BLE001 - report and keep sweeping
            problems = [f"exception: {str(e).splitlines()[0][:160]}"]
        if problems:
            bad += 1
            print(f"MISMATCH {name}: {problems[0]}")
    print(f"parity sweep @ {sf_dir}: {len(cases) - bad}/{len(cases)} match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
