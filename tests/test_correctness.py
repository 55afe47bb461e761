"""Every registry query must hash-match its DuckDB oracle (the same
check the driver runs at sf0.01)."""

from __future__ import annotations

import pytest

from etl_service_spark.plans.queries import registry

from .harness import run_case

CASES = registry()


@pytest.mark.parametrize("name", sorted(CASES))
def test_query_matches_oracle(spark, sf_dir, name):
    case = CASES[name]
    problems = run_case(spark, sf_dir, case.spark, case.oracle)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_oracle_output_types_lint(sf_dir):
    """No registry oracle may expose a HUGEINT/UHUGEINT output column:
    DuckDB widens SUM(BIGINT) to int128, which arrow-hashes differently
    from Spark's BIGINT even with identical values (round 3's only
    failure class — DETERMINISM.md's CAST rule, now enforced)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from oracle_lint import lint

    problems = lint(sf_dir)
    assert not problems, problems


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns


def test_bench_partition_covers_registry():
    """The bench's no-silent-caps invariant: every registry query is
    either a standing headliner or an explicitly-excluded entry WITH a
    stated reason — a new registry entry that lands in neither list
    fails here, and `python bench.py --full` (BENCH_FULL.json) times
    both sides."""
    import bench
    from etl_service_spark.plans.queries import registry

    names = set(registry())
    headliners = set(bench.HEADLINERS)
    excluded = set(bench.EXCLUDED)
    assert len(bench.HEADLINERS) == len(headliners)  # no duplicate rows
    assert not headliners & excluded, sorted(headliners & excluded)
    assert headliners | excluded == names, {
        "unlisted": sorted(names - headliners - excluded),
        "phantom": sorted((headliners | excluded) - names),
    }
    assert all(reason.strip() for reason in bench.EXCLUDED.values())
