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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns
