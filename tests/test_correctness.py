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


def test_plan_audit_flags_single_partition_windows(spark, sf_dir):
    """The round-9 audit rule end-to-end: an unpartitioned NTILE over
    a fact table (the pre-fix layout_zorder_skipping / RFM shape)
    MUST be flagged as Window-over-Exchange-SinglePartition, while the
    sanctioned bounded forms — the two-phase scan's n_parts offsets
    window and a window over a bounded-domain aggregate — must pass.
    Guards the audit itself: it machine-checked 198 plans in round 8
    and caught none of the six, because the class was not in its
    pattern list."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_audit import window_violations

    from etl_service_spark.plans.queries import views

    views(spark, sf_dir)
    prefix = spark.sql(
        "SELECT NTILE(64) OVER (ORDER BY o_custkey, o_orderkey) AS f FROM orders"
    )
    plan = prefix._jdf.queryExecution().executedPlan().toString()
    assert window_violations("prefix_ntile", plan), "pre-fix shape not flagged"

    from etl_service_spark.operators.scan import global_ranked_cumsum

    fixed = global_ranked_cumsum(
        spark.table("orders").selectExpr(
            "o_custkey", "CAST(o_orderkey AS BIGINT) AS w"
        ),
        "w",
        "o_custkey",
    )
    plan = fixed._jdf.queryExecution().executedPlan().toString()
    assert window_violations("two_phase", plan) == [], "offsets pass wrongly flagged"


def test_window_rule_source_key_is_per_query(spark, sf_dir):
    """Round-9 verdict hygiene #2: `source`/`lang` moved from the
    global BOUNDED_WINDOW_KEYS to per-query sanctions — a window over
    an UNBOUNDED column that merely happens to be named `source` must
    FAIL the rule for any query without its own sanction entry, and
    pass only under a sanctioned name."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_audit import SANCTIONED_WINDOW_KEYS, window_violations

    from etl_service_spark.plans.queries import views

    views(spark, sf_dir)
    # per-user_id aggregate masquerading under the name `source`:
    # |keys| rows — unbounded in data mass, whatever the column is called
    df = spark.sql(
        """
        SELECT source, n, SUM(n) OVER () AS tot FROM (
          SELECT source, COUNT(*) AS n FROM (
            SELECT CONCAT('u', user_id) AS source FROM events
          ) GROUP BY source
        )
        """
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert window_violations("some_new_query", plan), (
        "unbounded window keyed by a column named `source` passed for an "
        "unsanctioned query — the per-query sanction policy regressed"
    )
    assert "source" in SANCTIONED_WINDOW_KEYS["corpus_resample_plan"]
    assert window_violations("corpus_resample_plan", plan) == []


def test_window_rule_walk_fails_closed():
    """ADVICE r9: an unrecognized node between a Window and its
    partitioning decision must be FLAGGED for manual review, not
    silently passed (the walk used to fail open — any plan shape
    outside the pass-through list disabled the rule)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_audit import window_violations

    plan = "\n".join(
        [
            "Window [sum(x#1L) windowspecdefinition(...)]",
            "+- SomeFutureNode mystery",
            "   +- Exchange SinglePartition, ENSURE_REQUIREMENTS",
            "      +- FileScan parquet [x#1L] ... events.parquet",
        ]
    )
    flags = window_violations("q", plan)
    assert flags and "fail-closed" in flags[0], flags


def test_unionloop_rule_fails_closed():
    """Round-10 verdict #5: a recursive-CTE (UnionLoop) plan's loop
    body is re-planned per iteration and invisible to the static
    audit, so an UNSANCTIONED UnionLoop must be flagged, a sanctioned
    one passes, and a condition-less Join inside the body (hidden
    cartesian) is flagged even for sanctioned queries."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_audit import RECURSIVE_SANCTIONED, unionloop_violations

    plan = "\n".join(
        [
            "UnionLoop 1, [node#1, lvl#2]",
            "   :- Project [...]",
            "   +- Join Inner, (parent#3 = node#4)",
            "      +- UnionLoopRef 1, [node#4], false",
        ]
    )
    assert unionloop_violations("some_new_recursive_query", plan), (
        "unsanctioned UnionLoop passed the audit — the fail-closed rule regressed"
    )
    assert "ana_hierarchy_tree_recursive" in RECURSIVE_SANCTIONED
    assert unionloop_violations("ana_hierarchy_tree_recursive", plan) == []
    cartesian = plan.replace("Join Inner, (parent#3 = node#4)", "Join Inner")
    flags = unionloop_violations("ana_hierarchy_tree_recursive", cartesian)
    assert flags and "condition-less" in flags[0], flags


def test_full_plan_audit_record_covers_registry():
    """Round-9 verdict #1: the committed full-registry audit record
    (PLAN_AUDIT_FULL.json, written by `plan_audit.py --full`) must be
    violation-free and cover EXACTLY the current registry — a new
    registry entry without a full-audit re-run fails here, the same
    no-silent-caps discipline as the bench partition test."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "PLAN_AUDIT_FULL.json")
    assert os.path.exists(path), "run `python tools/plan_audit.py --full`"
    with open(path) as fh:
        rec = json.load(fh)
    assert rec["violations"] == [], rec["violations"]
    audited = set(rec["exchange_counts"])
    names = set(registry())
    assert audited == names, {
        "unaudited": sorted(names - audited),
        "stale": sorted(audited - names),
    }


def test_codegen_sweep_record_covers_registry():
    """Round-10 verdict #1: the committed codegen-fallback sweep record
    (CODEGEN_SWEEP.json, written by `tools/codegen_sweep.py`) must show
    zero unexpected `ERROR CodeGenerator` fallbacks, every allowlist
    entry must still be firing (a cured query must leave the
    allowlist), and the sweep must cover EXACTLY the current registry —
    a new registry entry without a sweep re-run fails here. This pins
    the discipline that caught ann_range_search (r10) and
    ann_ivfpq_recall (r11) silently running interpreted: the next 64 KB
    Janino overflow cannot land without tripping CI."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CODEGEN_SWEEP.json")
    assert os.path.exists(path), "run `python tools/codegen_sweep.py`"
    with open(path) as fh:
        rec = json.load(fh)
    assert rec["clean"] and rec["unexpected"] == {}, rec["unexpected"]
    stale_allow = set(rec["allowlist"]) - set(rec["allowlisted_hits"])
    assert not stale_allow, f"allowlist entries no longer firing: {sorted(stale_allow)}"
    audited = set(rec["audited"])
    names = set(registry())
    assert audited == names, {
        "unswept": sorted(names - audited),
        "stale": sorted(audited - names),
    }
