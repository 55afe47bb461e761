#!/usr/bin/env python
"""Mechanical anti-pattern audit over every headline query's EXECUTED
plan — the automated version of eyeballing PLANS.md. Flags the shapes
that break at 100 TB:

- CartesianProduct / BroadcastNestedLoopJoin with a non-trivial build
  side (an unkeyed pair blowup; the only sanctioned instance is a
  broadcast of a literal/1-row relation);
- BatchEvalPython (row-at-a-time Python UDF — everything Python-side
  must be Arrow-batched: ArrowEvalPython / mapInPandas / applyInPandas
  / UDTF);
- parquet scans of the big fact tables (lineitem/orders/events)
  reading every column (no projection reached the scan).

Exit 1 with one line per violation; a clean run prints the audit
summary. Run after plan-affecting changes and before record refreshes:
    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINERS  # noqa: E402
from etl_service_spark.functions import portable as P  # noqa: E402
from etl_service_spark.plans.queries import registry, views  # noqa: E402
from etl_service_spark.session import get_spark  # noqa: E402

# fact tables whose full-width scan is never right; widths are read
# from the live schema so the audit tracks the testdata layout
FACTS = ("lineitem", "orders", "events")
FULL_WIDTH: dict[str, int] = {}

def _marker_col(line: str) -> int | None:
    """Column of this line's tree marker (':-' or '+-'), or None for
    non-node lines."""
    m = re.search(r"[:+]- ", line)
    return m.start() if m else None


def _broadcast_build_subtrees(plan: str) -> list[str]:
    """The subtree under each BroadcastExchange that feeds a
    BroadcastNestedLoopJoin — the build side whose size decides whether
    the nested loop is a bounded expand or a pair blowup."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        col = _marker_col(line)
        if col is None:
            continue
        # owning join = nearest preceding node line at a strictly
        # smaller marker column (the direct parent); a no-marker line
        # is the plan root
        owner = None
        for j in range(i - 1, -1, -1):
            c = _marker_col(lines[j])
            if c is None and lines[j].strip() and not lines[j].startswith(" "):
                owner = lines[j]
                break
            if c is not None and c < col:
                owner = lines[j]
                break
        if owner is None or "BroadcastNestedLoopJoin" not in owner:
            continue
        sub = [line]
        for k in range(i + 1, len(lines)):
            c = _marker_col(lines[k])
            if c is not None and c <= col:
                break
            sub.append(lines[k])
        out.append("\n".join(sub))
    return out


def _bounded(subtree: str) -> bool:
    """A broadcast build side is bounded iff it scans no table files
    (literal Range/Union/LocalTableScan), reduces whatever it scans
    through a GLOBAL aggregate (keys=[] -> exactly one row), or is
    capped by an explicit row Limit (GlobalLimit/LocalLimit — a
    constant bound by construction, e.g. the broadcast query set of
    the ANN brute-force baselines)."""
    if "Scan parquet" not in subtree and "FileScan" not in subtree:
        return True
    if "HashAggregate(keys=[]" in subtree:
        return True
    # A row Limit caps the build ONLY if nothing above it can re-expand
    # or merge branches (limit-then-join / limit-below-explode would
    # still be unbounded): require the Limit line to appear before any
    # join/generate/expand/union line in the root-first subtree text.
    lines = subtree.splitlines()
    limit_idx = next(
        (i for i, ln in enumerate(lines) if "GlobalLimit" in ln or "LocalLimit" in ln),
        None,
    )
    if limit_idx is None:
        return False
    above = "\n".join(lines[:limit_idx])
    return not any(w in above for w in ("Join", "Generate", "Expand", "Union"))


BASELINE_PATH = os.path.join(REPO, "tools", "plan_baseline.json")


def exchange_counts(plan: str) -> dict[str, int]:
    """(shuffle, broadcast) exchange counts of a plan string. Shuffle =
    'Exchange <partitioning>' nodes; 'BroadcastExchange' contains the
    substring 'Exchange' and must not be double-counted."""
    shuffles = sum(
        1
        for ln in plan.splitlines()
        if re.search(r"(^|[:+]- )Exchange ", ln) and "BroadcastExchange" not in ln
    )
    broadcasts = sum(1 for ln in plan.splitlines() if "BroadcastExchange" in ln)
    return {"shuffles": shuffles, "broadcasts": broadcasts}


def check_exchanges(
    name: str, counts: dict[str, int], baseline: dict[str, dict[str, int]]
) -> list[str]:
    """Regression guard (round-4 VERDICT #6): the anti-pattern scan
    can't see a refactor that grows 1 shuffle into 3 — each query's
    expected Exchange/Broadcast counts are recorded from its current
    clean plan and any INCREASE fails the audit (a decrease is an
    improvement: rerecord with --update). New queries without a
    recorded row are reported for recording, not failed."""
    base = baseline.get(name)
    if base is None:
        return []
    bad = []
    for kind in ("shuffles", "broadcasts"):
        if counts[kind] > base[kind]:
            bad.append(
                f"{name}: {kind} regressed {base[kind]} -> {counts[kind]} "
                "(unplanned exchange; rerecord with --update only if intended)"
            )
    return bad


def audit_one(name: str, plan: str) -> list[str]:
    bad = []
    if "CartesianProduct" in plan:
        bad.append(f"{name}: CartesianProduct in executed plan")
    for sub in _broadcast_build_subtrees(plan):
        if not _bounded(sub):
            bad.append(
                f"{name}: BroadcastNestedLoopJoin with unbounded build side "
                f"({sub.splitlines()[0][:70]}...)"
            )
    if "BatchEvalPython" in plan:
        bad.append(f"{name}: row-at-a-time BatchEvalPython (non-Arrow UDF)")
    for fact in FACTS:
        for m in re.finditer(
            rf"FileScan parquet \[([^\]]*)\][^\n]*{fact}\.parquet", plan
        ):
            ncols = len([c for c in m.group(1).split(",") if c.strip()])
            if ncols >= FULL_WIDTH[fact]:
                bad.append(
                    f"{name}: full-width {fact} scan ({ncols} cols — projection "
                    "did not reach the scan)"
                )
    return bad


def main() -> int:
    import json

    args = [a for a in sys.argv[1:] if a != "--update"]
    update = "--update" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    cases = registry()
    views(spark, sf_dir)
    P.warm_udfs(spark)
    for fact in FACTS:
        FULL_WIDTH[fact] = len(spark.table(fact).columns)
    # exchange baseline is sf-specific (broadcast-vs-shuffle join picks
    # depend on planning-time size stats): one baseline entry PER sf,
    # and a missing entry for the audited sf is a hard failure — a CI
    # default-sf change must not silently disable the regression guard
    # (round-5 advisor finding).
    baseline: dict = {}
    per_sf: dict[str, dict] = {}
    missing_baseline = False
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as fh:
            rec = json.load(fh)
        # migrate the legacy single-sf shape {sf_dir, counts} in place
        per_sf = rec.get("baselines") or (
            {rec["sf_dir"]: rec.get("counts", {})} if rec.get("sf_dir") else {}
        )
        baseline = per_sf.get(sf_dir, {})
        if not baseline and not update:
            missing_baseline = True
    violations: list[str] = []
    recorded: dict[str, dict[str, int]] = {}
    unrecorded: list[str] = []
    for name in HEADLINERS:
        df = cases[name].spark(spark, sf_dir)
        # executedPlan without running AQE re-plan; good enough for the
        # static anti-patterns this audit targets
        plan = df._jdf.queryExecution().executedPlan().toString()
        violations.extend(audit_one(name, plan))
        counts = exchange_counts(plan)
        recorded[name] = counts
        violations.extend(check_exchanges(name, counts, baseline))
        if baseline and name not in baseline:
            unrecorded.append(name)
    spark.stop()
    if update:
        per_sf[sf_dir] = recorded
        with open(BASELINE_PATH, "w") as fh:
            json.dump({"baselines": per_sf}, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"exchange baseline recorded: {len(recorded)} queries @ {sf_dir}")
    elif missing_baseline:
        violations.append(
            f"no exchange baseline recorded for {sf_dir} — the regression "
            "guard did not run; record one with --update"
        )
    elif unrecorded:
        print(f"note: {len(unrecorded)} new queries lack an exchange baseline "
              f"({', '.join(unrecorded[:5])}...): run with --update")
    if violations:
        print(f"PLAN AUDIT: {len(violations)} violation(s)")
        for v in violations:
            print("  " + v)
        return 1
    print(
        f"plan audit clean: {len(HEADLINERS)} headline queries, 0 anti-patterns"
        + (f", exchange counts vs baseline OK ({len(baseline)})" if baseline else "")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
