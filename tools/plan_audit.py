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


# Grouping keys whose value domain is BOUNDED BY CONSTRUCTION — an
# aggregate keyed on (a subset of) these yields a constant-size
# relation no matter the data mass, so a single-partition window over
# it is the sanctioned offsets/cumsum shape (operators/scan.py module
# docstring), not a scale-killer:
#   _pid        — spark_partition_id() of an explicit repartition:
#                 <= n_parts rows (the two-phase scan offsets pass);
#   zval        — 16-bit Morton code of two 8-bit quantized dims:
#                 <= 65,536 (layout_zorder_skipping; domain pinned by
#                 tests/test_properties.py::test_zorder_quantized_domains);
#   qd          — one 8-bit quantized dim of the same scorer: <= 256;
#   first_digit — one character of a positive integer's rendering:
#                 <= 9 values (Benford audit);
#   source/lang — corpus catalog vocabularies (data-source labels,
#                 language codes): grow with the CATALOG, not the
#                 corpus mass (mixture/budget reports are per-source
#                 by definition);
#   arm         — A/B experiment arm: 2 values.
BOUNDED_WINDOW_KEYS = frozenset(
    {"_pid", "zval", "qd", "first_digit", "source", "lang", "arm"}
)

# Ambiguously-named keys sanctioned for SPECIFIC queries only (the
# name is generic enough that a global entry could mask a real
# violation elsewhere):
#   dedup_threshold_curve.bucket — similarity-threshold decile:
#     <= 10 values by the FLOOR(sim*10) construction;
#   emb_whitening_stats.i — embedding dimension index: bounded by the
#     (fixed) vector length.
SANCTIONED_WINDOW_KEYS: dict[str, frozenset] = {
    "dedup_threshold_curve": frozenset({"bucket"}),
    "emb_whitening_stats": frozenset({"i"}),
}

# SortAggregate prints "key=[...]" (singular); the hash variants
# "keys=[...]". output=[...] can be absent on truncated lines.
_AGG_RE = re.compile(
    r"(?:Hash|Sort|ObjectHash)Aggregate\(keys?=\[([^\]]*)\](?:.*?output=\[([^\]]*)\])?"
)
_KEYNAME_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")


def _toplevel_split(s: str) -> list[str]:
    """Split an expression list on commas outside parentheses."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            depth += ch in "([" or -(ch in ")]")
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [p for p in out if p]


def _agg_key_names(keys_str: str, output_str: str) -> set[str]:
    """Base column names of an aggregate's grouping keys. Expression
    keys are planned as an opaque ``_groupingexpression`` alias — for
    those, use the aggregate's output columns instead: the grouping
    outputs lead the output list positionally, under their SQL-visible
    aliases (e.g. keys=[_groupingexpression] output=[qd, c] -> qd)."""
    keys = _toplevel_split(keys_str)
    names = set()
    outs = _toplevel_split(output_str or "")
    for i, k in enumerate(keys):
        base = _KEYNAME_RE.findall(k)
        if any(n.startswith("_groupingexpression") for n in base) and i < len(outs):
            base = _KEYNAME_RE.findall(outs[i])
        names.update(base)
    return names


def window_violations(name: str, plan: str) -> list[str]:
    """Round-8 verdict #2: flag every Window whose input arrives
    through an Exchange SinglePartition over a relation that is not
    provably bounded — the one anti-pattern class the round-8 audit
    missed in all six of the verdict's 'weak' plans. A window's input
    chain is walked downward through pass-through nodes; hitting any
    partitioned Exchange / Join first means the window is distributed
    (fine). A SinglePartition input is sanctioned only if, below the
    exchange and before any Join, the first aggregate is keyed
    entirely by BOUNDED_WINDOW_KEYS (or is a global keys=[] aggregate),
    or the subtree scans no table at all (literal relations)."""
    lines = plan.splitlines()
    bad = []
    passthrough = ("Window", "WindowGroupLimit", "Sort ", "Project", "Filter", "Coalesce")
    for i, line in enumerate(lines):
        if not re.search(r"(^|[:+]- )Window(GroupLimit)? \[", line):
            continue
        col = _marker_col(line)
        col = -1 if col is None else col
        # walk the input chain until the node that decides partitioning
        exch_idx = exch_col = None
        for j in range(i + 1, len(lines)):
            cj = _marker_col(lines[j])
            if cj is None or cj <= col:
                break
            node = lines[j]
            if "Exchange SinglePartition" in node:
                exch_idx, exch_col = j, cj
                break
            if re.search(r"(^|[:+]- )Exchange ", node) or "BroadcastExchange" in node:
                break  # partitioned input — distributed window
            if any(w in node for w in ("Join", "Aggregate", "Scan", "Union")):
                break  # partitioning decided elsewhere; no sort exchange
            if not any(w in node for w in passthrough):
                break  # unknown node: don't guess past it
        if exch_idx is None:
            continue
        # bounding check below the single-partition exchange
        sub = []
        for j in range(exch_idx + 1, len(lines)):
            cj = _marker_col(lines[j])
            if cj is None or cj <= exch_col:
                break
            sub.append(lines[j])
        subtree = "\n".join(sub)
        if not any(w in subtree for w in ("Scan parquet", "FileScan", "ExistingRDD")):
            continue  # literal/local relation — bounded
        allowed = BOUNDED_WINDOW_KEYS | SANCTIONED_WINDOW_KEYS.get(name, frozenset())
        bounded = False
        for ln in sub:
            if "TakeOrderedAndProject" in ln or "GlobalLimit" in ln:
                bounded = True  # row count capped by an explicit limit
                break
            if "Join" in ln:
                break  # branches merge before any aggregate — unbounded
            m = _AGG_RE.search(ln)
            if m:
                keys = _agg_key_names(m.group(1), m.group(2))
                bounded = not m.group(1).strip() or (
                    bool(keys) and keys <= allowed
                )
                break
        if not bounded:
            bad.append(
                f"{name}: Window over Exchange SinglePartition on an unbounded "
                f"relation ({line.strip()[:70]}...)"
            )
    return bad


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
    bad.extend(window_violations(name, plan))
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
