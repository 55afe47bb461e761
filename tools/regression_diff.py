#!/usr/bin/env python
"""Mechanical bench regression diff: BENCH_LOCAL.json vs the per-query
table recorded in BASELINE_LOCAL.md.

BASELINE_LOCAL.md promises "diff the next round's BENCH_LOCAL.json
against this file to detect regressions mechanically" — this is that
diff. Policy mirrors the doc: sub-second entries carry ~0.2-0.3 s
run-to-run noise, so only >=2x AND >=+0.3 s moves are flagged as
signal; new/removed queries are listed informationally.

Run: python tools/regression_diff.py
Exit code 1 if any query regressed past the threshold.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Intended slowdowns: plan-shape trades where the bench-scale wall
# GREW because a single-task scale-killer was replaced by a
# distributed form with more (parallel) stages. Each entry names the
# trade; an entry whose query no longer trips the threshold is
# reported as stale so the ledger self-cleans. This mirrors
# bench.EXCLUDED's no-silent-caps discipline: a regression is either
# flagged or explained, never suppressed silently.
_TRADE = (
    "round-9 plan trade: Exchange-SinglePartition window (one task "
    "sorts the whole relation — the 100 TB failure) replaced by a "
    "range-partitioned two-phase scan; +{n} parallel stages at bench "
    "scale, wall now bounded by the largest PARTITION, not the table"
)
INTENDED: dict[str, str] = {
    # profile_range_boundaries / profile_key_skew dropped (round 10):
    # under the warm-cache protocol they no longer cross the 2x/+0.3s
    # threshold, and the tool itself flags stale entries.
    "orders_rfm_segments": _TRADE.format(n="3x6"),
    "corpus_quality_curriculum": _TRADE.format(n=6),
    "events_gaps_islands": _TRADE.format(n=4),
    "layout_zorder_skipping": _TRADE.format(n=4),
}


def baseline_table() -> dict[str, float]:
    out: dict[str, float] = {}
    with open(os.path.join(REPO, "BASELINE_LOCAL.md")) as fh:
        for line in fh:
            m = re.match(r"\| (\w+) \| ([\d.]+) \|", line)
            if m:
                out[m.group(1)] = float(m.group(2))
    return out


def main() -> int:
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
        bench = json.load(fh)["queries"]
    base = baseline_table()

    regressed: list[tuple[str, float, float]] = []
    intended_hit: set[str] = set()
    for name, now in sorted(bench.items()):
        was = base.get(name)
        if was is None:
            print(f"  new      {name}: {now:.3f}s (no baseline)")
        elif now >= 2 * was and now - was >= 0.3:
            if name in INTENDED:
                intended_hit.add(name)
                print(
                    f"  intended {name}: {was:.3f}s -> {now:.3f}s — "
                    f"{INTENDED[name]}"
                )
            else:
                regressed.append((name, was, now))
    for name in sorted(set(INTENDED) - intended_hit):
        if name in bench and name in base:
            print(
                f"  stale-ledger {name}: no longer regresses "
                f"({base[name]:.3f}s -> {bench[name]:.3f}s) — drop its "
                "INTENDED entry"
            )
    for name in sorted(set(base) - set(bench)):
        print(f"  removed  {name} (baseline {base[name]:.3f}s)")

    common = [n for n in bench if n in base]
    t_now = sum(bench[n] for n in common)
    t_was = sum(base[n] for n in common)
    print(
        f"common {len(common)} queries: {t_was:.1f}s baseline -> {t_now:.1f}s now "
        f"({t_now / t_was:.2f}x)"
    )
    for name, was, now in sorted(regressed, key=lambda r: r[1] - r[2]):
        print(f"  REGRESSED {name}: {was:.3f}s -> {now:.3f}s ({now / was:.1f}x)")
    if not regressed:
        print("no per-query regression past the 2x/+0.3s threshold")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
