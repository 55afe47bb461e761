#!/usr/bin/env python
"""Registry-wide whole-stage-codegen fallback sweep (round-10 verdict
#1 for round 11): execute EVERY registry query once and fail on any
unexpected `ERROR CodeGenerator` in the JVM log — the signature of a
generated method overflowing Janino's 64 KB limit and the stage
silently dropping to interpreted mode (round-10 found ann_range_search
running 2.2x slow this way, and ann_ivfpq_recall after it; both were
found by a MANUAL stderr bisect — this tool is that bisect, codified).

Mechanics: fd 2 is redirected to a log file BEFORE the JVM starts, so
log4j's console appender lands there; each query's stderr region is
attributed by file offset around its end-to-end execution (noop sink).
Failed codegen compilations are NOT cached by Spark's compile cache
(only successes are), so a fallback re-logs on every execution — the
offset attribution cannot miss one that fires inside the measured
query. Compile SUCCESSES are cached, so a stage shared verbatim with
an earlier query logs nothing — irrelevant, since only failures count.

Writes CODEGEN_SWEEP.json next to the repo root:
  {sf_dir, n_queries, audited: [names], unexpected: {name: [lines]},
   allowlisted_hits: {...}, allowlist: {...}, clean: bool}
The record is freshness-pinned to the registry by
tests/test_correctness.py (same discipline as PLAN_AUDIT_FULL.json):
a new registry entry without a sweep re-run fails CI.

Exit 1 on any unexpected fallback.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RECORD_PATH = os.path.join(REPO, "CODEGEN_SWEEP.json")
LOG_PATH = os.path.join(REPO, ".codegen_sweep_stderr.log")

# name -> reason. A query may ONLY appear here with a committed ledger
# rationale (ROUND*_NOTES.md); the goal state is empty. ann_ivfpq_recall
# — the last standing entry — was cleared in round 11 by materializing
# the residual arrays (similarity._ivfpq_res_rel), so a fallback
# anywhere is now a regression.
ALLOWLIST: dict[str, str] = {}

PATTERN = "ERROR CodeGenerator"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    # Redirect fd 2 BEFORE the JVM exists: the JVM inherits it, so the
    # log4j console appender (stderr) writes to the file. Keep a dup of
    # the original stderr for our own diagnostics.
    orig_stderr = os.dup(2)
    log_fd = os.open(LOG_PATH, os.O_WRONLY | os.O_CREAT | os.O_TRUNC)
    os.dup2(log_fd, 2)
    diag = os.fdopen(orig_stderr, "w")

    from etl_service_spark.functions import portable as P  # noqa: E402
    from etl_service_spark.plans.queries import registry, views  # noqa: E402
    from etl_service_spark.session import get_spark  # noqa: E402

    spark = get_spark("codegen_sweep")
    cases = registry()
    views(spark, sf_dir)
    P.warm_udfs(spark)

    def log_size() -> int:
        return os.fstat(log_fd).st_size

    def region_hits(start: int) -> list[str]:
        with open(LOG_PATH, "rb") as fh:
            fh.seek(start)
            tail = fh.read().decode("utf-8", errors="replace")
        return [
            ln.strip()[:200] for ln in tail.splitlines() if PATTERN in ln
        ]

    unexpected: dict[str, list[str]] = {}
    allowlisted_hits: dict[str, list[str]] = {}
    audited: list[str] = []
    for i, name in enumerate(cases):
        start = log_size()
        df = cases[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        hits = region_hits(start)
        audited.append(name)
        if hits:
            (allowlisted_hits if name in ALLOWLIST else unexpected)[name] = hits
            diag.write(f"[{i + 1}/{len(cases)}] {name}: {len(hits)} fallback(s)\n")
        if (i + 1) % 50 == 0:
            diag.write(f"[{i + 1}/{len(cases)}] swept\n")
            diag.flush()
    spark.stop()

    record = {
        "sf_dir": sf_dir,
        "n_queries": len(audited),
        "audited": sorted(audited),
        "unexpected": unexpected,
        "allowlisted_hits": allowlisted_hits,
        "allowlist": ALLOWLIST,
        "clean": not unexpected,
    }
    with open(RECORD_PATH, "w") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.unlink(LOG_PATH)
    if unexpected:
        diag.write(
            f"CODEGEN SWEEP: {len(unexpected)} unexpected fallback(s): "
            f"{sorted(unexpected)}\n"
        )
        diag.flush()
        print(f"codegen sweep FAILED: {sorted(unexpected)}")
        return 1
    stale = sorted(set(ALLOWLIST) - set(allowlisted_hits))
    msg = (
        f"codegen sweep clean: {len(audited)} registry queries, "
        f"0 unexpected fallbacks"
        + (f", {len(allowlisted_hits)} allowlisted" if allowlisted_hits else "")
        + (f" (stale allowlist entries: {stale})" if stale else "")
    )
    diag.write(msg + "\n")
    diag.flush()
    print(msg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
