"""SQL_TARGET / SQL_SOURCE execution (SURVEY §2.2 D3/D4) + dialect shim.

Reference: ``ExecuteCommand`` (CommandExecuter.cs:997-1075) pushes an
arbitrary SQL body (truncate / insert-select / stored proc) to the
destination connection; an output parameter value of −1 signals
failure (CommandExecuter.cs:1022-1041).

Spark-first: the command runs as ``spark.sql`` against the session
catalog after placeholder resolution and a minimal T-SQL→Spark dialect
translation (the reference's command bodies are MS-SQL flavored —
SURVEY §7.4 hard part (d)). Failure sentinel: any result column named
``OutputParam1`` equal to −1 raises, mirroring the reference.
"""

from __future__ import annotations

import re
from typing import Mapping

from pyspark.sql import DataFrame, SparkSession

from ..functions.placeholders import resolve_placeholders


class SqlTargetError(RuntimeError):
    pass


# minimal, well-tested T-SQL → Spark SQL rewrites for the constructs the
# reference actually uses (GETDATE, SUSER_NAME, DATEDIFF units, ISNULL,
# bracket-quoted identifiers, TOP n)
_DIALECT_RULES: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"\bGETDATE\(\)", re.I), "current_timestamp()"),
    (re.compile(r"\bSUSER_NAME\(\)", re.I), "current_user()"),
    (re.compile(r"\bISNULL\(", re.I), "coalesce("),
    (re.compile(r"\[([A-Za-z_][A-Za-z0-9_ ]*)\]"), r"`\1`"),
]
_TOP_RE = re.compile(r"\bSELECT\s+TOP\s+(\d+)\s+", re.I)
_DATEDIFF_RE = re.compile(r"\bDATEDIFF\(\s*(MINUTE|SECOND|DAY|HOUR)\s*,", re.I)

_DATEDIFF_UNIT = {
    # T-SQL DATEDIFF counts unit-boundary crossings; timestampdiff()
    # measures full elapsed units. For day-aligned run-log analytics the
    # two agree; boundary-exact semantics live in plans/analytics.py
    # where they matter (epoch-truncation arithmetic).
    "MINUTE": "MINUTE",
    "SECOND": "SECOND",
    "DAY": "DAY",
    "HOUR": "HOUR",
}


def translate_dialect(sql: str) -> str:
    out = sql
    for pat, repl in _DIALECT_RULES:
        out = pat.sub(repl, out)
    tops = _TOP_RE.findall(out)
    if tops:
        # the TOP -> trailing-LIMIT rewrite is only meaning-preserving
        # for a single OUTERMOST SELECT TOP: a TOP in a subquery or on
        # a union branch would be silently re-scoped to the whole
        # statement (wrong results, no error) — refuse those forms
        if len(tops) > 1 or not _TOP_RE.match(out.lstrip()):
            raise SqlTargetError(
                "TOP inside a subquery/union is not supported by the "
                "dialect shim; rewrite the command with LIMIT"
            )
        n = tops[0]
        # LIMIT on its own LINE so a trailing '-- comment' on the last
        # statement line cannot swallow it
        out = _TOP_RE.sub("SELECT ", out).rstrip().rstrip(";") + f"\nLIMIT {n}"
    out = _DATEDIFF_RE.sub(lambda m: f"timestampdiff({_DATEDIFF_UNIT[m.group(1).upper()]},", out)
    return out


def execute_sql_target(
    spark: SparkSession,
    command: str,
    context: Mapping[str, str] | None = None,
    *,
    translate: bool = True,
) -> DataFrame:
    """D3: resolve placeholders, translate dialect, run on the target
    (the Spark catalog). Raises SqlTargetError on the −1 sentinel."""
    # ALWAYS strict: an unresolved ##token## reaching spark.sql is at
    # best an opaque parse error and at worst silently written into
    # data when it sits inside a string literal — the reference raises
    # on unknown tokens regardless of how many parameters were bound
    sql = resolve_placeholders(command, dict(context or {}), strict=True)
    if translate:
        sql = translate_dialect(sql)
    df = spark.sql(sql)
    if "OutputParam1" in df.columns:
        # materialize ONCE before probing: the sentinel check executes
        # the plan, and an unmaterialized df would re-execute it
        # (doubled work; a non-deterministic body could even pass the
        # check yet return -1 rows to the caller). localCheckpoint, not
        # persist(): a persisted plan stays pinned in the session's
        # CacheManager forever unless explicitly unpersisted — in a
        # long-running scheduler loop every successful call leaked
        # executor storage. Checkpoint blocks are freed by the
        # ContextCleaner when the caller drops the DataFrame.
        df = df.localCheckpoint(eager=True)
        bad = df.filter(df["OutputParam1"] == -1).limit(1).count()
        if bad:
            raise SqlTargetError("target command signalled failure (OutputParam1 = -1)")
    return df
