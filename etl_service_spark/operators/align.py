"""Schema alignment + audit columns (SURVEY §2.2 D10).

Reference: ``AddNeededColumns`` (CommandExecuter.cs:603-678) discovers
the destination schema at runtime and coerces each source batch to it:
missing destination columns are appended with defaults, three audit
columns get engine-supplied values (Nutzer = destination user,
Abfragezeitpunkt = workflow start time, Datenproduzent = destination
server identity — CommandExecuter.cs:623-651).

Spark-first: one declarative ``select`` that builds every destination
column as either the (possibly renamed) source column, an audit
expression, or a typed NULL literal. Catalyst folds this projection
into the scan — zero extra passes, no Python row loop. At 100 TB this
is a free map-side projection.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructType

AUDIT_USER = "Nutzer"
AUDIT_QUERY_TIME = "Abfragezeitpunkt"
AUDIT_PRODUCER = "Datenproduzent"


@dataclass(frozen=True)
class AuditContext:
    """Engine-supplied audit values.

    In the reference these come from the live run (destination login,
    workflow start timestamp, ``SELECT SUSER_NAME()``). They are
    injected as literals so the whole projection stays JVM-side.
    """

    user: str
    query_time: str  # ISO timestamp literal (workflow start)
    producer: str

    def exprs(self) -> dict[str, Column]:
        return {
            AUDIT_USER: F.lit(self.user),
            AUDIT_QUERY_TIME: F.lit(self.query_time).cast("timestamp_ntz"),
            AUDIT_PRODUCER: F.lit(self.producer),
        }


def align_to_schema(
    src: DataFrame,
    dst_schema: StructType,
    audit: AuditContext | None = None,
    renames: Mapping[str, str] | None = None,
) -> DataFrame:
    """Project ``src`` onto ``dst_schema``.

    - source column present (after ``renames`` source→dest mapping):
      cast to the destination type;
    - audit column: audit expression;
    - otherwise: typed NULL (reference default DBNull,
      CommandExecuter.cs:666-672).
    """
    renames = dict(renames or {})
    src_cols = {c.lower(): c for c in src.columns}
    # apply source→destination renames first (Excel mapping.csv path)
    for s, d in renames.items():
        if s.lower() in src_cols:
            src_cols[d.lower()] = src_cols.pop(s.lower())
    # audit columns match case-insensitively like source columns — a
    # case-folding catalog (NUTZER/nutzer) must not silently NULL a
    # governed audit column
    audit_exprs = {
        k.lower(): v for k, v in (audit.exprs() if audit else {}).items()
    }

    out: list[Column] = []
    for field in dst_schema.fields:
        key = field.name.lower()
        if key in src_cols:
            out.append(F.col(src_cols[key]).cast(field.dataType).alias(field.name))
        elif key in audit_exprs:
            out.append(audit_exprs[key].cast(field.dataType).alias(field.name))
        else:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
    return src.select(*out)
