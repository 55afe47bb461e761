"""DB→CSV export with the reference's formatting matrix (SURVEY §2.2 D8).

Reference: ``TransferDBToCSV`` (CommandExecuter.cs:2140-2365) runs a
command on the target and hand-serializes rows: configurable delimiter
(``Trennzeichen``), optional header (``Kopfzeile``), date format
(``Datumsformat``), text qualifier (``Textqualifizierer``), escape
char (``Escapecharacter``), null token (``Leerwert``); output filenames
are sanitized (quotes/spaces stripped, ``(?<=\\d):(?=\\d)`` → ``_``,
CommandExecuter.cs:2348,2367).

Two Spark paths:

- ``write_csv``   — the scale path: Spark's distributed CSV writer with
  the option mapping below (executor-parallel, no driver serialization).
- ``format_lines``— the fidelity path: the exact serialization rules as
  a declarative projection producing one formatted line per row
  (used by the correctness gate; also how a byte-faithful single-file
  export would be produced via ``.coalesce(1).write.text``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

_FILENAME_TIME_RE = re.compile(r"(?<=\d):(?=\d)")


@dataclass(frozen=True)
class CsvOptions:
    """Mirrors pc.ETL_Paketschritt_Parameter
    (res/pc/ETL_Paketschritt_Parameter.sql:11-25)."""

    delimiter: str = ";"
    header: bool = True
    date_format: str = "yyyy-MM-dd'T'HH:mm:ss"
    qualifier: str = '"'
    escape: str = '"'
    null_token: str = ""


def sanitize_filename(name: str) -> str:
    """CommandExecuter.cs:2348: strip quotes and spaces, replace a colon
    between digits (time-of-day in a filename) with underscore."""
    return _FILENAME_TIME_RE.sub("_", name.replace('"', "").replace("'", "").replace(" ", ""))


def write_csv(df: DataFrame, path: str, opts: CsvOptions = CsvOptions()) -> None:
    (
        df.write.mode("overwrite")
        .option("sep", opts.delimiter)
        .option("header", str(opts.header).lower())
        .option("timestampFormat", opts.date_format)
        .option("quote", opts.qualifier)
        .option("escape", opts.escape)
        .option("nullValue", opts.null_token)
        .csv(path)
    )


def _serialize_col(df: DataFrame, name: str, opts: CsvOptions) -> Column:
    """One value serialized per the reference's rules
    (CommandExecuter.cs:2285-2333): NULL → token; timestamps → the
    configured format; a string needing quoting (contains delimiter or
    qualifier) → qualifier-wrapped with inner qualifiers escaped."""
    dtype = dict(df.dtypes)[name]
    c = F.col(name)
    if dtype.startswith("timestamp"):
        text = F.date_format(c, opts.date_format)
    else:
        text = c.cast("string")
    if dtype == "string":
        # newlines MUST be quoted (an unquoted embedded newline splits
        # the physical line and breaks every CSV consumer), and a bare
        # escape char is ambiguous on read-back
        needs_quote = (
            c.contains(opts.delimiter)
            | c.contains(opts.qualifier)
            | c.contains("\n")
            | c.contains("\r")
            | c.contains(opts.escape)
        )
        # regexp_replace's REPLACEMENT is also special-char sensitive:
        # \ and $ must be doubled or an escape char of '\' vanishes
        replacement = (opts.escape + opts.qualifier).replace("\\", "\\\\").replace("$", "\\$")
        quoted = F.concat(
            F.lit(opts.qualifier),
            F.regexp_replace(c, re.escape(opts.qualifier), replacement),
            F.lit(opts.qualifier),
        )
        text = F.when(needs_quote, quoted).otherwise(text)
    return F.coalesce(text, F.lit(opts.null_token))


def format_lines(df: DataFrame, opts: CsvOptions = CsvOptions(), order_col: str | None = None) -> DataFrame:
    """Serialize every row to a single ``line`` string column (plus the
    passthrough ``order_col`` for stable comparison)."""
    parts: list[Column] = []
    for i, name in enumerate(df.columns):
        if i:
            parts.append(F.lit(opts.delimiter))
        parts.append(_serialize_col(df, name, opts))
    out = df.select(
        *( [F.col(order_col)] if order_col else [] ),
        F.concat(*parts).alias("line"),
    )
    return out


def header_line(df: DataFrame, opts: CsvOptions = CsvOptions()) -> str:
    return opts.delimiter.join(df.columns)
