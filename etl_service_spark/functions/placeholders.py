"""Placeholder templating (SURVEY §2.3 E1).

The reference rewrites ``##name##`` tokens in SQL command bodies and
table names before execution (Helper.cs:3152-3239, token regex
Helper.cs:3241), plus the data-plane tokens ``&&EXECUTE_FROM&&`` /
``&&EXECUTE_TO&&`` used by the time-sliced copy
(CommandExecuter.cs:105-154). Unknown tokens raise (the reference
throws NYIException).

We keep the identical token grammar so config written for the
reference resolves the same way here.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Mapping

TOKEN_RE = re.compile(r"##(?P<name>[A-Za-z_][A-Za-z0-9_]*)##")
EXEC_FROM = "&&EXECUTE_FROM&&"
EXEC_TO = "&&EXECUTE_TO&&"

# Tokens the reference knows (Helper.cs:3166-3235). Anything else → error.
KNOWN_TOKENS = {
    "Belegungszeit",
    "Uebernahme_von",
    "Uebernahme_bis",
    "Workflow_ID",
    "Prozesslaeufe_ID",
    "Zeitplan_ID",
    "ETL_Prozesslaeufe_ID",
    "ETL_Paket_Prozesslaeufe_ID",
    "ETL_Paketumsetzung_Prozesslaeufe_ID",
    "ETL_Paketschritt_Prozesslaeufe_ID",
    "Debug",
}


class UnknownPlaceholderError(KeyError):
    pass


def resolve_placeholders(
    text: str,
    context: Mapping[str, str],
    *,
    strict: bool = True,
) -> str:
    """Replace every ``##name##`` with ``context[name]``.

    ``strict=True`` (reference behavior): a token absent from both the
    context and the known-token list raises UnknownPlaceholderError; a
    known token missing a context value also raises.
    """

    def sub(m: re.Match[str]) -> str:
        name = m.group("name")
        if name in context:
            return str(context[name])
        if strict:
            raise UnknownPlaceholderError(
                f"placeholder ##{name}## has no value"
                + ("" if name in KNOWN_TOKENS else " and is not a known token")
            )
        return m.group(0)

    return TOKEN_RE.sub(sub, text)


def format_slice_bound(d: datetime, *, end: bool) -> str:
    """Reference slice-bound literal: yyyyMMdd000000 / yyyyMMdd235959
    (CommandExecuter.cs:143-154)."""
    return d.strftime("%Y%m%d") + ("235959" if end else "000000")


def resolve_execute_window(text: str, date_from: datetime, date_to: datetime) -> str:
    """Rewrite the ``&&EXECUTE_FROM&&``/``&&EXECUTE_TO&&`` tokens with the
    reference's day-bound literals."""
    return text.replace(EXEC_FROM, format_slice_bound(date_from, end=False)).replace(
        EXEC_TO, format_slice_bound(date_to, end=True)
    )
