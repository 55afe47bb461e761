"""Mail-ready HTML run report (reference parity: Helper.cs:606-1292
SendResultMail / AnalyzeWorkflowRun / AnalyzeLevel / AnalyzeWorkflowError,
with the table layouts of code/www/resultTable*.txt + failureTable*.txt
and the body frame of code/www/diz_mail.html).

The reference assembles the report row-at-a-time from five SQL round
trips per hierarchy node; here the heavy lifting is the SAME Spark SQL
the analytics plane already answers (runlog.current_state_sql /
error_messages_sql — A1/A2/A6), collected ONCE per level, and the HTML
assembly is pure driver-side string work over those few rows. A run
report covers one workflow run — dozens of rows, never data-plane
volume — so driver-side rendering is the right scale shape; the
analytics stay distributed.

Faithful behaviors (same decision points, original markup):

- status header: "Erfolgreich" / green (#44d478) vs "Fehlgeschlagen" /
  red (#c4254a)  (Helper.cs:644-686);
- module table: one row per package ("Paket <id>"), its realizations
  ("Umsetzung <id>") then their steps ("Schritt <id>") nested directly
  under it — the AnalyzeWorkflowRun → AnalyzeLevel(1) → AnalyzeLevel(2)
  walk (Helper.cs:806-905, 1115-1292);
- duration label: "<m> Minuten" when the rounded minutes > 0 else
  "<s> Sekunden"; open runs measure against *now*; missing start → "-"
  (Helper.cs:710-717, 855-895);
- failure table only on failure, empty string when no errors — columns
  Prozess | Modul | Befehl | Anforderung | Von | Bis | Dauer |
  Meldungstext | Fehlertext | Fehler-ID (Helper.cs:915-1113);
- "-" coalescing for missing timestamps/commands throughout.
"""

from __future__ import annotations

import html
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import SparkSession

from . import runlog as RL


@dataclass(frozen=True)
class DistributionEntry:
    """One conf.Email_Verteiler_Workflow row (the reference's mail
    distribution table): recipient address plus the three routing flags
    (Workflow.cs:1296-1317 success path, :1561-1581 failure path)."""

    workflow_id: object
    empfaenger: str
    cc: bool = False  # True → CC list, else TO list
    nur_fehler: bool = False  # True → error mails only
    ist_aktiv: bool = True


def resolve_recipients(
    distribution: list[DistributionEntry], workflow_id: object, success: bool
) -> tuple[list[str], list[str]]:
    """C10: the reference's recipient resolution, both paths.

    - rows are scoped ``ETL_Workflow_ID = id AND Ist_Aktiv = 1`` (the
      WHERE of both queries);
    - the SUCCESS mail skips ``Nur_Fehler`` recipients (the ``continue``
      in Workflow.cs:1307-1308); the FAILURE/abort mail has no such
      filter (Workflow.cs:1561-1581) — error-only subscribers get it;
    - ``CC`` splits the CC list from the TO list, preserving row order
      (the reference appends in DataTable row order, no dedup).

    Returns (to, cc). The caller sends only when ``to`` is non-empty —
    the reference's ``_emailReceiver.Count > 0`` guard; CC-only
    distributions produce no mail."""
    to: list[str] = []
    cc: list[str] = []
    for row in distribution:
        if row.workflow_id != workflow_id or not row.ist_aktiv:
            continue
        if success and row.nur_fehler:
            continue
        (cc if row.cc else to).append(row.empfaenger)
    return to, cc

_TD = (
    '<td style="font-family: Arial, sans-serif; font-size: 12px; '
    'color: #434C5E; padding: 4px;">{}</td>'
)
_TH = (
    '<th style="font-family: Arial, sans-serif; font-size: 12px; '
    'font-weight: bold; color: #434C5E; text-align: left; padding: 4px;">{}</th>'
)

_LEVEL_LABEL = {"package": "Paket", "realization": "Umsetzung", "step": "Schritt"}


def _esc(v: object) -> str:
    s = "-" if v is None or v == "" else str(v)
    return html.escape(s, quote=False)


def _parse_ts(v: str | None) -> datetime | None:
    if not v:
        return None
    try:
        return datetime.fromisoformat(str(v))
    except ValueError:
        return None


def duration_label(start: str | None, end: str | None, now: datetime | None = None) -> str:
    """The reference's duration cell rule (Helper.cs:855-895): rounded
    minutes when > 0, else rounded seconds; an open run (no end) counts
    up to *now*; no start → '-'. ``now`` is injectable for tests."""
    t0 = _parse_ts(start)
    if t0 is None:
        return "-"
    t1 = _parse_ts(end) or now or datetime.now()
    secs = (t1 - t0).total_seconds()
    mins = round(secs / 60)
    return f"{mins} Minuten" if mins > 0 else f"{round(secs)} Sekunden"


def _state_rows(spark: SparkSession, level: str) -> list:
    return sorted(
        spark.sql(RL.current_state_sql(level)).collect(), key=lambda r: r["run_id"]
    )


def _module_row(level: str, row, now: datetime | None) -> str:
    cells = [
        f"{_LEVEL_LABEL[level]} {row['run_id']}",
        row["name"],  # escaped once by the i < 2 branch of the join below
        _esc(row["Startzeitpunkt"]),
        _esc(row["Endzeitpunkt"]),
        duration_label(row["Startzeitpunkt"], row["Endzeitpunkt"], now),
        {True: "True", False: "False", None: "-"}[row["Erfolgreich"]],
    ]
    return "<tr>" + "".join(_TD.format(_esc(c) if i < 2 else c) for i, c in enumerate(cells)) + "</tr>"


def result_table_html(
    spark: SparkSession, now: datetime | None = None,
    workflow_run_id: object | None = None,
) -> str:
    """AnalyzeWorkflowRun: the \"Ausgeführte Module\" table — package
    rows each followed by their realization rows, each followed by that
    realization's step rows (depth-first, the reference's recursion
    order). Empty string when no packages ran (Helper.cs:826-829)."""
    pkgs = _state_rows(spark, "package")
    if workflow_run_id is not None:
        # scope to the reported run's subtree — the log is append-only
        # across runs, and an unscoped table would mix every run's
        # modules into one report
        pkgs = [p for p in pkgs if p["parent_id"] == workflow_run_id]
    if not pkgs:
        return ""
    reals = _state_rows(spark, "realization")
    steps = _state_rows(spark, "step")
    rows: list[str] = []
    for p in pkgs:
        rows.append(_module_row("package", p, now))
        for r in (x for x in reals if x["parent_id"] == p["run_id"]):
            rows.append(_module_row("realization", r, now))
            for s in (x for x in steps if x["parent_id"] == r["run_id"]):
                rows.append(_module_row("step", s, now))
    header = "<tr>" + "".join(
        _TH.format(h) for h in ("Module", "Information", "Von", "Bis", "Dauer", "Ergebnis")
    ) + "</tr>"
    return (
        '<h3 style="font-family: Arial, sans-serif; color: #434C5E;">'
        "Ausgeführte Module</h3>\n"
        '<table width="100%" cellpadding="0" cellspacing="0">\n'
        + header + "\n" + "\n".join(rows) + "\n</table>"
    )


def error_table_html(
    spark: SparkSession, now: datetime | None = None,
    run_ids: set | None = None,
) -> str:
    """AnalyzeWorkflowError: error messages joined to their failed run
    rows across all four levels (the A1 union, runlog.error_messages_sql
    == Helper.cs:922-1025), one table row per message. Empty string when
    there are no errors (Helper.cs:1036-1039)."""
    errs = spark.sql(RL.error_messages_sql()).collect()
    if run_ids is not None:
        errs = [e for e in errs if e["run_id"] in run_ids]
    if not errs:
        return ""
    state = {
        (lv, r["run_id"]): r for lv in RL.LEVELS for r in _state_rows(spark, lv)
    }
    rows = []
    for i, e in enumerate(sorted(errs, key=lambda r: (r["Zeitpunkt"], r["run_id"])), start=1):
        run = state.get((e["level"], e["run_id"]))
        start = run["Startzeitpunkt"] if run else None
        end = run["Endzeitpunkt"] if run else None
        req = run["Anforderungszeitpunkt"] if run else None
        cells = [
            str(e["run_id"]),
            f"{_LEVEL_LABEL.get(e['level'], 'Workflow')} {e['run_id']}",
            _esc(e["sql_text"]),
            _esc(req),
            _esc(start),
            _esc(end),
            duration_label(start, end, now),
            _esc(e["Meldung"]),
            _esc(run["name"] if run else None),
            str(i),
        ]
        rows.append("<tr>" + "".join(_TD.format(c) for c in cells) + "</tr>")
    header = "<tr>" + "".join(
        _TH.format(h)
        for h in (
            "Prozess", "Modul", "Befehl", "Anforderung", "Von", "Bis",
            "Dauer", "Meldungstext", "Fehlertext", "Fehler-ID",
        )
    ) + "</tr>"
    return (
        '<h3 style="font-family: Arial, sans-serif; color: #c4254a;">'
        "Fehlermeldungen</h3>\n"
        '<table width="100%" cellpadding="0" cellspacing="0">\n'
        + header + "\n" + "\n".join(rows) + "\n</table>"
    )


def render_run_report(
    spark: SparkSession,
    workflow_id: object,
    success: bool,
    *,
    takeover_from: str = "-",
    takeover_to: str = "-",
    now: datetime | None = None,
) -> str:
    """The full mail body (diz_mail.html frame): status banner, workflow
    id, execution window + duration from the WORKFLOW level's current
    state, the module table, and — on failure only — the error table.
    Returns a self-contained HTML document (inline styles only, as a
    mail client requires)."""
    wf = _state_rows(spark, "workflow")
    # report THE requested run: run_id match first, else the LATEST
    # workflow row — wf[0] would be the FIRST run ever logged in an
    # append-only multi-run log, reporting run 1's window for run N
    sel = next((r for r in wf if r["run_id"] == workflow_id), wf[-1] if wf else None)
    exec_start = sel["Startzeitpunkt"] if sel else None
    exec_end = sel["Endzeitpunkt"] if sel else None
    wf_run_id = sel["run_id"] if sel else None
    # the run's subtree ids scope the module and error tables
    subtree: set = set()
    if wf_run_id is not None:
        subtree = {wf_run_id}
        for lv in ("package", "realization", "step"):
            subtree |= {
                r["run_id"] for r in _state_rows(spark, lv)
                if r["parent_id"] in subtree
            }
    status, color = ("Erfolgreich", "#44d478") if success else ("Fehlgeschlagen", "#c4254a")
    error_table = "" if success else error_table_html(
        spark, now, run_ids=subtree or None
    )
    return f"""<!DOCTYPE html>
<html><body style="font-family: Arial, sans-serif; color: #434C5E;">
<h2 style="color: {color};">{status}</h2>
<p>Report Workflow {_esc(workflow_id)}</p>
<table cellpadding="4">
<tr>{_TD.format("Start")}{_TD.format(_esc(exec_start))}</tr>
<tr>{_TD.format("Ende")}{_TD.format(_esc(exec_end))}</tr>
<tr>{_TD.format("Dauer")}{_TD.format(duration_label(exec_start, exec_end, now))}</tr>
<tr>{_TD.format("Übernahme von")}{_TD.format(_esc(takeover_from))}</tr>
<tr>{_TD.format("Übernahme bis")}{_TD.format(_esc(takeover_to))}</tr>
</table>
{result_table_html(spark, now, workflow_run_id=wf_run_id)}
{error_table}
</body></html>"""


def finalize_run(
    spark: SparkSession,
    workflow_id: object,
    success: bool,
    out_dir: str,
    *,
    takeover_from: str = "-",
    takeover_to: str = "-",
    distribution: list[DistributionEntry] | None = None,
) -> dict[str, object]:
    """Write the end-of-run artifacts the reference mails out
    (SendResultMail, Helper.cs:606-806: HTML body + the run-graph PNG
    attachment) into ``out_dir`` — the sandbox has no SMTP, so the
    artifact directory IS the outbox; an operator wires delivery.
    Returns {"html": path, "png": path} plus — when a distribution
    list is given (C10) — the resolved "to"/"cc" recipient lists and
    the "send" decision, written alongside as an envelope JSON so the
    outbox artifact is deliverable as-is. Call after the runlog views
    are registered (the orchestrator's close-out does both)."""
    import json
    import os

    from . import viz

    os.makedirs(out_dir, exist_ok=True)
    html_path = os.path.join(out_dir, f"run_report_{workflow_id}.html")
    png_path = os.path.join(out_dir, f"run_graph_{workflow_id}.png")
    with open(html_path, "w") as fh:
        fh.write(
            render_run_report(
                spark,
                workflow_id,
                success,
                takeover_from=takeover_from,
                takeover_to=takeover_to,
            )
        )
    viz.render_run_graph_png(spark, png_path)
    out: dict[str, object] = {"html": html_path, "png": png_path}
    if distribution is not None:
        to, cc = resolve_recipients(distribution, workflow_id, success)
        envelope = {
            "workflow_id": str(workflow_id),
            "success": success,
            "to": to,
            "cc": cc,
            # _emailReceiver.Count > 0: CC-only → no mail
            "send": len(to) > 0,
        }
        env_path = os.path.join(out_dir, f"envelope_{workflow_id}.json")
        with open(env_path, "w") as fh:
            json.dump(envelope, fh, indent=1)
        out.update(envelope)
        out["envelope"] = env_path
    return out
