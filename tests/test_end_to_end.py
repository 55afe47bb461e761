"""SURVEY §7.2 minimum end-to-end slice as one integration test:

one workflow / one package / one realization / two steps —
step 1 `SQL_TARGET` (overwrite-truncate of the target),
step 2 `COPY` + `Zeitscheibe` with `##Uebernahme_von/bis##`
placeholders copying an orders window into a parquet target with audit
columns — executed by the Orchestrator with run-log rows at all four
hierarchy levels, then validated through the run-log analytics.

This exercises E1, D1, D2, D3, D10, C8, O6-O10 and the runlog plane in
one pass — the spine everything else hangs off.
"""

from __future__ import annotations

import os
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from etl_service_spark.functions.placeholders import resolve_placeholders
from etl_service_spark.operators.align import AuditContext
from etl_service_spark.operators.copy import TakeoverWindow, copy_data_timesliced, write_copy
from etl_service_spark.plans.orchestrator import (
    Orchestrator,
    Package,
    Realization,
    Step,
    Workflow,
)
from etl_service_spark.plans.runlog import RunLog, register_runlog_views, run_tree_sql
from etl_service_spark.plans.statemachine import Stage, WorkflowState
from etl_service_spark.sources.catalog import load_table


def test_minimum_end_to_end_slice(spark, sf_dir, tmp_path):
    target = str(tmp_path / "target")
    log = RunLog(str(tmp_path / "runlog"))
    t0 = datetime(2026, 1, 1, 2, 0)

    wf_run = log.open("workflow", "WF_E2E", None, t0)
    pkg_run = log.open("package", "P_MAIN", wf_run, t0)
    real_run = log.open("realization", "R_MAIN", pkg_run, t0)

    # E1: the Befehl carries reference-grammar placeholders
    befehl = resolve_placeholders(
        "COPY orders WHERE o_orderdate BETWEEN '##Uebernahme_von##' AND '##Uebernahme_bis##'",
        {
            "Uebernahme_von": "19950101",
            "Uebernahme_bis": "19951231",
            "Workflow_ID": str(wf_run),
        },
    )
    assert "19950101" in befehl and "##" not in befehl

    window = TakeoverWindow(datetime(1995, 1, 1), datetime(1995, 12, 31))
    orders = load_table(spark, sf_dir, "orders")
    expected = orders.filter(
        F.col("o_orderdate").between("1995-01-01T00:00:00", "1995-12-31T23:59:59")
    ).count()

    copied_rows = {}

    def step_truncate():  # D3 SQL_TARGET: overwrite-truncate
        spark.createDataFrame([], "o_orderkey long").write.mode("overwrite").parquet(target)

    def step_copy():  # D2+D10: sliced copy with audit columns
        run_id = log.open("step", "S_COPY", real_run, t0)
        try:
            from pyspark.sql.types import StringType, StructField, StructType, TimestampNTZType

            # D10: destination schema = source cols + engine audit cols
            dst_schema = StructType(
                list(orders.schema.fields)
                + [
                    StructField("Nutzer", StringType()),
                    StructField("Abfragezeitpunkt", TimestampNTZType()),
                    StructField("Datenproduzent", StringType()),
                    StructField("Zeitscheibe_Monat", StringType()),
                ]
            )
            sliced = copy_data_timesliced(
                orders,
                "o_orderdate",
                window,
                dst_schema=dst_schema,
                audit=AuditContext(
                    user="etl_user", query_time="2026-01-01 00:00:00", producer="e2e"
                ),
            )
            n = write_copy(sliced, target, mode="overwrite", slice_partitioned=True)
            copied_rows["n"] = n
            log.close("step", run_id, success=True, expected_rows=n)
        except Exception:
            log.close("step", run_id, success=False)
            raise

    wf = Workflow(
        name="WF_E2E",
        packages={
            "P_MAIN": Package(
                name="P_MAIN",
                realizations=[
                    Realization(
                        name="R_MAIN",
                        steps=[
                            Step(name="S_TRUNCATE", action=step_truncate, order=1,
                                 target_tables=("target",)),
                            Step(name="S_COPY", action=step_copy, order=2,
                                 target_tables=("target",)),
                        ],
                    )
                ],
            )
        },
        master="P_MAIN",
    )
    state = WorkflowState("WF_E2E")
    state.transition(Stage.SCHEDULED)
    report = Orchestrator(max_threads=4).run(wf, state)
    assert report.failed == [] and state.stage == Stage.FINISHED

    log.close("realization", real_run, success=True)
    log.close("package", pkg_run, success=True)
    log.close("workflow", wf_run, success=True, expected_rows=copied_rows["n"])

    # data plane: the target holds exactly the takeover window,
    # partitioned by month slice, with audit columns populated
    out = spark.read.parquet(target)
    assert out.count() == expected == copied_rows["n"]
    assert "Nutzer" in out.columns and out.select("Nutzer").first()[0] == "etl_user"
    # partition-column inference reads the month key back as int
    months = {str(r[0]) for r in out.select("Zeitscheibe_Monat").distinct().collect()}
    assert months == {f"1995{m:02d}" for m in range(1, 13)}
    # slice partitioning is physical: one directory per month
    assert any(d.startswith("Zeitscheibe_Monat=") for d in os.listdir(target))

    # observability plane: the 4-level hierarchy is queryable
    log.flush(spark)
    register_runlog_views(spark, str(tmp_path / "runlog"))
    tree = {r["node"]: r["parent"] for r in spark.sql(run_tree_sql()).collect()}
    assert f"S{1}" not in tree  # sanity: ids are opaque, shape below
    # workflow node is a root; step hangs off realization off package
    roots = [n for n, p in tree.items() if p == "ROOT"]
    assert len(roots) == 1 and len(tree) == 4

    # reporting plane composes on the same runlog: mail-ready HTML
    # (success branch → no failure table) and the raster run graph
    from etl_service_spark.plans.report import render_run_report
    from etl_service_spark.plans.viz import render_run_graph_png

    html_doc = render_run_report(spark, "e2e", success=True)
    assert "Erfolgreich" in html_doc and "Ausgeführte Module" in html_doc
    assert "Fehlermeldungen" not in html_doc
    png = render_run_graph_png(spark)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")


def test_module_row_escapes_name_exactly_once():
    """'A&B' must render as 'A&amp;B', not 'A&amp;amp;B' — the name cell
    is escaped only by the join, never pre-escaped."""
    from etl_service_spark.plans.report import _module_row

    row = {
        "run_id": 7,
        "name": "A&B <x>",
        "Startzeitpunkt": "2026-01-01 00:00:00",
        "Endzeitpunkt": "2026-01-01 00:05:00",
        "Erfolgreich": True,
    }
    html = _module_row("package", row, None)
    assert "A&amp;B &lt;x&gt;" in html
    assert "amp;amp" not in html


def test_report_duration_rule_matches_registry_sql_form():
    """ana_report_rows computes the duration cell with half-up integer
    math; the renderer's duration_label uses Python round (banker's).
    They agree everywhere except an exact half-minute tie, which the
    registry's synthetic seconds (secs % 60 <= 28) cannot produce —
    verified over the full synthetic domain."""
    from datetime import datetime, timedelta

    from etl_service_spark.plans.report import duration_label

    for k in range(0, 3000):
        secs = (k % 90) * 60 + (k % 29)
        sql_mins = (secs + 30) // 60
        sql_label = f"{sql_mins} Minuten" if sql_mins > 0 else f"{secs} Sekunden"
        t0 = datetime(2026, 1, 1)
        py_label = duration_label(str(t0), str(t0 + timedelta(seconds=secs)))
        assert py_label == sql_label, (secs, py_label, sql_label)


def test_build_corpus_ledger_and_idempotent_rebuild(spark, tmp_path):
    """The materializing corpus build: every stage's removal is
    accounted in the ledger, the published snapshot matches the ledger,
    no benchmark/contaminated doc survives, and a rebuild publishes an
    identical next version (time travel keeps the first)."""
    from etl_service_spark.operators.dedup import contamination_staged
    from etl_service_spark.plans.corpus_build import build_corpus
    from etl_service_spark.sources import snapshots

    sf_dir = "/root/testdata/sf0.01"
    table = str(tmp_path / "corpus")
    rep = build_corpus(spark, sf_dir, table)

    # monotone ledger: each stage can only remove
    seq = [
        rep["n_input"],
        rep["n_after_exact"],
        rep["n_after_neardup"],
        rep["n_after_decontamination"],
        rep["n_after_quality"],
    ]
    assert all(a >= b for a, b in zip(seq, seq[1:])), seq
    assert rep["n_after_neardup"] < rep["n_input"]  # the corpus has dups

    cur = snapshots.read_snapshot(spark, table, rep["version"])
    assert cur.count() == rep["n_after_quality"] == sum(rep["n_per_split"].values())
    # holdout + decontamination actually hold
    assert cur.filter("doc_id < 50").count() == 0
    flagged = {
        r.train_id for r in contamination_staged(spark).select("train_id").collect()
    }
    survivors = {r.doc_id for r in cur.select("doc_id").collect()}
    assert not (flagged & survivors)
    assert set(rep["n_per_split"]) <= {"train", "val", "test"}

    rep2 = build_corpus(spark, sf_dir, table)  # rebuild
    assert rep2["version"] == rep["version"] + 1
    again = snapshots.read_snapshot(spark, table, rep2["version"])
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in cur.collect()}
    assert snapshots.list_versions(table) == [1, 2]
    # the ledger is committed INSIDE each version's manifest, atomic
    # with the data — and matches the returned report minus the
    # post-commit version field
    for v, r in ((1, rep), (2, rep2)):
        led = snapshots.read_manifest_extra(table, v)["ledger"]
        assert led == {k: x for k, x in r.items() if k != "version"}


def test_build_corpus_crash_window_keeps_ledger_atomic(spark, tmp_path, monkeypatch):
    """Round-5 (VERDICT #7): a crash BETWEEN the corpus publish and the
    report write used to leave a published version without its ledger.
    Now the ledger rides inside the manifest: fail the derived
    report_v*.json write and the committed version still carries its
    complete ledger; no version can exist ledgerless."""
    from etl_service_spark.plans import corpus_build
    from etl_service_spark.sources import snapshots

    table = str(tmp_path / "corpus")

    def boom(table_dir, version, report):
        raise OSError("disk full right after the commit")

    monkeypatch.setattr(corpus_build, "_write_report_json", boom)
    with pytest.raises(OSError):
        corpus_build.build_corpus(spark, "/root/testdata/sf0.01", table)

    # the version IS published (atomic commit happened first)...
    assert snapshots.list_versions(table) == [1]
    led = snapshots.read_manifest_extra(table, 1)["ledger"]
    # ...and its ledger is complete: every stage count + split census
    assert {
        "n_input", "n_after_exact", "n_after_neardup",
        "n_after_decontamination", "n_after_quality", "n_per_split",
    } <= set(led)
    assert snapshots.read_snapshot(spark, table, 1).count() == led["n_after_quality"]
    # the derived convenience file is absent — and rebuildable
    assert not any(f.startswith("report_") for f in os.listdir(table))
    monkeypatch.undo()
    corpus_build._write_report_json(table, 1, dict(led, version=1))
    assert any(f.startswith("report_") for f in os.listdir(table))


def test_corpus_build_runs_under_the_orchestrator(spark, tmp_path):
    """The same stage closures run as an orchestrator workflow (one
    package per stage, chained depends_on, exclusive publish): the run
    succeeds end-to-end, executes the stages in dependency order, and
    produces the identical ledger and published rows as the sequential
    runner."""
    from etl_service_spark.plans.corpus_build import (
        build_corpus,
        corpus_build_workflow,
    )
    from etl_service_spark.plans.orchestrator import Orchestrator
    from etl_service_spark.sources import snapshots

    sf_dir = "/root/testdata/sf0.01"
    seq_table = str(tmp_path / "seq")
    wf_table = str(tmp_path / "wf")

    seq_report = build_corpus(spark, sf_dir, seq_table)
    wf, ctx = corpus_build_workflow(spark, sf_dir, wf_table)
    run = Orchestrator().run(wf)

    assert not run.failed and not run.skipped
    order = run.package_order
    assert order.index("ingest") < order.index("exact_dedup") < order.index(
        "neardup_collapse"
    ) < order.index("decontaminate") < order.index("quality_gate") < order.index(
        "publish"
    )
    # identical ledger modulo the table-specific fields
    drop = {"version"}
    assert {k: v for k, v in ctx.report.items() if k not in drop} == {
        k: v for k, v in seq_report.items() if k not in drop
    }
    a = snapshots.read_snapshot(spark, seq_table)
    b = snapshots.read_snapshot(spark, wf_table)
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_run_tree_unroll_is_fixpoint(spark, tmp_path):
    """DETERMINISM #30: the 4-level UNION in run_tree_sql is the exact
    recursion fixpoint for this schema. Assert (a) every non-root
    node's parent exists in the tree exactly one level up, and (b) an
    additional expansion round over the emitted tree adds no rows — if
    the hierarchy ever deepens, this fails loudly and the driver-loop
    generalization documented there takes over."""
    from etl_service_spark.plans.runlog import LEVELS, RunLog, register_runlog_views, run_tree_sql

    log = RunLog(str(tmp_path / "runlog"))
    t0 = datetime(2026, 2, 1, 8, 0)
    wf_run = log.open("workflow", "WF_FIX", None, t0)
    for p in range(2):
        pkg = log.open("package", f"P{p}", wf_run, t0)
        real = log.open("realization", f"R{p}", pkg, t0)
        for s in range(2 if p else 1):
            sid = log.open("step", f"S{p}_{s}", real, t0)
            log.close("step", sid, success=True)
        log.close("realization", real, success=True)
        log.close("package", pkg, success=True)
    log.close("workflow", wf_run, success=True)
    log.flush(spark)
    register_runlog_views(spark, str(tmp_path / "runlog"))
    rows = spark.sql(run_tree_sql()).collect()
    by_node = {r["node"]: r for r in rows}
    depth = {lv: i for i, lv in enumerate(LEVELS)}
    for r in rows:
        if r["parent"] == "ROOT":
            assert r["level"] == "workflow"
            continue
        parent = by_node.get(r["parent"])
        assert parent is not None, f"dangling parent {r['parent']} of {r['node']}"
        assert depth[parent["level"]] == depth[r["level"]] - 1
    # one more expansion round: children of the deepest level — none
    deepest = [r["node"] for r in rows if r["level"] == LEVELS[-1]]
    children_of_deepest = [r for r in rows if r["parent"] in deepest]
    assert not children_of_deepest
    # and the tree is closed: every level's row count matches its view
    from etl_service_spark.plans.runlog import current_state_sql

    for lv in LEVELS:
        n_view = spark.sql(current_state_sql(lv)).count()
        n_tree = sum(1 for r in rows if r["level"] == lv)
        assert n_view == n_tree
