"""Orchestrator semantics: DAG order (O6), priority barriers (O7), step
order (O8), admission caps (O1/O2), table-write serialization (O5),
Parallelsperre (O3), cancellation + fallback (O9), D9 dummy steps."""

from __future__ import annotations

import threading
import time

import pytest

from etl_service_spark.plans.orchestrator import (
    CycleError,
    Orchestrator,
    Package,
    Realization,
    Step,
    Workflow,
    topological_waves,
)
from etl_service_spark.plans.statemachine import Stage, WorkflowState


def _wf(packages, master, fallback=None):
    return Workflow("wf", {p.name: p for p in packages}, master, fallback)


def test_topological_waves_order():
    pkgs = {
        "a": Package("a"),
        "b": Package("b", depends_on=("a",)),
        "c": Package("c", depends_on=("a",)),
        "d": Package("d", depends_on=("b", "c")),
    }
    assert topological_waves(pkgs) == [["a"], ["b", "c"], ["d"]]


def test_cycle_detection():
    pkgs = {"a": Package("a", depends_on=("b",)), "b": Package("b", depends_on=("a",))}
    with pytest.raises(CycleError):
        topological_waves(pkgs)


def test_dependencies_run_before_package():
    order = []
    mk = lambda n: Step(n, lambda n=n: order.append(n))
    wf = _wf(
        [
            Package("stage", (Realization("r1", (mk("s_stage"),)),)),
            Package("master", (Realization("r2", (mk("s_master"),)),), depends_on=("stage",)),
        ],
        "master",
    )
    state = WorkflowState("wf")
    state.transition(Stage.SCHEDULED)
    report = Orchestrator(4).run(wf, state)
    assert order == ["s_stage", "s_master"]
    assert state.stage is Stage.FINISHED
    assert report.package_order == ["stage", "master"]


def test_priority_barrier():
    events = []
    lock = threading.Lock()

    def act(tag):
        def _():
            with lock:
                events.append(("start", tag))
            time.sleep(0.05)
            with lock:
                events.append(("end", tag))

        return _

    pkg = Package(
        "p",
        (
            Realization("low_a", (Step("a", act("a")),), priority=1),
            Realization("low_b", (Step("b", act("b")),), priority=1),
            Realization("high", (Step("c", act("c")),), priority=2),
        ),
    )
    Orchestrator(8).run(_wf([pkg], "p"))
    # c must start only after both priority-1 steps ended
    c_start = events.index(("start", "c"))
    assert ("end", "a") in events[:c_start] and ("end", "b") in events[:c_start]


def test_per_realization_cap():
    running = 0
    peak = 0
    lock = threading.Lock()

    def act():
        nonlocal running, peak
        with lock:
            running += 1
            peak = max(peak, running)
        time.sleep(0.03)
        with lock:
            running -= 1

    steps = tuple(Step(f"s{i}", act, order=i) for i in range(6))
    pkg = Package("p", (Realization("r", steps, max_parallel_steps=2),))
    Orchestrator(8).run(_wf([pkg], "p"))
    assert peak <= 2


def test_table_lock_serializes_writers():
    active_per_table: dict[str, int] = {"t": 0}
    violations = []
    lock = threading.Lock()

    def writer():
        with lock:
            active_per_table["t"] += 1
            if active_per_table["t"] > 1:
                violations.append(True)
        time.sleep(0.02)
        with lock:
            active_per_table["t"] -= 1

    steps = tuple(Step(f"w{i}", writer, target_tables=("t",)) for i in range(5))
    pkg = Package("p", (Realization("r", steps),))
    Orchestrator(8).run(_wf([pkg], "p"))
    assert not violations


def test_exclusive_step_runs_alone():
    active = 0
    excl_overlap = []
    lock = threading.Lock()

    def normal():
        nonlocal active
        with lock:
            active += 1
        time.sleep(0.02)
        with lock:
            active -= 1

    def exclusive():
        with lock:
            if active > 0:
                excl_overlap.append(active)
        time.sleep(0.02)

    steps = tuple(Step(f"n{i}", normal) for i in range(4)) + (
        Step("x", exclusive, exclusive=True),
    )
    pkg = Package("p", (Realization("r", steps),))
    Orchestrator(8).run(_wf([pkg], "p"))
    assert not excl_overlap


def test_failure_cancels_and_runs_fallback():
    ran = []

    def boom():
        raise RuntimeError("step failed")

    wf = _wf(
        [
            Package("main", (Realization("r", (Step("bad", boom),)),)),
            Package("cleanup", (Realization("fb", (Step("fallback_step", lambda: ran.append("fb")),)),)),
        ],
        "main",
        fallback="cleanup",
    )
    state = WorkflowState("wf")
    state.transition(Stage.SCHEDULED)
    report = Orchestrator(4).run(wf, state)
    assert state.stage is Stage.FAILED
    assert report.failed == ["bad"]
    assert report.fallback_ran and ran == ["fb"]


def test_dummy_step_d9():
    """D9 TEST command: sleep N seconds (CommandExecuter.cs:28-33)."""
    t0 = time.monotonic()
    pkg = Package("p", (Realization("r", (Step("sleep", lambda: time.sleep(0.1)),)),))
    Orchestrator(2).run(_wf([pkg], "p"))
    assert time.monotonic() - t0 >= 0.1


def test_fair_pool_set_in_step_threads(spark):
    """O1 Spark half: step actions see their workflow's FAIR pool in
    the thread-local scheduler property."""
    seen = []

    def probe():
        seen.append(spark.sparkContext.getLocalProperty("spark.scheduler.pool"))

    wf = Workflow(
        name="POOLED",
        packages={"P": Package(name="P", realizations=[
            Realization(name="R", steps=[Step(name="S", action=probe)])
        ])},
        master="P",
    )
    Orchestrator(max_threads=2).run(wf, spark=spark)
    assert seen == ["wf_POOLED"]


def test_concurrent_workflows_get_own_pools(spark):
    """Two workflows running concurrently on ONE orchestrator must not
    cross-assign scheduler pools (pool ctx is call-chain state, not
    instance state)."""
    import threading
    import time as _time

    seen = {}

    def probe(name):
        def go():
            _time.sleep(0.2)  # force overlap
            seen[name] = spark.sparkContext.getLocalProperty("spark.scheduler.pool")
        return go

    def wf(name):
        return Workflow(
            name=name,
            packages={"P": Package(name="P", realizations=[
                Realization(name="R", steps=[Step(name=f"S_{name}", action=probe(name))])
            ])},
            master="P",
        )

    orch = Orchestrator(max_threads=4)
    ts = [
        threading.Thread(target=orch.run, args=(wf(n),), kwargs={"spark": spark})
        for n in ("A", "B")
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert seen == {"A": "wf_A", "B": "wf_B"}


def test_running_spark_job_is_cancelled_on_abort(spark):
    """O9's Spark half (reference aborts mid-step, Step.cs:888-1060):
    when a step fails, a concurrently RUNNING step's Spark job is
    killed via cancelJobGroup — not left to run to completion — and
    the fallback package still runs (in its own job group)."""
    ran = []
    started = threading.Event()

    def long_job():
        started.set()
        # ~minutes of sha2 work uncancelled; killed in seconds
        spark.range(0, 10**11, 1, 8).selectExpr(
            "count(if(sha2(cast(id as string), 256) = '', 1, null)) c"
        ).collect()

    def boom():
        started.wait(30)
        time.sleep(1)  # let the long job actually start running
        raise RuntimeError("step failed")

    def fb():
        # fallback runs Spark work AFTER the cancel cascade
        ran.append(spark.range(10).count())

    wf = _wf(
        [
            Package(
                "main",
                (
                    Realization("r1", (Step("long", long_job),)),
                    Realization("r2", (Step("bad", boom),)),
                ),
            ),
            Package("cleanup", (Realization("fbr", (Step("fb_step", fb),)),)),
        ],
        "main",
        fallback="cleanup",
    )
    t0 = time.monotonic()
    report = Orchestrator(4).run(wf, spark=spark)
    elapsed = time.monotonic() - t0
    assert report.failed == ["bad"]
    assert "long" not in report.succeeded  # the job did not run to completion
    assert "long" in report.skipped  # recorded as cancelled, not failed
    assert report.fallback_ran and ran == [10]
    assert elapsed < 120, f"cancellation did not kill the running job ({elapsed:.0f}s)"


def test_admission_cap_shrinks_mid_run():
    """C9 hot-reload, shrink half (Processor.cs:1216-1231): cap 3 -> 1
    while 3 steps run; the runners finish untouched, every admission
    AFTER the change obeys the new cap."""
    orch = Orchestrator(3)
    running: set[str] = set()
    post_shrink_peak = 0
    shrunk = threading.Event()
    cond = threading.Condition()
    go = {f"s{i}": threading.Event() for i in range(8)}

    def act(name):
        def _():
            nonlocal post_shrink_peak
            with cond:
                running.add(name)
                if shrunk.is_set():
                    post_shrink_peak = max(post_shrink_peak, len(running))
                cond.notify_all()
            go[name].wait(30)
            with cond:
                running.discard(name)
        return _

    steps = tuple(Step(n, act(n)) for n in go)
    pkg = Package("p", (Realization("r", steps),))

    def controller():
        with cond:
            cond.wait_for(lambda: len(running) == 3, timeout=30)
            first = set(running)
        orch.set_max_threads(1)
        shrunk.set()
        for n in first:
            go[n].set()
        released = set(first)
        while len(released) < len(go):
            with cond:
                cond.wait_for(
                    lambda: any(n not in released for n in running), timeout=30
                )
                nxt = next(n for n in running if n not in released)
            released.add(nxt)
            go[nxt].set()

    t = threading.Thread(target=controller)
    t.start()
    report = orch.run(_wf([pkg], "p"))
    t.join(30)
    assert sorted(report.succeeded) == sorted(go)
    assert post_shrink_peak == 1, f"post-shrink admissions ran {post_shrink_peak} wide"
    assert orch.max_threads == 1


def test_admission_cap_grows_mid_run():
    """C9 grow half: cap 1 -> 4 mid-run unblocks a workflow whose steps
    all wait for 4-wide concurrency (a fixed pool could never do this)."""
    orch = Orchestrator(1)
    running: set[str] = set()
    cond = threading.Condition()
    all_in = threading.Event()

    def act(name):
        def _():
            with cond:
                running.add(name)
                cond.notify_all()
                if len(running) == 4:
                    all_in.set()
            assert all_in.wait(30), "cap growth never admitted 4 concurrent steps"
        return _

    steps = tuple(Step(f"g{i}", act(f"g{i}")) for i in range(4))
    pkg = Package("p", (Realization("r", steps),))

    def controller():
        with cond:
            cond.wait_for(lambda: len(running) >= 1, timeout=30)
        orch.set_max_threads(4)

    t = threading.Thread(target=controller)
    t.start()
    report = orch.run(_wf([pkg], "p"))
    t.join(30)
    assert len(report.succeeded) == 4 and not report.failed


def test_step_killed_mid_snapshot_write_leaves_no_torn_table(spark, tmp_path, monkeypatch):
    """Chaos: a step dies INSIDE the snapshot store's
    staged-uncommitted window (data files written, manifest never
    committed). The orchestrator must run the run-log close-out +
    fallback package, and the table must not be torn: readers still
    see the pre-crash version, and a post-restart retry of the same
    append commits cleanly on top of it (the orphaned staged files are
    invisible — no manifest references them)."""
    from etl_service_spark.sources import snapshots

    table = str(tmp_path / "tbl")
    v1 = snapshots.commit_append(
        spark.range(10).selectExpr("id", "id * 2 AS v"), table
    )
    assert snapshots.list_versions(table) == [v1]

    # die AFTER staging, BEFORE the manifest publish — the real crash
    # window of commit_append (files land under data/<uuid>/ first)
    real_commit = snapshots._commit

    def dying_commit(*args, **kwargs):
        raise RuntimeError("killed mid-write")

    monkeypatch.setattr(snapshots, "_commit", dying_commit)

    fb_ran = []

    def append_step():
        snapshots.commit_append(
            spark.range(5).selectExpr("id + 100 AS id", "id AS v"), table
        )

    wf = _wf(
        [
            Package("main", (Realization("r", (Step("write", append_step),)),)),
            Package(
                "cleanup",
                (Realization("fb", (Step("fb_step", lambda: fb_ran.append(1)),)),),
            ),
        ],
        "main",
        fallback="cleanup",
    )
    state = WorkflowState("wf")
    state.transition(Stage.SCHEDULED)
    report = Orchestrator(2).run(wf, state)

    # close-out: failure recorded, fallback ran, state machine FAILED
    assert report.failed == ["write"]
    assert report.fallback_ran and fb_ran == [1]
    assert state.stage is Stage.FAILED

    # no torn table: version list unchanged, reads see the old data,
    # even though the dead step's files are physically on disk
    assert snapshots.list_versions(table) == [v1]
    assert snapshots.read_snapshot(spark, table).count() == 10
    import glob
    import os

    orphans = glob.glob(os.path.join(table, "data", "*"))
    assert len(orphans) == 2  # v1's stage + the dead step's stage

    # restart: the retried append commits on top of v1 cleanly
    monkeypatch.setattr(snapshots, "_commit", real_commit)
    v2 = snapshots.commit_append(
        spark.range(5).selectExpr("id + 100 AS id", "id AS v"), table
    )
    assert snapshots.list_versions(table) == [v1, v2]
    assert snapshots.read_snapshot(spark, table).count() == 15
    # time travel to the pre-crash version still works
    assert snapshots.read_snapshot(spark, table, version=v1).count() == 10

    # orphan GC: the dead step's staged files are reclaimable WITHOUT
    # expiring any version (grace=0: no writer is in flight here) —
    # versions, reads, and time travel all survive the GC
    gc = snapshots.remove_orphan_files(table, orphan_grace_s=0)
    assert gc["orphans_removed"] >= 1 and gc["bytes_reclaimed"] > 0
    assert gc["versions_kept"] == [v1, v2]
    assert len(glob.glob(os.path.join(table, "data", "*"))) == 2  # v1+v2 stages
    assert snapshots.read_snapshot(spark, table).count() == 15
    assert snapshots.read_snapshot(spark, table, version=v1).count() == 10
    # idempotent: a second pass finds nothing
    assert snapshots.remove_orphan_files(table, orphan_grace_s=0)["orphans_removed"] == 0
