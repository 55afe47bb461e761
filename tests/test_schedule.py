"""Scheduler calculus edge cases (SURVEY §7.3.4): interval advance,
nth-week, last-of-month, k-per-week mapping, immediate run, backoff."""

from __future__ import annotations

from datetime import datetime, time

import pytest

from etl_service_spark.plans.schedule import (
    FailureBackoff,
    ScheduleError,
    SchedulePlan,
    advance_interval,
    next_calendar_run,
    should_run_immediately,
    week_of_month,
)


def test_daily_advance():
    plan = SchedulePlan(interval="Täglich", anfangsdatum=datetime(2026, 1, 1), startzeit=time(2, 0))
    assert advance_interval(plan, datetime(2026, 8, 13, 1, 0)) == datetime(2026, 8, 13, 2, 0)
    assert advance_interval(plan, datetime(2026, 8, 13, 2, 0)) == datetime(2026, 8, 14, 2, 0)


def test_before_start_returns_start():
    plan = SchedulePlan(interval="Stunde", anfangsdatum=datetime(2026, 9, 1), startzeit=time(5, 30))
    assert advance_interval(plan, datetime(2026, 8, 1)) == datetime(2026, 9, 1, 5, 30)


def test_minute_intervals():
    plan = SchedulePlan(interval="DreiMinuten", anfangsdatum=datetime(2026, 1, 1), startzeit=time(0, 0))
    nxt = advance_interval(plan, datetime(2026, 1, 1, 0, 4))
    assert nxt == datetime(2026, 1, 1, 0, 6)


def test_monthly_end_of_month_clamp():
    plan = SchedulePlan(interval="Monat", anfangsdatum=datetime(2026, 1, 31), startzeit=time(1, 0))
    nxt = advance_interval(plan, datetime(2026, 2, 1))
    assert nxt == datetime(2026, 2, 28, 1, 0)  # clamped (2026 not a leap year)


def test_yearly():
    plan = SchedulePlan(interval="Jährlich", anfangsdatum=datetime(2024, 2, 29), startzeit=time(0, 0))
    assert advance_interval(plan, datetime(2024, 3, 1)) == datetime(2025, 2, 28, 0, 0)


def test_unknown_interval_raises():
    with pytest.raises(ScheduleError):
        advance_interval(SchedulePlan(interval="Never"), datetime(2026, 1, 1))


def test_calendar_weekday_mask():
    # only Wednesdays (index 2)
    plan = SchedulePlan(
        interval="Manuell",
        anfangsdatum=datetime(2026, 8, 1),
        startzeit=time(9, 0),
        weekdays=tuple(i == 2 for i in range(7)),
        an_jedem_tag=False,
    )
    nxt = next_calendar_run(plan, datetime(2026, 8, 13))  # a Thursday
    assert nxt == datetime(2026, 8, 19, 9, 0)
    assert nxt.weekday() == 2


def test_calendar_last_day_of_month():
    plan = SchedulePlan(
        interval="Manuell",
        anfangsdatum=datetime(2026, 1, 1),
        startzeit=time(23, 0),
        monatsletzter=True,
    )
    assert next_calendar_run(plan, datetime(2026, 2, 10)) == datetime(2026, 2, 28, 23, 0)


def test_calendar_nth_week():
    # second week of the month, Mondays only
    plan = SchedulePlan(
        interval="Manuell",
        anfangsdatum=datetime(2026, 8, 1),
        startzeit=time(6, 0),
        weekdays=tuple(i == 0 for i in range(7)),
        an_jedem_tag=False,
        woche_des_monats=2,
    )
    nxt = next_calendar_run(plan, datetime(2026, 8, 11))
    assert nxt.weekday() == 0 and week_of_month(nxt.date()) == 2


def test_calendar_week5_means_last_week():
    plan = SchedulePlan(
        interval="Manuell",
        anfangsdatum=datetime(2026, 8, 1),
        startzeit=time(6, 0),
        woche_des_monats=5,
    )
    nxt = next_calendar_run(plan, datetime(2026, 8, 1))
    # in the last 7 days of its month (Scheduler.cs:1841-1847 guard)
    from datetime import timedelta

    assert (nxt + timedelta(days=7)).month != nxt.month


def test_tageswiederholung_spreads_day():
    plan = SchedulePlan(
        interval="Manuell",
        anfangsdatum=datetime(2026, 8, 1),
        startzeit=time(0, 0),
        tageswiederholung=4,
    )
    runs = []
    now = datetime(2026, 8, 13, 0, 0)
    for _ in range(4):
        now = next_calendar_run(plan, now)
        runs.append(now)
    assert [r.time() for r in runs] == [time(6, 0), time(12, 0), time(18, 0), time(0, 0)]


def test_wochenwiederholung_maps_first_n_weekdays():
    plan = SchedulePlan(
        interval="Manuell",
        anfangsdatum=datetime(2026, 8, 1),
        startzeit=time(8, 0),
        wochenwiederholung=2,  # → Monday + Tuesday (first 2 allowed weekdays)
    )
    seen = set()
    now = datetime(2026, 8, 10)
    for _ in range(4):
        now = next_calendar_run(plan, now)
        seen.add(now.weekday())
    assert seen == {0, 1}


def test_endedatum_bound():
    plan = SchedulePlan(
        interval="Manuell",
        anfangsdatum=datetime(2026, 1, 1),
        endedatum=datetime(2026, 1, 5),
        startzeit=time(12, 0),
    )
    with pytest.raises(ScheduleError):
        next_calendar_run(plan, datetime(2026, 1, 6))


def test_sofort_ausfuehrung():
    plan = SchedulePlan(sofort_ausfuehrung=True)
    assert should_run_immediately(plan, ever_executed=False)
    assert not should_run_immediately(plan, ever_executed=True)


def test_failure_backoff_deactivates_after_10():
    b = FailureBackoff()
    for _ in range(9):
        b.record_failure("wf")
    assert b.active
    b.record_failure("wf")
    assert not b.active and len(b.notifications) == 1


def test_scheduler_loop_tick_runs_due_and_backs_off():
    """Processor.CheckForExecution: a due workflow runs and logs a T4
    instance; a failing one is deactivated after the T5 limit."""
    from datetime import datetime

    from etl_service_spark.plans.orchestrator import (
        Orchestrator,
        Package,
        Realization,
        Step,
        Workflow,
    )
    from etl_service_spark.plans.schedule import FailureBackoff, SchedulePlan
    from etl_service_spark.plans.scheduler_loop import ScheduledWorkflow, SchedulerLoop

    ran = []

    def make_wf(name, action):
        return Workflow(
            name=name,
            packages={
                "P": Package(name="P", realizations=[
                    Realization(name="R", steps=[Step(name="S", action=action)])
                ])
            },
            master="P",
        )

    loop = SchedulerLoop(Orchestrator(max_threads=2))
    plan = SchedulePlan(sofort_ausfuehrung=True)
    loop.add(ScheduledWorkflow("good", plan, make_wf("good", lambda: ran.append("good"))))

    def boom():
        raise RuntimeError("step exploded")

    bad = ScheduledWorkflow(
        "bad", SchedulePlan(sofort_ausfuehrung=True), make_wf("bad", boom),
        backoff=FailureBackoff(limit=2),
    )
    # Sofort only fires when never executed; force re-due per tick for
    # the failure loop by resetting ever_executed below.
    loop.add(bad)

    now = datetime(2026, 3, 2, 9, 0)
    loop.run_tick(now)
    assert ran == ["good"]
    inst = {i.workflow: i for i in loop.instances}
    assert inst["good"].Ausgefuehrt and inst["good"].Erfolgreich
    assert inst["bad"].Erfolgreich is False and bad.backoff.failures == 1

    bad.ever_executed = False  # make it due again
    loop.run_tick(now)
    assert bad.backoff.failures == 2 and not bad.active  # T5 deactivated
    bad.ever_executed = False
    n_inst = len(loop.instances)
    loop.run_tick(now)
    assert len(loop.instances) == n_inst  # deactivated: never scheduled again
    # the good workflow ran exactly once (Sofort consumed)
    assert ran == ["good"]


def test_monthly_day31_schedule_does_not_drift(sample_plan=None):
    """Regression: iterating _add_months on the clamped candidate
    compounded the clamp — a day-31 monthly schedule permanently
    drifted to the 28th after February. Candidates now derive from the
    original start each step."""
    from datetime import datetime

    from etl_service_spark.plans.schedule import SchedulePlan, advance_interval

    plan = SchedulePlan(
        interval="Monat",
        anfangsdatum=datetime(2026, 1, 31),
        startzeit=datetime(2026, 1, 31, 2, 0).time(),
    )
    assert advance_interval(plan, datetime(2026, 2, 1)) == datetime(2026, 2, 28, 2, 0)
    # March has a 31st again — must NOT stay stuck on the 28th
    assert advance_interval(plan, datetime(2026, 3, 1)) == datetime(2026, 3, 31, 2, 0)
    assert advance_interval(plan, datetime(2026, 4, 1)) == datetime(2026, 4, 30, 2, 0)


def test_expired_manual_plan_does_not_halt_scheduler():
    """Regression: ScheduleError from an expired 'Manuell' plan escaped
    run_tick and halted scheduling for every workflow."""
    from datetime import datetime, time

    from etl_service_spark.plans.orchestrator import Package, Realization, Step, Workflow
    from etl_service_spark.plans.schedule import SchedulePlan
    from etl_service_spark.plans.scheduler_loop import ScheduledWorkflow, SchedulerLoop

    ran = []

    def wf(name):
        return Workflow(name, {
            "P": Package("P", (Realization("R", (Step("S", lambda: ran.append(name)),)),))
        }, "P")

    loop = SchedulerLoop()
    expired = SchedulePlan(
        interval="Manuell",
        anfangsdatum=datetime(2020, 1, 1),
        startzeit=time(2, 0),
        endedatum=datetime(2020, 1, 2),
    )
    loop.add(ScheduledWorkflow("dead", expired, wf("dead")))
    good = SchedulePlan(
        interval="Sofort", anfangsdatum=datetime(2026, 1, 1), startzeit=time(2, 0),
        sofort_ausfuehrung=True,
    )
    loop.add(ScheduledWorkflow("live", good, wf("live")))
    loop.run_tick(datetime(2026, 3, 2, 9, 0))
    assert ran == ["live"]  # expired plan skipped, scheduler alive


def test_scheduled_occurrence_fires_once_across_fast_ticks():
    """Regression: two run_ticks inside one tick window both saw the
    same due Anforderungszeitpunkt and double-fired the workflow; the
    T4 instance log now dedups scheduled occurrences."""
    from datetime import datetime, time

    from etl_service_spark.plans.orchestrator import Package, Realization, Step, Workflow
    from etl_service_spark.plans.schedule import SchedulePlan
    from etl_service_spark.plans.scheduler_loop import ScheduledWorkflow, SchedulerLoop

    ran = []
    wf = Workflow("w", {
        "P": Package("P", (Realization("R", (Step("S", lambda: ran.append(1)),)),))
    }, "P")
    loop = SchedulerLoop(tick_seconds=10)
    plan = SchedulePlan(
        interval="Täglich", anfangsdatum=datetime(2026, 3, 1), startzeit=time(2, 0)
    )
    sw = ScheduledWorkflow("w", plan, wf)
    sw.ever_executed = True  # past the sofort path
    loop.add(sw)
    loop.run_tick(datetime(2026, 3, 2, 1, 59, 52))
    loop.run_tick(datetime(2026, 3, 2, 1, 59, 57))  # same due occurrence
    assert len(ran) == 1


def test_scheduler_tick_hot_reloads_config():
    """C9: every tick re-reads the config source (UpdateParameters
    before CheckForExecution, Processor.cs:1174-1247) and applies it to
    the LIVE orchestrator; missing rows fall back to the read defaults
    (1/False/5), unparseable values keep the default and error-log
    'minor' instead of crashing the tick."""
    from etl_service_spark.plans.orchestrator import Orchestrator
    from etl_service_spark.plans.scheduler_loop import SchedulerLoop

    rows = [("Anzahl_ETL_Threads", "3"), ("Debug", "1"), ("LogInterval", "7")]
    loop = SchedulerLoop(Orchestrator(10), config_source=lambda: list(rows))
    now = datetime(2026, 4, 1, 9, 0)
    loop.run_tick(now)
    assert loop.orchestrator.max_threads == 3
    assert loop.debug is True and loop.log_interval == 7
    # start=True logs every parameter once (the reference's start branch)
    assert "PARAMETER Anzahl_ETL_Threads: 3" in loop.param_log
    assert "PARAMETER Debug: True" in loop.param_log

    # change mid-service: threads re-read, absent params -> read defaults
    rows[:] = [("Anzahl_ETL_Threads", "5")]
    loop.run_tick(datetime(2026, 4, 1, 9, 0, 10))
    assert loop.orchestrator.max_threads == 5
    assert loop.debug is False and loop.log_interval == 5
    assert "PARAMETER Anzahl_ETL_Threads: 5" in loop.param_log

    # unparseable value: minor error, read default applies
    n_log = len(loop.param_log)
    rows[:] = [("Anzahl_ETL_Threads", "not_a_number"), ("Unbekannt", "9")]
    loop.run_tick(datetime(2026, 4, 1, 9, 0, 20))
    assert loop.orchestrator.max_threads == 1
    assert any("minor" in m for m in loop.param_log[n_log:])

    # a failing config QUERY must not halt the tick (reference logs
    # minor and keeps the defaults)
    def boom():
        raise RuntimeError("db down")

    loop.config_source = boom
    loop.run_tick(datetime(2026, 4, 1, 9, 0, 30))
    assert loop.orchestrator.max_threads == 1
    assert any("querying configurations failed" in m for m in loop.param_log)


def test_scheduler_without_config_source_keeps_cap():
    from etl_service_spark.plans.orchestrator import Orchestrator
    from etl_service_spark.plans.scheduler_loop import SchedulerLoop

    loop = SchedulerLoop(Orchestrator(6))
    loop.run_tick(datetime(2026, 4, 1, 9, 0))
    assert loop.orchestrator.max_threads == 6


# ---------------------------------------------------------------- durability
# Worker.cs:45-51 boot recovery / Worker.cs:78-103 StopAsync close-out
# over the durable pc.ETL_Zeitplan_Ausfuehrungen twin
# (plans/instance_store.py).


def _simple_wf(name, action):
    from etl_service_spark.plans.orchestrator import (
        Package, Realization, Step, Workflow,
    )

    return Workflow(
        name,
        {"P": Package("P", (Realization("R", (Step("S", action),)),))},
        "P",
    )


def test_crash_restart_resets_stale_instance_rows(tmp_path):
    """Kill the service between instance-start and finish; the next
    boot must close the half-open row (Ausgefuehrt=1, Erfolgreich
    keeps the DDL's DEFAULT(0) = failed) and must NOT refire the
    occurrence the dead process already requested."""
    from etl_service_spark.plans.instance_store import InstanceStore
    from etl_service_spark.plans.scheduler_loop import (
        ScheduledWorkflow, SchedulerLoop,
    )

    store = InstanceStore(str(tmp_path / "instances.jsonl"))
    ran: list[str] = []
    now = datetime(2026, 3, 2, 8, 59, 55)
    plan = SchedulePlan(
        interval="Täglich", anfangsdatum=datetime(2026, 3, 1),
        startzeit=time(9, 0),
    )

    class Killed(BaseException):  # a SIGKILL stand-in: not an Exception
        pass

    class DyingOrchestrator:
        max_threads = 1

        def set_max_threads(self, n):
            pass

        def run(self, wf):
            raise Killed()

    loop_a = SchedulerLoop(orchestrator=DyingOrchestrator(), instance_store=store)
    loop_a.add(ScheduledWorkflow("w", plan, _simple_wf("w", lambda: ran.append("a"))))
    with pytest.raises(Killed):
        loop_a.run_tick(now)  # crash: start was persisted, finish never

    rows = store.load()
    assert len(rows) == 1 and rows[0].Ausgefuehrt is False  # half-open on disk

    # ---- service restart (fresh process: new loop over the same store)
    loop_b = SchedulerLoop(instance_store=store)
    assert loop_b.recovered_stale == 1
    rows = store.load()
    assert rows[0].Ausgefuehrt is True
    assert rows[0].Erfolgreich is False  # crashed run reads as failed
    # boot reset is the RAW update — no NEW Letzte_Aenderung stamp: the
    # row keeps the stamp written when the dead process recorded the
    # start (StopAsync's stamped variant is tested separately)
    assert rows[0].Letzte_Aenderung == now

    # same occurrence must not refire after restart
    loop_b.add(ScheduledWorkflow("w", plan, _simple_wf("w", lambda: ran.append("b"))))
    loop_b.run_tick(now)
    assert ran == []  # request 09:00 already in the durable log
    # but the NEXT day's occurrence fires normally
    loop_b.run_tick(datetime(2026, 3, 3, 8, 59, 55))
    assert ran == ["b"]
    rows = store.load()
    assert len(rows) == 2 and all(r.Ausgefuehrt for r in rows)
    assert rows[-1].Erfolgreich is True


def test_graceful_stop_stamps_letzte_aenderung(tmp_path):
    """StopAsync: same UPDATE as the boot reset but WITH the
    Letzte_Aenderung / Letzte_Aenderung_Nutzer stamp."""
    from etl_service_spark.plans.instance_store import InstanceStore
    from etl_service_spark.plans.scheduler_loop import (
        ScheduleInstance, SchedulerLoop,
    )

    store = InstanceStore(str(tmp_path / "instances.jsonl"))
    open_inst = ScheduleInstance(
        "w", Anforderungszeitpunkt=datetime(2026, 3, 2, 9, 0),
        Startzeitpunkt=datetime(2026, 3, 2, 9, 0, 1),
    )
    store.record(open_inst, "etl_service", datetime(2026, 3, 2, 9, 0, 1))

    loop = SchedulerLoop(instance_store=store, service_user="svc_user")
    # constructing the loop already ran the BOOT reset (no stamp);
    # reopen a row to exercise the STOP path
    open2 = ScheduleInstance("w2", Anforderungszeitpunkt=datetime(2026, 3, 2, 9, 5))
    store.record(open2, "svc_user", datetime(2026, 3, 2, 9, 5))
    stop_at = datetime(2026, 3, 2, 9, 10)
    assert loop.stop(stop_at) == 1
    by_wf = {r.workflow: r for r in store.load()}
    assert by_wf["w2"].Ausgefuehrt is True
    assert by_wf["w2"].Letzte_Aenderung == stop_at
    assert by_wf["w2"].Letzte_Aenderung_Nutzer == "svc_user"
    # idempotent: nothing left open
    assert loop.stop(stop_at) == 0


def test_instance_store_torn_tail_and_compact(tmp_path):
    """A crash mid-append tears only the final journal line: load()
    drops it (an unacknowledged write). compact() folds the journal to
    one row per instance, atomically."""
    from etl_service_spark.plans.instance_store import InstanceStore
    from etl_service_spark.plans.scheduler_loop import ScheduleInstance

    path = tmp_path / "instances.jsonl"
    store = InstanceStore(str(path))
    a = ScheduleInstance("w", Anforderungszeitpunkt=datetime(2026, 3, 2, 9, 0))
    store.record(a, "u", datetime(2026, 3, 2, 9, 0))
    a.Ausgefuehrt = True
    a.Erfolgreich = True
    a.Endzeitpunkt = datetime(2026, 3, 2, 9, 1)
    store.record(a, "u", datetime(2026, 3, 2, 9, 1))
    with open(path, "a") as fh:
        fh.write('{"workflow": "w", "anforderung": "2026-03-02T09:0')  # torn

    rows = store.load()
    assert len(rows) == 1 and rows[0].Ausgefuehrt is True  # fold + torn drop

    assert store.compact() == 1
    with open(path) as fh:
        lines = [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == 1
    assert store.load()[0].Erfolgreich is True

    # a corrupt NON-final line is foreign interference, not a crash —
    # refuse to fold around it
    with open(path, "a") as fh:
        fh.write("garbage\n")
        fh.write('{"workflow":"w2","anforderung":"2026-03-02T10:00:00","ausgefuehrt":false}\n')
    with pytest.raises(ValueError, match="corrupt journal"):
        store.load()


def test_instance_store_single_writer_lock(tmp_path):
    """The DB table the reference journals to is multi-writer because
    the DB serializes it; the file journal gets the same guarantee
    from an fcntl writer lock held for the store's lifetime. While a
    peer LIVES, a second exclusive store cannot even open — so its
    reset_stale can never close a row the live peer just opened."""
    from etl_service_spark.plans.instance_store import (
        InstanceStore, StoreLockedError,
    )
    from etl_service_spark.plans.scheduler_loop import ScheduleInstance

    path = str(tmp_path / "instances.jsonl")
    a = InstanceStore(path)
    live = ScheduleInstance("w", Anforderungszeitpunkt=datetime(2026, 3, 2, 9, 0))
    a.record(live, "svc_a", datetime(2026, 3, 2, 9, 0))  # half-open, LIVE

    with pytest.raises(StoreLockedError):
        InstanceStore(path)  # a second boot fails fast, row stays open
    assert a.load()[0].Ausgefuehrt is False

    # read-only observer: may watch, may never mutate
    obs = InstanceStore(path, exclusive=False)
    assert len(obs.load()) == 1
    with pytest.raises(StoreLockedError):
        obs.record(live, "obs", datetime(2026, 3, 2, 9, 1))
    with pytest.raises(StoreLockedError):
        obs.reset_stale()
    with pytest.raises(StoreLockedError):
        obs.compact()

    # peer exits -> clean takeover; only NOW may the boot reset close
    # the (genuinely dead) row
    a.close()
    with pytest.raises(StoreLockedError):
        a.record(live, "svc_a", datetime(2026, 3, 2, 9, 2))  # closed store
    b = InstanceStore(path, wait=True)
    assert b.reset_stale() == 1
    assert b.load()[0].Ausgefuehrt is True
    b.close()


def test_instance_store_survives_real_sigkill(tmp_path):
    """Process-level chaos: a CHILD process appends journal rows and
    prints each acknowledged (post-fsync) sequence number; the parent
    SIGKILLs it mid-stream. Recovery contract: the kernel released the
    dead writer's flock (no wedged lock), every acknowledged write is
    present after the fold (fsync durability), load() never raises (a
    torn unacknowledged tail is dropped), and the next boot's
    reset_stale closes the dead process's half-open rows."""
    import os
    import signal
    import subprocess
    import sys

    path = str(tmp_path / "instances.jsonl")
    child_src = """
import sys
from datetime import datetime, timedelta
from etl_service_spark.plans.instance_store import InstanceStore
from etl_service_spark.plans.scheduler_loop import ScheduleInstance

store = InstanceStore(sys.argv[1])
t0 = datetime(2026, 3, 2, 9, 0)
i = 0
while True:
    inst = ScheduleInstance(
        "w%d" % i, Anforderungszeitpunkt=t0 + timedelta(minutes=i),
        Startzeitpunkt=t0 + timedelta(minutes=i),
    )
    store.record(inst, "chaos_child", t0 + timedelta(minutes=i))
    print(i, flush=True)  # ACK: the fsync for row i returned
    i += 1
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src, path],
        stdout=subprocess.PIPE,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        text=True,
    )
    acked = []
    for line in proc.stdout:
        acked.append(int(line))
        if len(acked) >= 20:
            proc.send_signal(signal.SIGKILL)  # mid-stream, no cleanup
            break
    proc.wait()
    assert proc.returncode == -signal.SIGKILL
    assert acked == list(range(20))

    from etl_service_spark.plans.instance_store import InstanceStore
    from etl_service_spark.plans.scheduler_loop import SchedulerLoop

    # the dead child's flock must NOT wedge the successor
    store = InstanceStore(path)
    rows = store.load()  # never raises: torn tail (if any) is dropped
    got = {r.workflow for r in rows}
    assert {f"w{i}" for i in acked} <= got  # every ACKed write survived
    assert all(not r.Ausgefuehrt for r in rows)  # all died half-open
    loop = SchedulerLoop(instance_store=store)  # boot reset
    assert loop.recovered_stale == len(rows)
    assert all(r.Ausgefuehrt and r.Erfolgreich is False for r in store.load())
    store.close()


def test_instance_store_autocompacts_on_load(tmp_path):
    """A long-lived service's journal grows one line per state change;
    past autocompact_lines, load() folds it back to one line per
    instance without losing a row (the compact() machinery, now
    self-triggering)."""
    from etl_service_spark.plans.instance_store import InstanceStore
    from etl_service_spark.plans.scheduler_loop import ScheduleInstance

    path = tmp_path / "instances.jsonl"
    store = InstanceStore(str(path), autocompact_lines=50)
    t0 = datetime(2026, 3, 2, 9, 0)
    for i in range(120):  # 120 state changes over 3 instances
        inst = ScheduleInstance(
            "w%d" % (i % 3), Anforderungszeitpunkt=t0,
            Startzeitpunkt=t0, Ausgefuehrt=(i % 2 == 0),
        )
        store.record(inst, "u", t0)
    n_lines_before = sum(1 for x in open(path) if x.strip())
    assert n_lines_before == 120
    rows = store.load()  # crosses the threshold -> auto-compact
    assert len(rows) == 3
    n_lines_after = sum(1 for x in open(path) if x.strip())
    assert n_lines_after == 3
    assert store.load() == rows  # stable after the rewrite
    # an OBSERVER never rewrites the file it watches
    for i in range(60):
        store.record(rows[0].to_instance(), "u", t0)
    store.close()
    obs = InstanceStore(str(path), exclusive=False, autocompact_lines=10)
    obs.load()
    assert sum(1 for x in open(path) if x.strip()) == 63
