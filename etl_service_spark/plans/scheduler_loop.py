"""The scheduler tick — Processor.CheckForExecution re-expressed.

One tick of the reference's 10-second timer (Processor.cs:1138-1152,
:1255; Scheduler.GetWorkflows, Scheduler.cs:23):

1. for every ACTIVE scheduled workflow, compute the next request time
   from its time plan (T1 interval advance / T2 Sofort / T3 calendar
   calculus — plans/schedule.py);
2. if due (request <= now + tick), insert a schedule-instance row
   (T4, pc.ETL_Zeitplan_Ausfuehrungen: Anforderungszeitpunkt set,
   Startzeitpunkt/Ausgefuehrt updated through the lifecycle);
3. run the workflow DAG via the Orchestrator, recording run-log rows;
4. failure feeds the T5 backoff — 10 consecutive failures deactivate
   the workflow (Processor.cs:168-214).

Production shape: `loop(interval=10)` — or Structured Streaming's
`Trigger.ProcessingTime` when the work itself is a stream
(streaming/events_stream.py); this driver loop is control-plane only,
O(config) per tick.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from .orchestrator import Orchestrator, RunReport, Workflow
from .schedule import (
    FailureBackoff,
    SchedulePlan,
    ScheduleError,
    advance_interval,
    next_calendar_run,
    should_run_immediately,
)


@dataclass
class ScheduleInstance:
    """pc.ETL_Zeitplan_Ausfuehrungen row (res/pc/ETL_Zeitplan_
    Ausfuehrungen.sql:11-26)."""

    workflow: str
    Anforderungszeitpunkt: datetime
    Startzeitpunkt: datetime | None = None
    Endzeitpunkt: datetime | None = None
    Ausgefuehrt: bool = False
    Erfolgreich: bool | None = None


@dataclass
class ScheduledWorkflow:
    name: str
    plan: SchedulePlan
    workflow: Workflow
    active: bool = True
    ever_executed: bool = False
    backoff: FailureBackoff = field(default_factory=FailureBackoff)


# C9 config hot-reload (Helper.cs:301-410 ReadConfigurations +
# Processor.cs:1174-1247 UpdateParameters). Two default layers, both
# faithful: READ defaults apply when conf.Konfigurationsparameter has
# no row (or the whole query fails) for a parameter; APPLY fallbacks
# are UpdateParameters' catch arms when the read value can't be used.
CONFIG_READ_DEFAULTS = {"Anzahl_ETL_Threads": 1, "Debug": False, "LogInterval": 5}
CONFIG_APPLY_FALLBACKS = {"Anzahl_ETL_Threads": 10, "Debug": True, "LogInterval": 5}

ConfigSource = Callable[[], Iterable[tuple[str, str]]]


def read_configurations(
    rows: Iterable[tuple[str, str]], errlog: list[str] | None = None
) -> dict[str, object]:
    """ReadConfigurations: (Parametername, Parameterwert) rows → typed
    parameter dict. An unparseable Parameterwert keeps the read default
    and error-logs 'minor' (the reference never crashes the tick over a
    bad config row); unknown parameter names are ignored (the switch's
    default arm)."""
    params: dict[str, object] = dict(CONFIG_READ_DEFAULTS)
    for name, wert in rows:
        try:
            if name == "Anzahl_ETL_Threads":
                params[name] = int(wert)
            elif name == "Debug":
                params[name] = int(wert) == 1  # Parameterwert is 0/1
            elif name == "LogInterval":
                params[name] = int(wert)
        except (TypeError, ValueError):
            if errlog is not None:
                errlog.append(f"minor: extracting parameter {name!r} failed")
    return params


class SchedulerLoop:
    def __init__(
        self,
        orchestrator: Orchestrator | None = None,
        tick_seconds: int = 10,
        config_source: ConfigSource | None = None,
        instance_store=None,  # plans.instance_store.InstanceStore | None
        service_user: str = "etl_service",
    ) -> None:
        self.orchestrator = orchestrator or Orchestrator()
        self.tick = timedelta(seconds=tick_seconds)
        self.workflows: dict[str, ScheduledWorkflow] = {}
        self.instances: list[ScheduleInstance] = []  # T4 log
        # Durable T4 log (pc.ETL_Zeitplan_Ausfuehrungen). Constructing
        # the loop IS service boot, so the Worker.cs:45-51 recovery
        # runs here: rows a crash left half-open (Ausgefuehrt = 0) are
        # closed as executed-and-failed BEFORE the prior log is loaded
        # — the loaded Anforderungszeitpunkt set then keeps a restarted
        # service from refiring occurrences the dead process already
        # requested.
        self.store = instance_store
        self.service_user = service_user
        self.recovered_stale = 0
        if self.store is not None:
            self.recovered_stale = self.store.reset_stale()
            self.instances = [r.to_instance() for r in self.store.load()]
        # C9: re-read per tick from this source (a config-table query in
        # production; any callable returning (name, wert) rows here)
        self.config_source = config_source
        self.debug = CONFIG_READ_DEFAULTS["Debug"]
        self.log_interval = CONFIG_READ_DEFAULTS["LogInterval"]  # MaxWaitWithoutMessage
        self.param_log: list[str] = []  # change log (Processor.cs logs on start/delta)
        self._params_initialized = False

    def update_parameters(self, start: bool = False) -> None:
        """One UpdateParameters pass: re-read the config source and apply
        to the LIVE service — the orchestrator's thread cap can shrink or
        grow while a workflow is running (running steps finish; new step
        admissions obey the new cap: Orchestrator.set_max_threads)."""
        if self.config_source is None:
            return
        try:
            rows = list(self.config_source())
        except Exception:
            # 'Querying Configurations failed!' minor — defaults apply
            self.param_log.append("minor: querying configurations failed")
            rows = []
        params = read_configurations(rows, errlog=self.param_log)

        def _apply(name: str, current: object, cast) -> object:
            try:
                value = cast(params[name])
            except Exception:
                value = CONFIG_APPLY_FALLBACKS[name]
                self.param_log.append(f"PARAMETER {name}: {value}")
                return value
            if start or value != current:
                self.param_log.append(f"PARAMETER {name}: {value}")
            return value

        self.debug = _apply("Debug", self.debug, bool)
        threads = _apply("Anzahl_ETL_Threads", self.orchestrator.max_threads, int)
        self.orchestrator.set_max_threads(int(threads))
        self.log_interval = _apply("LogInterval", self.log_interval, int)

    def add(self, sw: ScheduledWorkflow) -> None:
        self.workflows[sw.name] = sw

    def _next_request(self, sw: ScheduledWorkflow, now: datetime) -> datetime | None:
        """None = nothing to schedule. A plan with NO occurrence left
        (endedatum passed, or a weekday/month mask with no match in the
        horizon) raises ScheduleError from the calculus — converted to
        None here so ONE expired plan cannot crash run_tick and halt
        scheduling for every other workflow."""
        try:
            if should_run_immediately(sw.plan, sw.ever_executed):
                return now
            if sw.plan.interval == "Manuell":
                return next_calendar_run(sw.plan, now)
            return advance_interval(sw.plan, now)
        except ScheduleError:
            return None

    def run_tick(self, now: datetime) -> list[RunReport]:
        """One CheckForExecution pass: launch everything due within the
        tick window; returns the run reports (empty when idle). The tick
        FIRST re-reads config (C9) — the reference's timer callback runs
        UpdateParameters before CheckForExecution every 10 s."""
        self.update_parameters(start=not self._params_initialized)
        self._params_initialized = True
        reports: list[RunReport] = []
        for sw in self.workflows.values():
            if not (sw.active and sw.backoff.active):
                continue
            request = self._next_request(sw, now)
            if request is None or request > now + self.tick:
                continue
            # idempotence against the T4 log: a caller ticking faster
            # than tick_seconds (or catching up after a stall) must not
            # fire the SAME scheduled occurrence twice — the reference
            # keys executions on Anforderungszeitpunkt. Immediate
            # (sofort) runs have request == now and are already gated
            # by ever_executed, so they bypass the log check.
            if request != now and any(
                i.workflow == sw.name and i.Anforderungszeitpunkt == request
                for i in self.instances
            ):
                continue
            inst = ScheduleInstance(sw.name, Anforderungszeitpunkt=request)
            self.instances.append(inst)
            inst.Startzeitpunkt = now
            if self.store is not None:
                # persist BEFORE the run: a crash inside the workflow
                # leaves this half-open row for the next boot's
                # reset_stale (the reference's insert-then-execute
                # ordering, Processor.cs lifecycle)
                self.store.record(inst, self.service_user, now)
            try:
                report = self.orchestrator.run(sw.workflow)
                ok = not report.failed
                reports.append(report)
            except Exception:
                ok = False
                report = RunReport(failed=[sw.name])
                reports.append(report)
            inst.Endzeitpunkt = now
            inst.Ausgefuehrt = True
            inst.Erfolgreich = ok
            if self.store is not None:
                self.store.record(inst, self.service_user, now)
            sw.ever_executed = True
            if ok:
                sw.backoff.record_success()
            else:
                sw.backoff.record_failure(sw.name)
                sw.active = sw.backoff.active  # T5 deactivation
        return reports

    def stop(self, now: datetime) -> int:
        """Graceful service stop (Worker.cs:78-103 StopAsync): close
        every still-open durable row, stamping Letzte_Aenderung and
        Letzte_Aenderung_Nutzer (the stop UPDATE stamps; the boot one
        does not). Returns the number of rows closed; 0 without a
        store — the in-memory log dies with the process anyway."""
        if self.store is None:
            return 0
        closed = self.store.reset_stale(user=self.service_user, now=now)
        for inst in self.instances:
            if not inst.Ausgefuehrt:
                inst.Ausgefuehrt = True
                if inst.Erfolgreich is None:
                    inst.Erfolgreich = False
        return closed
