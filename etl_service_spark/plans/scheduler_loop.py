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


class SchedulerLoop:
    def __init__(self, orchestrator: Orchestrator | None = None, tick_seconds: int = 10) -> None:
        self.orchestrator = orchestrator or Orchestrator()
        self.tick = timedelta(seconds=tick_seconds)
        self.workflows: dict[str, ScheduledWorkflow] = {}
        self.instances: list[ScheduleInstance] = []  # T4 log

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
        tick window; returns the run reports (empty when idle)."""
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
            sw.ever_executed = True
            if ok:
                sw.backoff.record_success()
            else:
                sw.backoff.record_failure(sw.name)
                sw.active = sw.backoff.active  # T5 deactivation
        return reports
