"""Scheduler calculus (SURVEY §2.7 T1-T3) — pure datetime arithmetic.

Reference: Scheduler.cs:795-907 (interval advance), :754-783 (immediate
run), :916-1965 (calendar calculus). croniter cannot express the
nth-week / last-day / k-runs-per-week rules, so the arithmetic is
ported as pure functions (engine-agnostic; the Spark driver calls them
from the orchestration loop).

Semantics preserved:

- T1 intervals (conf.Zeitplan_Intervalle, names Scheduler.cs:829-891):
  Manuell, Minute, DreiMinuten, Viertelstuendlich, Stunde, Täglich,
  Woche, Monat, Jährlich — roll ``Anfangsdatum + Startzeit`` forward
  until strictly in the future.
- T2 ``Sofort_Ausfuehrung``: run immediately if never executed.
- T3 "Manuell" calendar: weekday mask (Mo-So), month mask (Jan-Dez),
  Tageswiederholung (N runs/day spread over 24h), Wochenwiederholung
  (N runs/week mapped onto allowed weekdays), Woche_des_Monats (nth
  week, last-week guard Scheduler.cs:1841-1847), Monatsletzter (last
  day of month), Anfangsdatum/Endedatum bounds; next run = earliest
  candidate.
"""

from __future__ import annotations

import calendar
from dataclasses import dataclass, field
from datetime import date, datetime, time, timedelta

INTERVALS = (
    "Manuell",
    "Minute",
    "DreiMinuten",
    "Viertelstuendlich",
    "Stunde",
    "Täglich",
    "Woche",
    "Monat",
    "Jährlich",
)

_FIXED_STEPS: dict[str, timedelta] = {
    "Minute": timedelta(minutes=1),
    "DreiMinuten": timedelta(minutes=3),
    "Viertelstuendlich": timedelta(minutes=15),
    "Stunde": timedelta(hours=1),
    "Täglich": timedelta(days=1),
    "Woche": timedelta(weeks=1),
}


@dataclass(frozen=True)
class SchedulePlan:
    """A row of pc.ETL_Zeitplaene (res/pc/ETL_Zeitplaene.sql:11-50)."""

    interval: str = "Täglich"
    anfangsdatum: datetime = datetime(2026, 1, 1)
    endedatum: datetime | None = None
    startzeit: time = time(2, 0, 0)
    sofort_ausfuehrung: bool = False
    # calendar ("Manuell") fields
    weekdays: tuple[bool, ...] = (True,) * 7  # Montag..Sonntag
    months: tuple[bool, ...] = (True,) * 12  # Januar..Dezember
    tageswiederholung: int = 0  # N runs per day
    wochenwiederholung: int = 0  # N runs per week
    woche_des_monats: int = 0  # 1..5, 0 = any
    monatsletzter: bool = False
    an_jedem_tag: bool = True
    in_jedem_monat: bool = True


class ScheduleError(ValueError):
    pass


def _add_months(d: datetime, n: int) -> datetime:
    month = d.month - 1 + n
    year = d.year + month // 12
    month = month % 12 + 1
    day = min(d.day, calendar.monthrange(year, month)[1])
    return d.replace(year=year, month=month, day=day)


def advance_interval(plan: SchedulePlan, now: datetime) -> datetime:
    """T1 (Scheduler.cs:795-907): first occurrence of the plan strictly
    after ``now``, rolling from Anfangsdatum+Startzeit."""
    if plan.interval not in INTERVALS:
        raise ScheduleError(f"unknown interval {plan.interval!r}")
    start = datetime.combine(plan.anfangsdatum.date(), plan.startzeit)
    if plan.interval == "Manuell":
        return next_calendar_run(plan, now)
    if plan.interval in _FIXED_STEPS:
        step = _FIXED_STEPS[plan.interval]
        if start > now:
            return start
        # O(1) roll-forward, not a loop: the reference loops
        # (Scheduler.cs:900-905); same result
        n = int((now - start) / step) + 1
        return start + n * step
    if plan.interval in ("Monat", "Jährlich"):
        # candidates derive from the ORIGINAL start each step —
        # iterating _add_months on the clamped candidate compounds the
        # clamp (Jan 31 -> Feb 28 -> Mar 28 forever; a day-31 schedule
        # would permanently drift to the 28th after one short month)
        step = 1 if plan.interval == "Monat" else 12
        k = 0
        cand = start
        while cand <= now:
            k += 1
            cand = _add_months(start, k * step)
        return cand
    raise ScheduleError(plan.interval)


def should_run_immediately(plan: SchedulePlan, ever_executed: bool) -> bool:
    """T2 (Scheduler.cs:754-783): Sofort_Ausfuehrung ⇒ run now if the
    workflow has never executed."""
    return plan.sofort_ausfuehrung and not ever_executed


def last_day_of_month(year: int, month: int) -> int:
    return calendar.monthrange(year, month)[1]


def week_of_month(d: date) -> int:
    """1-based week index within the month, weeks starting Monday
    (reference GetWeekDates semantics, Scheduler.cs:1725-1847)."""
    first = d.replace(day=1)
    return (d.day + first.weekday() - 1) // 7 + 1


def _day_allowed(plan: SchedulePlan, d: date) -> bool:
    if not plan.months[d.month - 1] and not plan.in_jedem_monat:
        return False
    if plan.monatsletzter:
        return d.day == last_day_of_month(d.year, d.month)
    if not plan.weekdays[d.weekday()] and not plan.an_jedem_tag:
        return False
    if plan.woche_des_monats:
        w = week_of_month(d)
        if plan.woche_des_monats <= 4:
            if w != plan.woche_des_monats:
                return False
        else:
            # week 5 == "last week of month" guard (Scheduler.cs:1841-1847)
            if (d + timedelta(days=7)).month == d.month:
                return False
    if plan.wochenwiederholung:
        # N runs/week mapped onto the first N allowed weekdays
        # (Scheduler.cs:1725-1772)
        allowed = [i for i in range(7) if plan.weekdays[i]] or list(range(7))
        chosen = allowed[: plan.wochenwiederholung]
        if d.weekday() not in chosen:
            return False
    return True


def _day_run_times(plan: SchedulePlan) -> list[time]:
    """Tageswiederholung: N runs/day spread evenly across 24h starting
    at Startzeit (reference divides the day, Scheduler.cs:1422-1530)."""
    n = max(plan.tageswiederholung, 1)
    base = plan.startzeit.hour * 3600 + plan.startzeit.minute * 60 + plan.startzeit.second
    step = 86400 // n
    out = []
    for i in range(n):
        s = (base + i * step) % 86400
        out.append(time(s // 3600, (s % 3600) // 60, s % 60))
    return sorted(out)


def next_calendar_run(plan: SchedulePlan, now: datetime, horizon_days: int = 1500) -> datetime:
    """T3 (Scheduler.cs:916-1405): earliest candidate after ``now``
    within [Anfangsdatum, Endedatum]."""
    lo = max(now, plan.anfangsdatum - timedelta(seconds=1))
    d = lo.date()
    for _ in range(horizon_days):
        if plan.endedatum and datetime.combine(d, time.min) > plan.endedatum:
            break
        if _day_allowed(plan, d):
            for t in _day_run_times(plan):
                cand = datetime.combine(d, t)
                if cand > lo and cand >= plan.anfangsdatum and (
                    plan.endedatum is None or cand <= plan.endedatum
                ):
                    return cand
        d += timedelta(days=1)
    raise ScheduleError("no calendar occurrence within horizon")


@dataclass
class FailureBackoff:
    """T5 (Processor.cs:168-214): 10 consecutive creation failures ⇒
    deactivate the workflow."""

    limit: int = 10
    failures: int = 0
    active: bool = True
    notifications: list[str] = field(default_factory=list)

    def record_failure(self, workflow: str) -> None:
        self.failures += 1
        if self.failures >= self.limit and self.active:
            self.active = False
            self.notifications.append(f"workflow {workflow} deactivated after {self.failures} failures")

    def record_success(self) -> None:
        self.failures = 0
