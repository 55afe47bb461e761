"""Workflow state machine (SURVEY §2.8 O10).

Reference: WorkflowManager.cs:8-16 defines the stages; transitions at
:439-1054; the ONLY executable spec in the reference test suite is the
illegal-transition matrix (DIZService.Tests/WorkflowmanagerTests.cs:
177-259) — ported to pytest in tests/test_statemachine.py.

States: Unknown → Scheduled → Initializing → Executing → {Finished,
Failed}; Finished/Failed re-Create() back to Scheduled for the next
run. Every other transition raises.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class Stage(str, Enum):
    UNKNOWN = "Unknown"
    SCHEDULED = "Scheduled"
    INITIALIZING = "Initializing"
    EXECUTING = "Executing"
    FINISHED = "Finished"
    FAILED = "Failed"


_ALLOWED: dict[Stage, frozenset[Stage]] = {
    Stage.UNKNOWN: frozenset({Stage.SCHEDULED}),
    Stage.SCHEDULED: frozenset({Stage.INITIALIZING}),
    Stage.INITIALIZING: frozenset({Stage.EXECUTING, Stage.FAILED}),
    Stage.EXECUTING: frozenset({Stage.FINISHED, Stage.FAILED}),
    # re-Create() for the next scheduled run (WorkflowManager.cs:1000-1054)
    Stage.FINISHED: frozenset({Stage.SCHEDULED}),
    Stage.FAILED: frozenset({Stage.SCHEDULED}),
}


class IllegalTransitionError(RuntimeError):
    def __init__(self, src: Stage, dst: Stage):
        super().__init__(f"illegal workflow transition {src.value} → {dst.value}")
        self.src, self.dst = src, dst


@dataclass
class WorkflowState:
    name: str
    stage: Stage = Stage.UNKNOWN
    executed_once: bool = False
    history: list[Stage] = field(default_factory=list)

    def transition(self, dst: Stage) -> "WorkflowState":
        if dst not in _ALLOWED[self.stage]:
            raise IllegalTransitionError(self.stage, dst)
        self.history.append(self.stage)
        self.stage = dst
        if dst is Stage.FINISHED:
            self.executed_once = True
        return self


@dataclass
class WorkflowManager:
    """Registry of workflow states (WorkflowManager.cs stage queries,
    :227-294)."""

    workflows: dict[str, WorkflowState] = field(default_factory=dict)

    def create(self, name: str) -> WorkflowState:
        st = self.workflows.get(name)
        if st is None:
            st = WorkflowState(name)
            self.workflows[name] = st
            st.transition(Stage.SCHEDULED)
        else:
            st.transition(Stage.SCHEDULED)
        return st

    def in_stage(self, stage: Stage) -> list[str]:
        return sorted(n for n, s in self.workflows.items() if s.stage is stage)

    def get(self, name: str) -> WorkflowState:
        return self.workflows[name]

    def executed_once(self, name: str) -> bool:
        return self.workflows[name].executed_once
