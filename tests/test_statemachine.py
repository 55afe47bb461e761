"""Port of the reference's workflow state-machine spec
(DIZService.Tests/WorkflowmanagerTests.cs:177-259): every illegal
transition must raise; executed-once tracking (:297-323)."""

from __future__ import annotations

import itertools

import pytest

from etl_service_spark.plans.statemachine import (
    IllegalTransitionError,
    Stage,
    WorkflowManager,
    WorkflowState,
)

LEGAL = {
    (Stage.UNKNOWN, Stage.SCHEDULED),
    (Stage.SCHEDULED, Stage.INITIALIZING),
    (Stage.INITIALIZING, Stage.EXECUTING),
    (Stage.INITIALIZING, Stage.FAILED),
    (Stage.EXECUTING, Stage.FINISHED),
    (Stage.EXECUTING, Stage.FAILED),
    (Stage.FINISHED, Stage.SCHEDULED),
    (Stage.FAILED, Stage.SCHEDULED),
}


@pytest.mark.parametrize("src,dst", list(itertools.product(Stage, Stage)))
def test_transition_matrix(src, dst):
    st = WorkflowState("wf")
    st.stage = src
    if (src, dst) in LEGAL:
        st.transition(dst)
        assert st.stage is dst
    else:
        with pytest.raises(IllegalTransitionError):
            st.transition(dst)
        assert st.stage is src  # state unchanged on illegal transition


def test_full_lifecycle_and_recreate():
    st = WorkflowState("wf")
    for dst in (Stage.SCHEDULED, Stage.INITIALIZING, Stage.EXECUTING, Stage.FINISHED):
        st.transition(dst)
    assert st.executed_once
    st.transition(Stage.SCHEDULED)  # re-Create() for the next run
    assert st.stage is Stage.SCHEDULED
    assert st.executed_once  # sticky (WorkflowmanagerTests.cs:297-323)


def test_failed_run_not_executed_once():
    st = WorkflowState("wf")
    st.transition(Stage.SCHEDULED)
    st.transition(Stage.INITIALIZING)
    st.transition(Stage.EXECUTING)
    st.transition(Stage.FAILED)
    assert not st.executed_once


def test_manager_stage_queries():
    m = WorkflowManager()
    m.create("a")
    m.create("b")
    m.get("a").transition(Stage.INITIALIZING)
    assert m.in_stage(Stage.SCHEDULED) == ["b"]
    assert m.in_stage(Stage.INITIALIZING) == ["a"]
    assert m.in_stage(Stage.EXECUTING) == []
