"""Streaming sessionization — the custom stateful operator path.

The batch twin (plans/queries.py EVENTS_SESSIONIZE_TEMPLATE) computes
gap-based sessions with window functions; on an unbounded stream that
needs per-key mutable state, which Structured Streaming exposes as
``applyInPandasWithState``: state = the open session per user, an
event-time timeout closes idle sessions.

Scale shape: state lives in the state store, partitioned by user_id —
the same shuffle key as the batch query. Watermark bounds both late
data and state lifetime; emitted rows are closed sessions only, so the
sink stream is append-only and compact.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_US = 30 * 60 * 1_000_000

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
    ]
)

# open-session state: (n_events, start_us, end_us)
SESSION_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
    ]
)


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[tuple[int, int, int, int]] = []

    if state.hasTimedOut:
        if state.exists:
            n, s, e = state.get
            closed.append((user_id, n, s, e))
            state.remove()
        yield pd.DataFrame(closed, columns=["user_id", "n_events", "session_start_us", "session_end_us"])
        return

    n, s, e = state.get if state.exists else (0, None, None)
    # Interval-merge over SEGMENTS: each batch event is a point segment
    # (1, t, t); the open session from state is one segment (n, s, e).
    # Sorting by start and merging whenever the next segment begins
    # within one gap of the merged end reproduces the batch twin's
    # transitive chaining exactly — including an event more than one
    # gap before the open session start that is BRIDGED to it by
    # another in-batch event (gap=10, open s=100, batch {89, 91}:
    # 89+91 merge, then 100-91<=gap chains all three into one session;
    # the old two-phase early/main split closed 89 separately).
    # Bounded-state caveat stands: a session closed here cannot merge
    # with even-later stragglers from future batches (the state holds
    # one open session per user).
    segments = [(1, int(t), int(t)) for pdf in pdfs for t in pdf["ts_us"].to_numpy()]
    if s is not None:
        segments.append((n, s, e))
    segments.sort(key=lambda seg: (seg[1], seg[2]))
    n, s, e = 0, None, None
    for cn, cs, ce in segments:
        if s is None:
            n, s, e = cn, cs, ce
        elif cs - e > SESSION_GAP_US:
            closed.append((user_id, n, s, e))
            n, s, e = cn, cs, ce
        else:
            n, e = n + cn, max(e, ce)
    if s is not None:
        state.update((n, s, e))
        # close the session once no event arrives for one gap
        state.setTimeoutTimestamp((e + SESSION_GAP_US) // 1000)
    yield pd.DataFrame(closed, columns=["user_id", "n_events", "session_start_us", "session_end_us"])


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """events (with event-time ``ts`` + ``ts_us`` long) → closed
    sessions. Works on a streaming DataFrame from
    events_stream.read_event_stream + with_event_time."""
    from pyspark.sql import functions as F

    with_us = events.withColumn("ts_us", (F.unix_micros(F.col("ts"))))
    return (
        with_us.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
