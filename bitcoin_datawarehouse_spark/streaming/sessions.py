"""Streaming sessionization — built-in and custom-stateful forms.

Two implementations of the same semantics (user sessions closed by a
30-minute inactivity gap), demonstrating the two extension tiers:

* :func:`session_window_agg` — the idiomatic path: Spark's native
  ``session_window`` dynamic-gap windows under a watermark.  State
  management, merging and eviction are the engine's problem; this is
  what production should use.
* :func:`stateful_sessions` — the same operator hand-built on
  ``applyInPandasWithState``: explicit per-key state (open session
  accumulator), event-time timeouts closing idle sessions, Arrow
  batches in/out.  This is the template for operators the engine does
  NOT have natively (per-key ML feature decay, CEP-ish patterns,
  custom eviction policies): the state layout, timeout protocol, and
  output discipline carry over unchanged.

Scale notes: both shuffle once on the grouping key; state lives in the
executor state store partitioned by key, bounded by the watermark —
no unbounded growth.  applyInPandasWithState moves state rows through
Arrow, so per-key state should stay O(accumulator), never O(events).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

#: open-session accumulator: (start_us, last_us, n_events, sum_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def session_window_agg(
    events: DataFrame,
    gap: str = f"{SESSION_GAP_MIN} minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows: per-user sessions closed after ``gap``
    of inactivity; watermark bounds state and admits late rows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def _us(ts: dt.datetime) -> int:
    # exact integer path: float-seconds (ts.timestamp()*1e6) loses
    # ~0.25-0.5 µs at current epochs, shifting session boundaries by
    # ±1 µs for sub-second-precision events
    return int(pd.Timestamp(ts).value // 1000)


def _session_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user stateful kernel.

    Merges each Arrow batch into the open-session accumulator, emits
    every session closed by the inactivity gap, keeps the trailing
    open session in state, and arms an event-time timeout so the
    watermark closes idle sessions with no further input.
    """
    (user_id,) = key
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    if state.hasTimedOut:
        start_us, last_us, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "sum_value": [sv],
            }
        )
        return

    # interval merge over the WHOLE batch: chunks are concatenated and
    # sorted once (a group larger than one Arrow batch arrives as
    # several chunks in arbitrary inter-chunk order — per-chunk sorting
    # would mis-sessionize), the open-session accumulator joins the
    # sequence as one interval, and adjacent intervals within the gap
    # coalesce.  This merges late rows with EACH OTHER too (two late
    # rows forming one earlier session yield one session, not two
    # singletons).  Every merged interval except the last is closed and
    # emitted; the last stays open in state.  Remaining approximation
    # vs native session_window: an emitted earlier session cannot be
    # re-opened by an even-later row in a FUTURE batch — the
    # accumulator keeps no history (session_window's mergeable window
    # state is the tool when that matters).
    frames = [pdf for pdf in pdfs]
    rows: list[tuple[int, float]] = []
    if frames:
        allpdf = pd.concat(frames).sort_values("ts")
        rows = [
            (_us(ts), float(v))
            for ts, v in zip(allpdf["ts"], allpdf["value"])
        ]
    intervals = [(ts, ts, 1, v) for ts, v in rows]
    if state.exists:
        intervals.append(tuple(state.get))
    intervals.sort(key=lambda it: (it[0], it[1]))
    merged: list[tuple[int, int, int, float]] = []
    for it in intervals:
        if merged and it[0] - merged[-1][1] <= gap_us:
            prev = merged[-1]
            merged[-1] = (
                prev[0],
                max(prev[1], it[1]),
                prev[2] + it[2],
                prev[3] + it[3],
            )
        else:
            merged.append(it)
    out = merged[:-1]
    cur = merged[-1] if merged else None
    if cur is not None:
        state.update(cur)
        # close the open session when event-time passes last_ts + gap;
        # clamp above the current watermark — a timeout at-or-before
        # the watermark raises INVALID_TIMEOUT_TIMESTAMP and poisons
        # the checkpointed query permanently
        timeout_ms = cur[1] // 1000 + SESSION_GAP_MIN * 60 * 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
    if out:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in out],
                "session_end": [
                    pd.Timestamp(e, unit="us") for _, e, *_ in out
                ],
                "n_events": [n for *_, n, _ in out],
                "sum_value": [sv for *_, sv in out],
            }
        )


def stateful_sessions(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``
    with event-time timeouts (see module docstring)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
