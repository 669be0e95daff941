"""Streaming sessionization tests: native session_window vs the
custom applyInPandasWithState operator — both must agree with the
batch sessionization semantics."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from bitcoin_datawarehouse_spark.streaming.jobs import (
    EVENTS_SCHEMA,
    read_event_stream,
    run_stream_to_completion,
)
from bitcoin_datawarehouse_spark.streaming.sessions import (
    SESSION_GAP_MIN,
    session_window_agg,
    stateful_sessions,
)

BASE = dt.datetime(2024, 1, 1, 8, 0, 0)


def _mk(event_id, minutes, user, value):
    return (
        event_id,
        BASE + dt.timedelta(minutes=minutes),
        user,
        "click",
        float(value),
        "{}",
    )


#: two users; u1 has two sessions split by a >30min gap, u2 has one
EVENTS = [
    _mk(1, 0, 1, 1.0),
    _mk(2, 10, 1, 2.0),
    _mk(3, 20, 1, 3.0),     # u1 session A: 3 events, sum 6
    _mk(4, 80, 1, 4.0),
    _mk(5, 95, 1, 5.0),     # u1 session B: 2 events, sum 9
    _mk(6, 5, 2, 10.0),
    _mk(7, 15, 2, 10.0),    # u2 session: 2 events, sum 20
]

#: a far-future row per user advancing the watermark past all gaps so
#: event-time timeouts / window closes fire while the stream drains
SENTINELS = [
    _mk(100, 24 * 60, 1, 0.0),
    _mk(101, 24 * 60, 2, 0.0),
]

EXPECTED = {
    (1, BASE + dt.timedelta(minutes=0), BASE + dt.timedelta(minutes=20), 3, 6.0),
    (1, BASE + dt.timedelta(minutes=80), BASE + dt.timedelta(minutes=95), 2, 9.0),
    (2, BASE + dt.timedelta(minutes=5), BASE + dt.timedelta(minutes=15), 2, 20.0),
}


def _write_two_ordered_files(spark, d):
    """Two flat parquet files in one dataset dir (the file source does
    not recurse into non-partition subdirs): first the real events,
    then watermark-advancing sentinels; mod-times forced so the file
    source replays them in that order."""
    spark.createDataFrame(EVENTS, EVENTS_SCHEMA).coalesce(1).write.parquet(d)
    first_files = {
        name for name in os.listdir(d) if name.endswith(".parquet")
    }
    spark.createDataFrame(SENTINELS, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    now = 1_700_000_000
    for name in os.listdir(d):
        if name.endswith(".parquet"):
            t = now if name in first_files else now + 60
            os.utime(os.path.join(d, name), (t, t))
    return d


def _run(spark, tmp_path, df_fn, sink_name):
    src = _write_two_ordered_files(spark, str(tmp_path / "in"))
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        df_fn(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    run_stream_to_completion(q)
    rows = spark.sql(f"SELECT * FROM {sink_name}").collect()
    return {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in rows
        if r["n_events"] > 0 and r["sum_value"] > 0  # drop sentinel sessions
    }


def test_custom_stateful_sessions_match_expected(spark, tmp_path):
    got = _run(spark, tmp_path, stateful_sessions, "sess_custom")
    assert got == EXPECTED


def test_native_session_window_matches_custom(spark, tmp_path):
    got = _run(
        spark,
        tmp_path,
        lambda s: session_window_agg(s).withColumn(
            # native windows end at last_event + gap; normalize to the
            # custom operator's last-event end for comparison
            "session_end",
            F.col("session_end") - F.expr(
                f"INTERVAL {SESSION_GAP_MIN} MINUTES"
            ),
        ),
        "sess_native",
    )
    assert got == EXPECTED


class _FakeState:
    def __init__(self, value=None, watermark_ms=0, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.watermark_ms = watermark_ms
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms

    def getCurrentWatermarkMs(self):
        return self.watermark_ms


def _pdf(rows):
    import pandas as pd

    return pd.DataFrame(
        {"ts": [r[0] for r in rows], "value": [r[1] for r in rows]}
    )


def test_session_kernel_merges_consecutive_late_rows():
    """Two late rows forming one earlier session must emit ONE session
    (not two singletons), and the open session must stay in state."""
    from bitcoin_datawarehouse_spark.streaming.sessions import _session_fn

    state = _FakeState(
        value=(_ts(12, 0), _ts(12, 0), 1, 5.0), watermark_ms=0
    )
    late = _pdf([(BASE.replace(hour=10), 1.0),
                 (BASE.replace(hour=10, minute=5), 2.0)])
    out = list(_session_fn((1,), iter([late]), state))
    [emitted] = out
    assert len(emitted) == 1  # one merged session row
    assert emitted["n_events"].iloc[0] == 2
    assert emitted["sum_value"].iloc[0] == 3.0
    assert state.get[2] == 1  # the 12:00 session stays open in state


def test_session_kernel_clamps_timeout_above_watermark():
    """A late in-gap event must not arm a timeout at/before the
    watermark (Spark raises INVALID_TIMEOUT_TIMESTAMP and poisons the
    query)."""
    from bitcoin_datawarehouse_spark.streaming.sessions import _session_fn

    wm = _ts(13, 0) // 1000  # watermark 13:00 in ms
    state = _FakeState(
        value=(_ts(12, 0), _ts(12, 10), 2, 4.0), watermark_ms=wm
    )
    late = _pdf([(BASE.replace(hour=12, minute=15), 1.0)])
    list(_session_fn((1,), iter([late]), state))
    assert state.timeout_set is not None and state.timeout_set > wm


def _ts(h, m):
    import datetime as _dt

    return int(
        BASE.replace(hour=h, minute=m)
        .replace(tzinfo=_dt.timezone.utc)
        .timestamp()
        * 1_000_000
    )
