"""Custom stateful streaming via ``transformWithStateInPandas`` —
Spark 4's arbitrary-stateful-processing API (typed state variables +
explicit event-time timers), the successor extension point to
``applyInPandasWithState`` (streaming/stateful.py implements the same
operator there; tests assert the two agree and both match the batch
gaps-and-islands oracle).

What the new API adds over applyInPandasWithState, mapped here:
- typed state variables (``getValueState`` with a DDL schema) instead
  of one opaque state tuple — ``open_session`` holds (start_us,
  last_us, cnt);
- explicit timers: ``registerTimer(ms)`` + ``handleExpiredTimer``
  replace the implicit per-key timeout — the session's close horizon
  is re-armed on every extension (old timer deleted, so a key carries
  at most one live timer);
- ``init``/``close`` lifecycle around the whole partition-task.

Semantics are identical to stateful.sessionize: inactivity-gap
sessions per user, each emitted exactly once when the event-time
watermark passes last_event + gap (append mode), state evicted on
emission.

AVAILABILITY: the transformWithState Python runner speaks protobuf to
the JVM state server (pyspark/sql/streaming/proto/StateMessage_pb2);
this container ships no ``google.protobuf``, so the API cannot
execute here (same class of gap as the Kafka connector,
sources/streams.py).  The operator is gated on :data:`TWS_AVAILABLE`;
tests run the full oracle comparison where the dependency exists and
assert the explicit guard where it doesn't.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from flink_repartition_watermark_example_spark.streaming.stateful import SESSION_SCHEMA

try:  # the TWS python runner requires protobuf (StateMessage_pb2)
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    TWS_AVAILABLE = True
except ImportError:
    TWS_AVAILABLE = False

_US = 1_000_000


def _session_frame(user_id, closed: list[tuple[int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _ in closed],
            "n_events": [c for _, c in closed],
        }
    )


class SessionizeProcessor(StatefulProcessor):
    """Inactivity-gap sessionization with ValueState + event-time
    timers."""

    def __init__(self, gap_seconds: int):
        self.gap_seconds = gap_seconds

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState(
            "open_session", "start_us LONG, last_us LONG, cnt LONG"
        )

    def _rearm_timer(self, last_us: int) -> None:
        # Register only if the horizon moved: re-registering an
        # already-armed timer is an error/warning in the
        # transformWithState runner (replayed or duplicate events leave
        # the horizon unchanged).
        horizon_ms = last_us // 1000 + self.gap_seconds * 1000
        already_armed = False
        for t in list(self.handle.listTimers()):
            if t != horizon_ms:
                self.handle.deleteTimer(t)
            else:
                already_armed = True
        if not already_armed:
            self.handle.registerTimer(horizon_ms)

    def handleInputRows(
        self,
        key,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        ts_us: list[int] = []
        for pdf in rows:
            ts_us.extend(int(t.value // 1000) for t in pdf["ts"])
        ts_us.sort()

        if self.state.exists():
            start_us, last_us, cnt = self.state.get()
        else:
            start_us = last_us = cnt = None

        closed: list[tuple[int, int]] = []
        for t in ts_us:
            if start_us is None:
                start_us, last_us, cnt = t, t, 1
            elif t - last_us > self.gap_seconds * _US:
                closed.append((start_us, cnt))
                start_us, last_us, cnt = t, t, 1
            else:
                # identical fold to stateful._sessionize_group, so the
                # two APIs' outputs are comparable row for row
                last_us, cnt = t, cnt + 1
        if start_us is not None:
            self.state.update((start_us, last_us, cnt))
            self._rearm_timer(last_us)
        yield _session_frame(key[0], closed)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self.state.exists():
            return
        start_us, last_us, cnt = self.state.get()
        # a stale timer (session was extended after it was armed) must
        # not close the live session
        if expiredTimerInfo.getExpiryTimeInMs() >= last_us // 1000 + self.gap_seconds * 1000:
            self.state.clear()
            yield _session_frame(key[0], [(start_us, cnt)])

    def close(self) -> None:
        pass


def sessionize_tws(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "0 seconds",
    drop_after: str | None = None,
) -> DataFrame:
    """`stateful.sessionize` re-expressed on transformWithStateInPandas
    (same gap parsing, same sentinel-exclusion contract)."""
    if not TWS_AVAILABLE:
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf (the "
            "Python state-server protocol), which this environment does "
            "not provide; use streaming.stateful.sessionize — same "
            "semantics on applyInPandasWithState"
        )
    parts = gap.split()
    gap_seconds = int(parts[0]) * {"seconds": 1, "minutes": 60, "hours": 3600}[parts[1]]

    from pyspark.sql import functions as F

    from flink_repartition_watermark_example_spark.streaming.eventtime import (
        ensure_event_time,
    )

    marked = ensure_event_time(events).withWatermark("ts", watermark_delay)
    if drop_after is not None:
        marked = marked.where(F.col("ts") < F.lit(drop_after).cast("timestamp"))
    return marked.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionizeProcessor(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
