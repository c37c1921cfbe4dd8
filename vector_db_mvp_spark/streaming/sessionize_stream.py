"""Streaming sessionization with custom per-key state + event-time expiry —
the streaming twin of the batch gap-sessionization query
(workload/relational.py q_user_sessions) that EMITS COMPLETED SESSIONS as
first-class rows.

A session closes two ways:

1. **gap-split in-batch**: a new event for the key arrives more than
   ``gap`` after the open session's last event → the open session is
   emitted immediately and a new one starts;
2. **expiry**: no event arrives; once the watermark passes
   last_event + gap the open session is emitted and its state cleared.

Output rows: (user_id, session_start_ms, session_end_ms, n_events), append
mode — each completed session exactly once. Rows older than the watermark
are dropped by Spark before they reach the operator.

Two interchangeable engines behind one contract (selected by ``api``):

- ``"v2"`` — ``transformWithStateInPandas`` (Spark 4 arbitrary-state API):
  ValueState + explicit event-time TIMERS (:class:`SessionAssembler`).
  Its Python worker protocol needs the ``protobuf`` package; when absent
  (this container) the API crashes at init, so ``"auto"`` probes the
  import first.
- ``"v1"`` — ``applyInPandasWithState`` with ``EventTimeTimeout``: the
  single timeout slot per key expresses exactly the one-timer-per-key
  discipline v2's register/delete pair implements. Pure pandas + Arrow,
  no extra deps.

Scale notes (100 TB/day): state per key is three longs (open-session
bounds + count) — far below the per-event buffering a session-window
aggregation holds. Parallelism is the grouping key (user), the natural
shard key; both engines keep state in the streaming state store and evict
via the watermark, so state is bounded by ACTIVE sessions only. The same
operator runs unchanged against Kafka; tests drive it with a file source +
availableNow and prove batch-equivalence of every emitted session.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = (
    "user_id long, session_start_ms long, session_end_ms long, n_events long"
)
_STATE_SCHEMA = "start_ms long, last_ms long, n long"


def _emit_pdf(user_id: int, start_ms: int, last_ms: int, n: int) -> "pd.DataFrame":
    import pandas as pd

    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start_ms": [start_ms],
            "session_end_ms": [last_ms],
            "n_events": [n],
        }
    )


def _fold_events(
    ts_list: list[int],
    gap_ms: int,
    start_ms: int | None,
    last_ms: int | None,
    n: int,
    user_id: int,
):
    """Shared gap-split fold: returns (emitted pdfs, new open state)."""
    out = []
    for t in sorted(ts_list):
        if last_ms is not None and t - last_ms > gap_ms:
            out.append(_emit_pdf(user_id, start_ms, last_ms, n))
            start_ms, last_ms, n = None, None, 0
        if start_ms is None:
            start_ms = t
        last_ms = t if last_ms is None else max(last_ms, t)
        n += 1
    return out, (start_ms, last_ms, n)


class SessionAssembler(StatefulProcessor):
    """v2 engine: ValueState + explicit event-time timers."""

    def __init__(self, gap_ms: int) -> None:
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._session = handle.getValueState("session", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator["pd.DataFrame"], timerValues: TimerValues
    ) -> Iterator["pd.DataFrame"]:
        user_id = key[0]
        ts_list: list[int] = []
        for pdf in rows:
            ts_list.extend(int(t) // 1_000_000 for t in pdf["ts"].astype("int64"))
        if self._session.exists():
            start_ms, last_ms, n = self._session.get()
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
        else:
            start_ms = last_ms = None
            n = 0
        emitted, (start_ms, last_ms, n) = _fold_events(
            ts_list, self._gap_ms, start_ms, last_ms, n, user_id
        )
        yield from emitted
        self._session.update((start_ms, last_ms, n))
        self._handle.registerTimer(last_ms + self._gap_ms)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator["pd.DataFrame"]:
        if self._session.exists():
            start_ms, last_ms, n = self._session.get()
            if expiredTimerInfo.getExpiryTimeInMs() >= last_ms + self._gap_ms:
                yield _emit_pdf(key[0], start_ms, last_ms, n)
                self._session.clear()

    def close(self) -> None:
        pass


def _v1_update_fn(gap_ms: int):
    """v1 engine: GroupState with the single EventTimeTimeout slot."""

    def update(key, pdfs, state):
        user_id = key[0]
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield _emit_pdf(user_id, start_ms, last_ms, n)
            return
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(t) // 1_000_000 for t in pdf["ts"].astype("int64"))
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms = last_ms = None
            n = 0
        emitted, (start_ms, last_ms, n) = _fold_events(
            ts_list, gap_ms, start_ms, last_ms, n, user_id
        )
        state.update((start_ms, last_ms, n))
        # one timeout slot per key == v2's delete-then-register discipline
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield from emitted

    return update


def _v2_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def sessionize_stream(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    api: str = "auto",
) -> DataFrame:
    """Completed sessions (append) from an event stream: one row per closed
    session, closed by gap-split or event-time expiry. ``api`` is ``"v1"``
    (applyInPandasWithState), ``"v2"`` (transformWithStateInPandas) or
    ``"auto"`` (v2 when its protobuf dependency is importable)."""
    from .windows import as_event_time

    gap_ms = _interval_ms(events.sparkSession, gap)
    keyed = (
        as_event_time(events, ts_col)
        .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
    )
    if api == "auto":
        api = "v2" if _v2_available() else "v1"
    if api == "v2":
        return keyed.transformWithStateInPandas(
            statefulProcessor=SessionAssembler(gap_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return keyed.applyInPandasWithState(
        _v1_update_fn(gap_ms),
        OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def _interval_ms(spark, interval: str) -> int:
    row = spark.sql(
        "SELECT unix_millis(TIMESTAMP '1970-01-01 00:00:00Z' "
        f"+ INTERVAL {interval}) AS ms"
    ).first()
    return int(row["ms"])
