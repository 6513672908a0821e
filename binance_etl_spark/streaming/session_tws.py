"""Timer-closed sessionization on transformWithStateInPandas.

The session-window aggregation the engine already ships
(`F.session_window`, plans/analytics.py win_session) closes a session
only when a LATER event for the same key arrives or the query ends.
This operator closes sessions with EVENT-TIME TIMERS instead: when the
watermark passes `last_event + gap`, the registered timer fires and the
session row is emitted — even if that key never speaks again. That is
the semantics a market-session / user-session monitor actually wants
(the reference has no notion of this; provenance is the NS mandate,
SURVEY §2.10 tumbling/sliding/session windows row).

State per key: one value-state tuple (start_ms, last_ms, n) — O(1) —
plus at most ONE registered timer (re-armed on every batch). In-stream
gaps close sessions inline (`closed_by='gap'`); the trailing session
of a key closes by timer (`closed_by='timer'`) once the watermark
passes. At 100 TB keys spread across executors and the state store
(RocksDB) holds one tiny row per live key.

Requires: protobuf (vendored shim, session.ensure_protobuf) and a
multi-column-family state store (RocksDB) — same stack as
streaming/book_sync.py's tWS path.
"""

from __future__ import annotations

import pandas as pd

from binance_etl_spark.session import ensure_protobuf

ensure_protobuf()

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

SESSION_OUT_SCHEMA = (
    "symbol STRING, session_start BIGINT, session_end BIGINT, "
    "n_events BIGINT, closed_by STRING"
)
_COLS = ["symbol", "session_start", "session_end", "n_events", "closed_by"]


class SessionizerProcessor(StatefulProcessor):
    def __init__(self, gap_ms: int):
        self._gap_ms = int(gap_ms)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", "start_ms BIGINT, last_ms BIGINT, n BIGINT")

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        symbol = key[0]
        ts: list[int] = []
        for pdf in rows:
            ts.extend(int(t) for t in pdf["timestamp"])
        if not ts:
            return
        ts.sort()
        start = last = None
        n = 0
        if self._sess.exists():
            start, last, n = (int(x) for x in self._sess.get())
        out = []
        for t in ts:
            if last is not None and t - last > self._gap_ms:
                out.append((symbol, start, last, n, "gap"))
                start, n = None, 0
            if start is None:
                start = t
            last = t
            n += 1
        self._sess.update((start, last, n))
        # exactly one armed timer per key: re-arm at the new deadline
        for exp in list(self._handle.listTimers()):
            self._handle.deleteTimer(exp)
        self._handle.registerTimer(last + self._gap_ms)
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    def handleExpiredTimer(self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo):
        if self._sess.exists():
            start, last, n = (int(x) for x in self._sess.get())
            self._sess.clear()
            yield pd.DataFrame([(key[0], start, last, n, "timer")], columns=_COLS)

    def close(self) -> None:
        pass


def sessionize_tws(events, gap_ms: int):
    """`events`: streaming DataFrame with (symbol STRING, timestamp
    BIGINT event-ms, event_time TIMESTAMP carrying a watermark).
    Returns closed sessions; open sessions stay in state until their
    timer fires."""
    return events.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=SessionizerProcessor(gap_ms),
        outputStructType=SESSION_OUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
