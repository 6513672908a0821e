"""Streaming Bollinger-band breach monitor on
transformWithStateInPandas — the stream twin of
plans/analytics5.py::win_bollinger_breach (±2σ closes over a rolling
20-trade window), evaluated continuously per symbol as trades arrive.

State per key: the last N-1 = 19 e2-integer prices (a fixed-width
tail, O(1) per symbol — the exact minimum a rolling-window statistic
can hold). Each micro-batch sorts ITS OWN rows by (tu, eid), slides
the window across the batch, and evaluates the SAME integer-algebra
breach test as the batch op ((n·p-s)²·(n-1) > 4·n·(n·ss-s²) — no
float, no sqrt), emitting one summary row per (key, batch). Summing
the changelog over batches equals the batch window plan exactly —
asserted window-for-window in tests/test_tws_bollinger.py.

Requires the same stack as the other tWS operators (vendored protobuf
shim + RocksDB multi-column-family state store).
"""

from __future__ import annotations

import pandas as pd

from binance_etl_spark.session import ensure_protobuf

ensure_protobuf()

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

BOLL_N = 20  # ONE window length for the batch op and its stream twin

BOLL_OUT_SCHEMA = (
    "sym INT, n_windows BIGINT, n_breach BIGINT, "
    "n_breach_up BIGINT, n_breach_down BIGINT"
)


class BollingerProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        # the rolling tail as a comma string: bounded at 19 bigints,
        # exact (no float round-trip through the store)
        self._st = handle.getValueState("boll_tail", "tail STRING")

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        evs: list[tuple[int, int, int]] = []
        for pdf in rows:
            evs.extend(
                zip(
                    (int(x) for x in pdf["tu"]),
                    (int(x) for x in pdf["eid"]),
                    (int(x) for x in pdf["p"]),
                )
            )
        if not evs:
            return
        evs.sort()
        tail: list[int] = []
        if self._st.exists():
            raw = self._st.get()[0]
            if raw:
                tail = [int(x) for x in raw.split(",")]
        n_windows = n_breach = n_up = n_down = 0
        for _tu, _eid, p in evs:
            tail.append(p)
            if len(tail) > BOLL_N:
                tail = tail[-BOLL_N:]
            if len(tail) == BOLL_N:
                n = BOLL_N
                s = sum(tail)
                ss = sum(x * x for x in tail)
                n_windows += 1
                dev = n * p - s
                if dev * dev * (n - 1) > 4 * n * (n * ss - s * s):
                    n_breach += 1
                    if dev > 0:
                        n_up += 1
                    else:
                        n_down += 1
        self._st.update((",".join(str(x) for x in tail[-(BOLL_N - 1):]),))
        yield pd.DataFrame(
            [(int(key[0]), n_windows, n_breach, n_up, n_down)],
            columns=[
                "sym",
                "n_windows",
                "n_breach",
                "n_breach_up",
                "n_breach_down",
            ],
        )

    def close(self) -> None:
        pass


def bollinger_tws(trades):
    """`trades`: streaming DataFrame with (sym INT, tu BIGINT
    event-micros, eid BIGINT unique tie-break, p BIGINT e2 price).
    Returns a per-(key, batch) breach summary changelog; SUM over
    batches per sym equals win_bollinger_breach's batch output."""
    return trades.groupBy("sym").transformWithStateInPandas(
        statefulProcessor=BollingerProcessor(),
        outputStructType=BOLL_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
