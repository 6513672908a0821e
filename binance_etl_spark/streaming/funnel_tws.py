"""Streaming funnel state machine on transformWithStateInPandas — the
stream twin of plans/analytics3.py::win_funnel_steps (the greedy
earliest-match funnel walk), run continuously per user as events
arrive instead of over a collected batch.

State per key: ONE bigint (the furthest funnel step reached) — O(1)
per live user in the state store, the minimum any funnel tracker can
hold. Each micro-batch sorts ITS OWN rows by (tu, eid) and advances
the state machine; cross-batch order is the source's contract (the
file stream delivers time-ordered files — pinned by mtime ordering in
tests/test_cdc_stream.py — and any in-order log source qualifies).
Emission is a per-batch changelog row (user_id, step); `step` is
MONOTONE, so the current funnel position of a user is MAX(step) over
emissions and the final position equals the batch fold's result —
asserted exactly in tests/test_tws_funnel.py.

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

FUNNEL_OUT_SCHEMA = "user_id BIGINT, step BIGINT"
N_STEPS = 4  # signup -> view -> click -> purchase (codes 1..4)


class FunnelProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("funnel", "step BIGINT")

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        evs: list[tuple[int, int, int]] = []
        for pdf in rows:
            evs.extend(
                zip(
                    (int(x) for x in pdf["tu"]),
                    (int(x) for x in pdf["eid"]),
                    (int(x) for x in pdf["code"]),
                )
            )
        if not evs:
            return
        evs.sort()
        step = int(self._st.get()[0]) if self._st.exists() else 0
        for _tu, _eid, c in evs:
            if c == step + 1:
                step += 1
        self._st.update((step,))
        yield pd.DataFrame(
            [(int(key[0]), step)], columns=["user_id", "step"]
        )

    def close(self) -> None:
        pass


def funnel_tws(events):
    """`events`: streaming DataFrame with (user_id BIGINT, tu BIGINT
    event-micros, eid BIGINT unique tie-break, code INT funnel-step
    code 1..N_STEPS). Returns the per-batch changelog of funnel
    positions; MAX(step) per user is the current position."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FunnelProcessor(),
        outputStructType=FUNNEL_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
