"""Streaming multi-touch attribution on transformWithStateInPandas —
the stream twin of plans/analytics4.py::win_attribution, run
continuously per user as events arrive instead of over collected
next-conversion windows.

State per key (user): the PENDING-touch summary since the user's last
purchase — per-channel touch counts plus the (tu, eid, channel) of
the earliest and latest pending touch. That is O(channels) per live
user, independent of how many touches accumulate: exactly the
information the three credit models need, nothing event-sized.

Each purchase FLUSHES the pending summary as credit rows — one row
per channel carrying its first-touch / last-touch / linear floor-ppm
credits for that conversion — and resets the state. This reproduces
the batch semantics exactly, including the edge cases:

- touches after the user's final purchase stay pending forever
  (batch: nc IS NULL -> unattributed);
- two purchases with no touches between them: the second finds an
  empty summary and emits nothing (batch: same-(user, nc) purchases
  merge into one conversion group);
- same-microsecond touch/purchase collisions resolve by the shared
  (tu, eid) total order on both paths.

Each micro-batch sorts ITS OWN rows by (tu, eid); cross-batch order
is the source's contract (time-ordered files — the same contract the
funnel/book tWS operators pin). Aggregating the emitted changelog by
channel reproduces win_attribution's output exactly — asserted in
tests/test_tws_attribution.py.

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

ATTR_OUT_SCHEMA = (
    "user_id BIGINT, channel BIGINT, first_touch BIGINT, "
    "last_touch BIGINT, linear_ppm BIGINT"
)
# channel codes (purchase is the conversion event, never a channel)
CHANNELS = {"click": 1, "signup": 2, "view": 3}
PURCHASE = 0
_N_CH = len(CHANNELS)

# state: per-channel pending counts + earliest/latest pending touch
_STATE_SCHEMA = (
    "n1 BIGINT, n2 BIGINT, n3 BIGINT, "
    "ftu BIGINT, feid BIGINT, fch BIGINT, "
    "ltu BIGINT, leid BIGINT, lch BIGINT"
)
_EMPTY = (0, 0, 0, -1, -1, -1, -1, -1, -1)


class AttributionProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState("pending", _STATE_SCHEMA)

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
        st = (
            tuple(int(x) for x in self._st.get())
            if self._st.exists()
            else _EMPTY
        )
        counts = list(st[0:3])
        first = list(st[3:6])
        last = list(st[6:9])
        out: list[tuple[int, int, int, int, int]] = []
        uid = int(key[0])
        for tu, eid, code in evs:
            if code != PURCHASE:
                counts[code - 1] += 1
                if first[0] < 0:
                    first = [tu, eid, code]
                last = [tu, eid, code]
                continue
            n = sum(counts)
            if n == 0:
                continue  # conversion with no pending touches
            per_touch_ppm = 1_000_000 // n
            for ch in range(1, _N_CH + 1):
                fc = 1 if first[2] == ch else 0
                lc = 1 if last[2] == ch else 0
                lp = counts[ch - 1] * per_touch_ppm
                if fc or lc or lp:
                    out.append((uid, ch, fc, lc, lp))
            counts = [0, 0, 0]
            first = last = [-1, -1, -1]
        self._st.update(tuple(counts) + tuple(first) + tuple(last))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "channel",
                    "first_touch",
                    "last_touch",
                    "linear_ppm",
                ],
            )

    def close(self) -> None:
        pass


def attribution_tws(events):
    """`events`: streaming DataFrame with (user_id BIGINT, tu BIGINT
    event-micros, eid BIGINT unique tie-break, code INT — 0 for the
    conversion event, 1..3 for click/signup/view touches). Returns
    the per-conversion credit changelog; SUM grouped by channel over
    the emissions equals the batch win_attribution output."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=AttributionProcessor(),
        outputStructType=ATTR_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
