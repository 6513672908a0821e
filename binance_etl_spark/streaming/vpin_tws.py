"""Streaming VPIN bucketizer on transformWithStateInPandas — the
stream twin of plans/microstructure3.py::ms_vpin (volume-synchronized
order-flow toxicity), maintained continuously per symbol as trades
arrive instead of over a collected tape.

State per key: FOUR bigints (cumulative volume, the OPEN volume
bucket's id and its buy/sell partials) — O(1) per symbol, the minimum
any volume-clock tracker can hold; completed buckets leave the store
the moment they close. Each micro-batch sorts ITS OWN rows by
(tu, eid) and advances the volume clock; cross-batch order is the
source's contract (time-ordered files, the same pinned mtime contract
as funnel_tws). Emission is a per-batch changelog of every bucket the
batch touched with its CUMULATIVE totals; totals are monotone within
a bucket, so the final state of any bucket is its last (= max-vol)
emission — asserted exactly against the batch op in
tests/test_tws_vpin.py.

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

from binance_etl_spark.plans.microstructure3 import _VPIN_V  # noqa: E402

VPIN_OUT_SCHEMA = (
    "sym INT, bucket BIGINT, buy_vol BIGINT, sell_vol BIGINT, vol BIGINT"
)
VPIN_V = _VPIN_V  # ONE volume clock for the batch op and its stream twin


class VpinProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState(
            "vpin", "cum BIGINT, bkt BIGINT, buy BIGINT, sell BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        evs: list[tuple[int, int, int, int]] = []
        for pdf in rows:
            evs.extend(
                zip(
                    (int(x) for x in pdf["tu"]),
                    (int(x) for x in pdf["eid"]),
                    (int(x) for x in pdf["qty"]),
                    (int(x) for x in pdf["side"]),
                )
            )
        if not evs:
            return
        evs.sort()
        if self._st.exists():
            cum, bkt, buy, sell = (int(v) for v in self._st.get())
        else:
            cum, bkt, buy, sell = 0, 0, 0, 0
        out: list[tuple[int, int, int, int, int]] = []
        sym = int(key[0])
        for _tu, _eid, qty, side in evs:
            b = cum // VPIN_V
            if b != bkt:
                # the open bucket closed before this trade: emit its
                # FINAL totals (cum volume is monotone, so no later
                # trade can ever land in it again)
                out.append((sym, bkt, buy, sell, buy + sell))
                bkt, buy, sell = b, 0, 0
            if side == 1:
                buy += qty
            else:
                sell += qty
            cum += qty
        out.append((sym, bkt, buy, sell, buy + sell))  # open-bucket partial
        self._st.update((cum, bkt, buy, sell))
        yield pd.DataFrame(
            out, columns=["sym", "bucket", "buy_vol", "sell_vol", "vol"]
        )

    def close(self) -> None:
        pass


def vpin_tws(trades):
    """`trades`: streaming DataFrame with (sym INT, tu BIGINT
    event-micros, eid BIGINT unique tie-break, qty BIGINT, side INT
    +1/-1). Returns the per-batch bucket changelog; the final row per
    (sym, bucket) — its max-vol emission — is that bucket's closed
    state, and SUM(|buy-sell|)/SUM(vol) over those rows is VPIN."""
    return trades.groupBy("sym").transformWithStateInPandas(
        statefulProcessor=VpinProcessor(),
        outputStructType=VPIN_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
