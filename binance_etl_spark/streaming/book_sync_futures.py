"""Stateful order-book synchronization for FUTURES markets — the two
market ids the reference recognizes but stubs (factory.py:26-29:
`usdm_futures` / `coinm_futures` fall through to the generic raise).

The futures diff-depth protocol (public Binance "How to manage a
local order book correctly" documentation for USDⓈ-M / COIN-M
futures) differs from spot in two load-bearing ways:

1. every event carries ``pu`` — the final update id of the PREVIOUS
   event — and post-sync continuity is checked as ``pu == previous
   event's u`` (spot instead checks ``U == prev_u + 1``);
2. the snapshot bridge is ``U <= lastUpdateId <= u`` and staleness is
   ``u < lastUpdateId`` (spot: ``U <= lastUpdateId+1 <= u`` and
   ``u <= lastUpdateId``).

Same engine shape as the spot module (streaming/book_sync.py): one
pure-Python core shared by a batch applyInPandas twin and a streaming
applyInPandasWithState operator, buffering pre-snapshot deltas in
state, flagging continuity gaps on the row (DLQ-filterable) instead
of crashing the stream. Both markets use this one module — USDⓈ-M
and COIN-M share the sync protocol; only the endpoint differs.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from binance_etl_spark.streaming.book_sync import (
    SYNC_OUT_SCHEMA,
    SyncState,
    _emit_delta,
    _emit_levels,
    _rows_to_pdf,
)

# Spot's DELTA_SCHEMA + the futures-only pu field. A separate schema
# (rather than widening spot's) keeps the spot goldens, tWS state
# schema, and bench fixtures byte-stable.
FUT_DELTA_SCHEMA = (
    "symbol STRING, timestamp BIGINT, local_timestamp BIGINT, "
    "first_update_id BIGINT, last_update_id BIGINT, prev_final_id BIGINT, "
    "bids_json STRING, asks_json STRING, seq BIGINT"
)
FUT_DELTA_COLS = [
    "symbol",
    "timestamp",
    "local_timestamp",
    "first_update_id",
    "last_update_id",
    "prev_final_id",
    "bids_json",
    "asks_json",
    "seq",
]


def parse_depth_updates_futures(frames: DataFrame) -> DataFrame:
    """frames -> futures diff-depth rows (spot columns + ``pu``)."""
    df = frames.select(F.try_parse_json("frame").alias("v"), "arrival_ms", "seq")
    return df.where(
        F.col("v").isNotNull()
        & (F.try_variant_get("v", "$.e", "string") == "depthUpdate")
    ).select(
        F.try_variant_get("v", "$.s", "string").alias("symbol"),
        F.try_variant_get("v", "$.E", "bigint").alias("timestamp"),
        F.col("arrival_ms").alias("local_timestamp"),
        F.try_variant_get("v", "$.U", "bigint").alias("first_update_id"),
        F.try_variant_get("v", "$.u", "bigint").alias("last_update_id"),
        F.try_variant_get("v", "$.pu", "bigint").alias("prev_final_id"),
        F.to_json(
            F.try_variant_get("v", "$.b", "array<array<string>>")
        ).alias("bids_json"),
        F.to_json(
            F.try_variant_get("v", "$.a", "array<array<string>>")
        ).alias("asks_json"),
        "seq",
    )


def _records(pdf: pd.DataFrame) -> list[dict]:
    cols = [pdf[c].tolist() for c in FUT_DELTA_COLS]
    return [dict(zip(FUT_DELTA_COLS, t)) for t in zip(*cols)]


def _sync_step_futures(
    state: SyncState, deltas: list[dict], snapshot: dict | None
) -> list[tuple]:
    """Advance the futures state machine over in-order deltas."""
    out: list[tuple] = []
    for d in deltas:
        if state.synced:
            gap = d["prev_final_id"] != state.prev_u  # pu-continuity
            _emit_delta(out, d, gap)
            state.prev_u = d["last_update_id"]
            continue
        if snapshot is None:
            state.buffer.append(d)
            continue
        pending = [*state.buffer, d]
        state.buffer = []
        last_id = snapshot["lastUpdateId"]
        for p in pending:
            if state.synced:
                gap = p["prev_final_id"] != state.prev_u
                _emit_delta(out, p, gap)
                state.prev_u = p["last_update_id"]
            elif p["last_update_id"] < last_id:
                continue  # stale: u < lastUpdateId (futures rule)
            elif p["first_update_id"] <= last_id <= p["last_update_id"]:
                # bridge: U <= lastUpdateId <= u; snapshot rows first,
                # timestamped 1ms before their local time (same
                # presentation as the spot sync)
                local = p["local_timestamp"]
                _emit_levels(out, p["symbol"], local - 1, local, "bid",
                             snapshot["bids"], True, last_id, False)
                _emit_levels(out, p["symbol"], local - 1, local, "ask",
                             snapshot["asks"], True, last_id, False)
                _emit_delta(out, p, False)
                state.synced = True
                state.prev_u = p["last_update_id"]
            # else: post-snapshot but non-bridging — keep waiting
    return out


def book_sync_batch_futures(updates, snapshot_for: dict[str, dict]):
    """Batch twin: groupBy(symbol).applyInPandas over FUT_DELTA_SCHEMA."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        symbol = pdf["symbol"].iloc[0]
        state = SyncState()
        rows = _sync_step_futures(state, _records(pdf), snapshot_for.get(symbol))
        return _rows_to_pdf(rows)

    return updates.groupBy("symbol").applyInPandas(run, schema=SYNC_OUT_SCHEMA)


FUT_STATE_SCHEMA = "synced BOOLEAN, prev_u BIGINT, buffer_json STRING"


def book_sync_stream_futures(
    updates, snapshot_for: dict[str, dict], available_after_ms: int = 0
):
    """Streaming futures sync: applyInPandasWithState keyed by symbol,
    state = (synced, prev_u, pre-sync buffer) — identical state shape
    to the spot operator, different transition rules."""

    def fn(key, pdf_iter, state):
        symbol = key[0]
        deltas: list[dict] = []
        for pdf in pdf_iter:
            deltas.extend(_records(pdf))
        deltas.sort(key=lambda d: d["seq"])
        st = SyncState()
        if state.exists:
            synced, prev_u, buffer_json = state.get
            st.synced, st.prev_u = bool(synced), int(prev_u)
            st.buffer = json.loads(buffer_json)
        snapshot = snapshot_for.get(symbol)
        if snapshot is not None and available_after_ms:
            if all(d["local_timestamp"] < available_after_ms for d in deltas):
                snapshot = None
        rows = _sync_step_futures(st, deltas, snapshot)
        state.update((st.synced, st.prev_u, json.dumps(st.buffer)))
        if rows:
            yield _rows_to_pdf(rows)

    return updates.groupBy("symbol").applyInPandasWithState(
        fn, SYNC_OUT_SCHEMA, FUT_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas variant — typed value/list state, RocksDB
# multi-column-family store; same API symmetry the spot sync has
# (book_sync.BookSyncProcessor). Equivalence to the aIPWS path above
# is pinned in tests/test_book_sync_futures.py.
# ---------------------------------------------------------------------------

try:
    from binance_etl_spark.session import ensure_protobuf

    ensure_protobuf()
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - only if even the shim fails
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]


class FuturesBookSyncProcessor(StatefulProcessor):
    """Keyed by symbol: value state (synced, prev_u) + list state
    (pre-sync buffer in FUT_DELTA_SCHEMA, pu column included)."""

    def __init__(self, snapshot_for: dict[str, dict], available_after_ms: int = 0):
        self._snapshot_for = snapshot_for
        self._available_after_ms = available_after_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._sync = handle.getValueState("sync", "synced BOOLEAN, prev_u BIGINT")
        self._buffer = handle.getListState("buffer", FUT_DELTA_SCHEMA)

    def _load_state(self) -> SyncState:
        st = SyncState()
        if self._sync.exists():
            synced, prev_u = self._sync.get()
            st.synced, st.prev_u = bool(synced), int(prev_u)
        st.buffer = [dict(zip(FUT_DELTA_COLS, row)) for row in self._buffer.get()]
        return st

    def _save_state(self, st: SyncState) -> None:
        self._sync.update((st.synced, st.prev_u))
        self._buffer.clear()
        if st.buffer:
            self._buffer.appendList(
                [tuple(d[c] for c in FUT_DELTA_COLS) for d in st.buffer]
            )

    def handleInputRows(self, key, rows, timerValues):
        symbol = key[0]
        deltas: list[dict] = []
        for pdf in rows:
            deltas.extend(_records(pdf))
        deltas.sort(key=lambda d: d["seq"])
        snapshot = self._snapshot_for.get(symbol)
        if snapshot is not None and self._available_after_ms:
            if all(d["local_timestamp"] < self._available_after_ms for d in deltas):
                snapshot = None
        st = self._load_state()
        out = _sync_step_futures(st, deltas, snapshot)
        self._save_state(st)
        if out:
            yield _rows_to_pdf(out)

    def close(self) -> None:
        pass


def book_sync_stream_futures_tws(
    updates, snapshot_for: dict[str, dict], available_after_ms: int = 0
):
    """transformWithStateInPandas futures sync (needs protobuf +
    RocksDB state store at runtime, like the spot tWS path)."""
    return updates.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=FuturesBookSyncProcessor(snapshot_for, available_after_ms),
        outputStructType=SYNC_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
