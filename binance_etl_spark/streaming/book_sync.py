"""Stateful order-book synchronization (SURVEY.md hard-part 1).

Reproduces the reference's sync state machine (book_utils.py:17-51 +
spot_depth_etl.py:35-54) with Spark-native semantics:

- deltas arriving before the snapshot is available are BUFFERED
  (list state; reference buffers in a Python list, book_utils.py:24);
- once the snapshot is known: stale deltas (u <= lastUpdateId) are
  dropped (book_utils.py:34-38), the bridging delta satisfies
  U <= lastUpdateId+1 <= u (book_utils.py:40-47), snapshot rows are
  emitted first with timestamp = local_timestamp - 1 and
  is_snapshot = true (spot_depth_etl.py:114-123), then buffered deltas
  replay in order (spot_depth_etl.py:50-52);
- sequence gaps (U != prev_u + 1) are FLAGGED on the row, not raised
  (the reference crashes the stream, spot_depth_etl.py:41-42 — the
  engine routes to a DLQ filter instead).

One pure-Python core (`_sync_step`) is shared by:
- `book_sync_batch`   — groupBy(symbol).applyInPandas (batch twin),
- `BookSyncProcessor` — transformWithStateInPandas (streaming),
so batch/stream equivalence is structural, not coincidental.

Scale: state per key is O(1) after sync (synced flag + prev_u); the
buffer exists only during the sync window. Keys are (symbol) — 1000s
of symbols spread across executors; Arrow batches amortize the
Python boundary.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pandas as pd

# Flat processor I/O schemas (list-state friendly: primitives only).
DELTA_SCHEMA = (
    "symbol STRING, timestamp BIGINT, local_timestamp BIGINT, "
    "first_update_id BIGINT, last_update_id BIGINT, "
    "bids_json STRING, asks_json STRING, seq BIGINT"
)
SYNC_OUT_SCHEMA = (
    "symbol STRING, timestamp BIGINT, local_timestamp BIGINT, side STRING, "
    "price STRING, quantity STRING, is_snapshot BOOLEAN, "
    "update_id BIGINT, gap BOOLEAN"
)
OUT_COLS = [
    "symbol",
    "timestamp",
    "local_timestamp",
    "side",
    "price",
    "quantity",
    "is_snapshot",
    "update_id",
    "gap",
]


@dataclass
class SyncState:
    synced: bool = False
    prev_u: int = -1
    buffer: list[dict] = field(default_factory=list)


def _emit_levels(out: list, symbol: str, ts: int, local: int, side: str, levels, is_snap: bool, uid: int, gap: bool) -> None:
    for price, qty in levels:
        out.append((symbol, ts, local, side, price, qty, is_snap, uid, gap))


def _emit_delta(out: list, d: dict, gap: bool) -> None:
    _emit_levels(out, d["symbol"], d["timestamp"], d["local_timestamp"], "bid",
                 json.loads(d["bids_json"]), False, d["last_update_id"], gap)
    _emit_levels(out, d["symbol"], d["timestamp"], d["local_timestamp"], "ask",
                 json.loads(d["asks_json"]), False, d["last_update_id"], gap)


def _sync_step(state: SyncState, deltas: list[dict], snapshot: dict | None) -> list[tuple]:
    """Advance the state machine over in-order deltas; returns emitted
    rows. `snapshot` is None while the REST snapshot is not yet
    available (deltas buffer), a dict afterwards."""
    out: list[tuple] = []
    for d in deltas:
        if state.synced:
            gap = d["first_update_id"] != state.prev_u + 1
            _emit_delta(out, d, gap)
            state.prev_u = d["last_update_id"]
            continue
        if snapshot is None:
            state.buffer.append(d)  # reference book_utils.py:24
            continue
        # snapshot known: drain buffer + current delta through sync
        pending = [*state.buffer, d]
        state.buffer = []
        last_id = snapshot["lastUpdateId"]
        for p in pending:
            if state.synced:
                gap = p["first_update_id"] != state.prev_u + 1
                _emit_delta(out, p, gap)
                state.prev_u = p["last_update_id"]
            elif p["last_update_id"] <= last_id:
                continue  # stale (book_utils.py:34-38)
            elif p["first_update_id"] <= last_id + 1 <= p["last_update_id"]:
                # bridge found (book_utils.py:40-47): snapshot first,
                # timestamped 1ms before its local time
                # (spot_depth_etl.py:114-123)
                local = p["local_timestamp"]
                _emit_levels(out, p["symbol"], local - 1, local, "bid",
                             snapshot["bids"], True, last_id, False)
                _emit_levels(out, p["symbol"], local - 1, local, "ask",
                             snapshot["asks"], True, last_id, False)
                _emit_delta(out, p, False)
                state.synced = True
                state.prev_u = p["last_update_id"]
            # else: non-bridging post-snapshot delta before sync —
            # reference warns and keeps waiting (book_utils.py:46)
    return out


def _rows_to_pdf(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=OUT_COLS)


# ---------------------------------------------------------------------------
# Batch twin: groupBy(symbol).applyInPandas
# ---------------------------------------------------------------------------


DELTA_COLS = [
    "symbol",
    "timestamp",
    "local_timestamp",
    "first_update_id",
    "last_update_id",
    "bids_json",
    "asks_json",
    "seq",
]


def _records(pdf: pd.DataFrame) -> list[dict]:
    """pdf (DELTA_SCHEMA) -> list of plain-builtin dicts. Column-wise
    `.tolist()` both converts numpy scalars to JSON-able builtins and
    is ~4x faster than row-wise `to_dict("records")` + per-field
    casts (measured on the 20k-frame bench slab)."""
    cols = [pdf[c].tolist() for c in DELTA_COLS]
    return [dict(zip(DELTA_COLS, t)) for t in zip(*cols)]


def book_sync_batch(updates, snapshot_for: dict[str, dict]):
    """`updates` in DELTA_SCHEMA; snapshot_for maps symbol -> snapshot
    dict (the static side of the reference's stream-static join)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        symbol = pdf["symbol"].iloc[0]
        state = SyncState()
        rows = _sync_step(state, _records(pdf), snapshot_for.get(symbol))
        return _rows_to_pdf(rows)

    return updates.groupBy("symbol").applyInPandas(run, schema=SYNC_OUT_SCHEMA)


# ---------------------------------------------------------------------------
# Streaming
#
# Two implementations of the same state machine:
# - applyInPandasWithState (used by book_sync_stream): GroupState holds
#   (synced, prev_u, buffer_json) — works on any state-store backend.
# - transformWithStateInPandas (BookSyncProcessor): the Spark 4
#   successor with typed value/list state. Requires protobuf (the
#   engine vendors a minimal runtime, session.ensure_protobuf) and a
#   multi-column-family state store (RocksDB). Equivalence to the
#   default path is pinned in tests/test_tws_book_sync.py.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = "synced BOOLEAN, prev_u BIGINT, buffer_json STRING"


def book_sync_stream(updates, snapshot_for: dict[str, dict], available_after_ms: int = 0):
    """updates: streaming DataFrame in DELTA_SCHEMA, keyed by symbol.
    State per key: (synced flag, last update id, pre-sync buffer)."""

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
            # simulate late snapshot arrival (exercises buffering)
            if all(d["local_timestamp"] < available_after_ms for d in deltas):
                snapshot = None
        rows = _sync_step(st, deltas, snapshot)
        state.update((st.synced, st.prev_u, json.dumps(st.buffer)))
        if rows:
            yield _rows_to_pdf(rows)

    return updates.groupBy("symbol").applyInPandasWithState(
        fn, SYNC_OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


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


class BookSyncProcessor(StatefulProcessor):
    """Keyed by symbol. Value state (synced, prev_u) + list state
    (pre-sync delta buffer). The snapshot provider is a pure function
    symbol -> snapshot|None; replay tests inject fixture snapshots,
    a live deployment injects the REST fetch (book_utils.py:26-33)."""

    def __init__(self, snapshot_for: dict[str, dict], available_after_ms: int = 0):
        self._snapshot_for = snapshot_for
        self._available_after_ms = available_after_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._sync = handle.getValueState("sync", "synced BOOLEAN, prev_u BIGINT")
        self._buffer = handle.getListState("buffer", DELTA_SCHEMA)

    def _load_state(self) -> SyncState:
        st = SyncState()
        if self._sync.exists():
            synced, prev_u = self._sync.get()
            st.synced, st.prev_u = bool(synced), int(prev_u)
        st.buffer = [
            dict(zip(
                ["symbol", "timestamp", "local_timestamp", "first_update_id",
                 "last_update_id", "bids_json", "asks_json", "seq"], row))
            for row in self._buffer.get()
        ]
        return st

    def _save_state(self, st: SyncState) -> None:
        self._sync.update((st.synced, st.prev_u))
        self._buffer.clear()
        if st.buffer:
            self._buffer.appendList([
                (d["symbol"], d["timestamp"], d["local_timestamp"],
                 d["first_update_id"], d["last_update_id"],
                 d["bids_json"], d["asks_json"], d["seq"])
                for d in st.buffer
            ])

    def handleInputRows(self, key, rows, timerValues):
        symbol = key[0]
        deltas: list[dict] = []
        for pdf in rows:
            deltas.extend(_records(pdf))
        deltas.sort(key=lambda d: d["seq"])
        snapshot = self._snapshot_for.get(symbol)
        if snapshot is not None and self._available_after_ms:
            # simulate late snapshot arrival: buffer until a delta at or
            # past the availability time shows up
            if all(d["local_timestamp"] < self._available_after_ms for d in deltas):
                snapshot = None
        st = self._load_state()
        out = _sync_step(st, deltas, snapshot)
        self._save_state(st)
        if out:
            yield _rows_to_pdf(out)

    def close(self) -> None:
        pass


def book_sync_stream_tws(updates, snapshot_for: dict[str, dict], available_after_ms: int = 0):
    """transformWithStateInPandas variant (needs protobuf at runtime)."""
    return updates.groupBy("symbol").transformWithStateInPandas(
        statefulProcessor=BookSyncProcessor(snapshot_for, available_after_ms),
        outputStructType=SYNC_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
