"""Hypothesis property tests for the book-sync state machine core
(SURVEY.md §5.2 item 4). Pure-Python `_sync_step` — no Spark session —
so hundreds of generated streams run in milliseconds.

Invariants (reference semantics, book_utils.py:17-51):
1. nothing with u <= snapshot.lastUpdateId is ever emitted (stale drop);
2. snapshot rows precede every delta row, carry is_snapshot=True and
   timestamp = local_timestamp - 1;
3. sync happens iff some pending delta bridges U <= last_id+1 <= u;
4. the gap flag on each emitted delta equals (U != prev_emitted_u + 1);
5. level-count conservation: emitted delta rows = sum of levels of
   emitted updates; buffering without a snapshot emits nothing and
   keeps every delta.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from binance_etl_spark.streaming.book_sync import SyncState, _sync_step


@st.composite
def delta_streams(draw):
    last_id = draw(st.integers(min_value=10, max_value=200))
    u = draw(st.integers(min_value=last_id - 20, max_value=last_id + 3))
    n = draw(st.integers(min_value=1, max_value=20))
    deltas = []
    for seq in range(n):
        gap = draw(st.integers(min_value=0, max_value=8))
        jump = draw(st.booleans())
        U = u + 1 + (gap if jump else 0)
        u = U + draw(st.integers(min_value=0, max_value=3))
        n_bids = draw(st.integers(min_value=0, max_value=3))
        n_asks = draw(st.integers(min_value=0, max_value=2))
        deltas.append(
            {
                "symbol": "S",
                "timestamp": 1000 + 10 * seq,
                "local_timestamp": 1007 + 10 * seq,
                "first_update_id": U,
                "last_update_id": u,
                "bids_json": json.dumps([["1.0", f"{b}.0"] for b in range(n_bids)]),
                "asks_json": json.dumps([["2.0", f"{a}.0"] for a in range(n_asks)]),
                "seq": seq,
            }
        )
    return {"lastUpdateId": last_id, "bids": [["1.0", "1.0"]], "asks": [["2.0", "1.0"]]}, deltas


def _levels(d):
    return len(json.loads(d["bids_json"])) + len(json.loads(d["asks_json"]))


@settings(max_examples=300, deadline=None)
@given(delta_streams())
def test_sync_invariants(case):
    snapshot, deltas = case
    last_id = snapshot["lastUpdateId"]
    state = SyncState()
    rows = _sync_step(state, deltas, snapshot)

    snap_rows = [r for r in rows if r[6]]
    delta_rows = [r for r in rows if not r[6]]

    # (1) stale never emitted
    assert all(r[7] > last_id for r in delta_rows)

    # (2) snapshot-first, flagged, ts = local - 1
    if snap_rows:
        last_snap_idx = max(i for i, r in enumerate(rows) if r[6])
        first_delta_idx = min((i for i, r in enumerate(rows) if not r[6]), default=len(rows))
        assert last_snap_idx < first_delta_idx
        assert all(r[1] == r[2] - 1 and r[7] == last_id for r in snap_rows)

    # (3) sync iff a bridging delta exists among non-stale deltas
    bridgeable = any(
        d["first_update_id"] <= last_id + 1 <= d["last_update_id"] for d in deltas
    )
    assert state.synced == bridgeable
    assert bool(snap_rows) == bridgeable

    # (4) gap flag is exact — replay the sequencing independently.
    # NB zero-level updates emit no rows but still advance prev_u.
    by_u = {d["last_update_id"]: d for d in deltas}
    synced = False
    prev_u = None
    expected_flags: dict[int, bool] = {}
    for d in deltas:
        if not synced:
            if d["last_update_id"] <= last_id:
                continue
            if d["first_update_id"] <= last_id + 1 <= d["last_update_id"]:
                synced = True
                expected_flags[d["last_update_id"]] = False
                prev_u = d["last_update_id"]
            continue
        expected_flags[d["last_update_id"]] = d["first_update_id"] != prev_u + 1
        prev_u = d["last_update_id"]
    for r in delta_rows:
        assert r[8] == expected_flags[r[7]]

    # (5) conservation + buffering
    if state.synced:
        assert len(delta_rows) == sum(_levels(by_u[u]) for u in expected_flags)
        assert state.buffer == []
    # unsynced + no snapshot -> everything buffered, nothing emitted
    state2 = SyncState()
    rows2 = _sync_step(state2, deltas, None)
    assert rows2 == [] and len(state2.buffer) == len(deltas)


@settings(max_examples=100, deadline=None)
@given(delta_streams(), st.integers(min_value=1, max_value=5))
def test_incremental_equals_oneshot(case, split_at):
    """Feeding deltas in several micro-batches (state carried) emits
    exactly what one big batch emits — the batch/stream equivalence
    property at the state-machine level."""
    snapshot, deltas = case
    k = min(split_at, len(deltas))
    one = _sync_step(SyncState(), deltas, snapshot)
    st_inc = SyncState()
    inc = _sync_step(st_inc, deltas[:k], snapshot) + _sync_step(st_inc, deltas[k:], snapshot)
    assert one == inc
