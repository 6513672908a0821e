"""Deterministic websocket replay fixtures (FIXTURES.md §B).

Raw JSONL frames in exactly the shapes the reference deserializes
(trade: spot_trades_etl.py:45-55; depth: spot_depth_etl.py:63-73;
snapshot: book_utils.py:29-34).  Arrival time is data, not wall clock,
so streaming runs are reproducible (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import json
import os

SYMBOL = "BNBUSDT"
T0 = 1_727_000_000_000  # fixed epoch-ms base

# ---------------------------------------------------------------------------
# Trades: subscribe ack + 10 trades + 1 malformed frame
# ---------------------------------------------------------------------------


def trade_frames() -> list[tuple[str, int]]:
    """(frame_json, arrival_ms) tuples."""
    frames: list[tuple[str, int]] = [('{"result":null,"id":1}', T0)]
    price = 59810000000  # 598.1 in 1e-8 units
    for i in range(10):
        ev = {
            "e": "trade",
            "E": T0 + 100 * (i + 1),
            "s": SYMBOL,
            "t": 1001 + i,
            "p": f"{(price + i * 5000000) / 1e8:.8f}",
            "q": f"{(25000000 + i * 1000000) / 1e8:.8f}",
            "m": i % 3 == 0,
        }
        frames.append((json.dumps(ev, separators=(",", ":")), T0 + 100 * (i + 1) + 7))
    frames.append(('{"e":"trade","E":172700', T0 + 1200))  # malformed
    return frames


# ---------------------------------------------------------------------------
# Depth: stale frame, bridge, steady, malformed, gap, recovery
# ---------------------------------------------------------------------------


def _lvl(p: float, q: float) -> list[str]:
    return [f"{p:.8f}", f"{q:.8f}"]


def depth_frames() -> list[tuple[str, int]]:
    def ev(E, U, u, b, a):
        return json.dumps(
            {"e": "depthUpdate", "E": E, "s": SYMBOL, "U": U, "u": u, "b": b, "a": a},
            separators=(",", ":"),
        )

    return [
        # stale: u=99 <= lastUpdateId=102 -> dropped (book_utils.py:35)
        (ev(T0 + 50, 95, 99, [_lvl(597.8, 1.0)], []), T0 + 55),
        # bridge: U=100 <= 103 <= u=103 (book_utils.py:42)
        (
            ev(T0 + 150, 100, 103, [_lvl(598.0, 1.5), _lvl(597.9, 0.0)], [_lvl(598.1, 2.0)]),
            T0 + 155,
        ),
        # steady
        (ev(T0 + 250, 104, 106, [_lvl(597.9, 0.8)], [_lvl(598.2, 1.1)]), T0 + 255),
        ('{"e":"depthUpd', T0 + 300),  # malformed -> quarantined
        (ev(T0 + 350, 107, 110, [], [_lvl(598.1, 0.0), _lvl(598.3, 4.0)]), T0 + 355),
        # gap: U=115 != prev_u+1=111 -> flagged (reference raises,
        # spot_depth_etl.py:41-42)
        (ev(T0 + 450, 115, 117, [_lvl(598.0, 2.2)], []), T0 + 455),
        # recovery after gap
        (ev(T0 + 550, 118, 120, [_lvl(597.7, 0.5)], [_lvl(598.4, 0.9)]), T0 + 555),
    ]


def snapshot() -> dict:
    """REST book snapshot (book_utils.py:29-34), lastUpdateId bridges
    into the second depth frame."""
    return {
        "lastUpdateId": 102,
        "bids": [_lvl(598.0, 1.0), _lvl(597.9, 2.5), _lvl(597.8, 0.75)],
        "asks": [_lvl(598.1, 1.2), _lvl(598.2, 3.0), _lvl(598.3, 0.5)],
    }


# ---------------------------------------------------------------------------
# Futures depth: same scenario beats under the futures protocol —
# pu-continuity, u < lastUpdateId staleness, U <= lastUpdateId <= u
# bridge (the markets the reference stubs, factory.py:26-29)
# ---------------------------------------------------------------------------

FUT_SYMBOL = "BTCUSDT"


def futures_depth_frames() -> list[tuple[str, int]]:
    def ev(E, U, u, pu, b, a):
        return json.dumps(
            {
                "e": "depthUpdate", "E": E, "s": FUT_SYMBOL,
                "U": U, "u": u, "pu": pu, "b": b, "a": a,
            },
            separators=(",", ":"),
        )

    return [
        # stale: u=199 < lastUpdateId=200 -> dropped (futures rule is
        # strict <; u == lastUpdateId would be the bridge's right edge)
        (ev(T0 + 50, 195, 199, 190, [_lvl(60100.0, 1.0)], []), T0 + 55),
        # bridge: U=198 <= 200 <= u=203
        (
            ev(T0 + 150, 198, 203, 199,
               [_lvl(60100.5, 2.0), _lvl(60100.0, 0.0)], [_lvl(60101.0, 1.5)]),
            T0 + 155,
        ),
        # steady: pu=203 == prev u -> continuous
        (ev(T0 + 250, 204, 207, 203, [_lvl(60099.5, 0.4)], [_lvl(60101.5, 2.2)]), T0 + 255),
        ('{"e":"depthUpd', T0 + 300),  # malformed -> quarantined
        # gap: pu=210 != prev u=207 -> flagged (the exchange's own
        # restart signal; the engine flags + DLQs instead of crashing)
        (ev(T0 + 350, 211, 214, 210, [], [_lvl(60102.0, 3.0)]), T0 + 355),
        # recovery: pu=214 == prev u -> continuous again
        (ev(T0 + 450, 215, 218, 214, [_lvl(60098.0, 1.1)], []), T0 + 455),
    ]


def futures_snapshot() -> dict:
    return {
        "lastUpdateId": 200,
        "bids": [_lvl(60100.0, 5.0), _lvl(60099.0, 2.0)],
        "asks": [_lvl(60101.0, 4.0), _lvl(60102.0, 1.0)],
    }


def write_fixtures(dirpath: str) -> dict[str, str]:
    """Write all fixture files; returns {kind: path}."""
    os.makedirs(dirpath, exist_ok=True)
    paths = {}

    def _write_jsonl(name: str, frames: list[tuple[str, int]]) -> str:
        path = os.path.join(dirpath, name)
        with open(path, "w") as f:
            for seq, (frame, arrival) in enumerate(frames):
                f.write(
                    json.dumps({"frame": frame, "arrival_ms": arrival, "seq": seq}) + "\n"
                )
        return path

    paths["trades"] = _write_jsonl(f"trades_{SYMBOL}.jsonl", trade_frames())
    paths["depth"] = _write_jsonl(f"depth_{SYMBOL}.jsonl", depth_frames())
    snap_path = os.path.join(dirpath, f"snapshot_{SYMBOL}.json")
    with open(snap_path, "w") as f:
        json.dump(snapshot(), f)
    paths["snapshot"] = snap_path
    paths["futures_depth"] = _write_jsonl(
        f"futures_depth_{FUT_SYMBOL}.jsonl", futures_depth_frames()
    )
    return paths
