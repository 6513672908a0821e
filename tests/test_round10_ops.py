"""Round-10 wave invariants: a pure-Python twin for the maximal-span
substring dedup, and hand-derived semantic facts for the watermarked
streaming OHLCV (the oracle parity suite checks cross-engine
exactness; these check the MATH/SEMANTICS are the intended ones)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF_DIR = "/root/testdata/sf0.001"
K = 5


def test_substring_spans_matches_python_twin(spark):
    from binance_etl_spark.catalog import load

    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, SF_DIR, "documents").collect()
    }
    # gram -> set of docs (md5 of the k-token window, same as the op)
    by_gram: dict[str, set] = defaultdict(set)
    positions: dict[int, list[tuple[int, str]]] = {}
    for doc_id, text in docs.items():
        toks = text.split(" ")
        plist = []
        for i in range(len(toks) - K + 1):
            g = hashlib.md5(" ".join(toks[i : i + K]).encode()).hexdigest()
            by_gram[g].add(doc_id)
            plist.append((i + 1, g))  # 1-based like the op
        positions[doc_id] = plist
    expected = {}
    for doc_id, plist in positions.items():
        dup = [p for p, g in plist if len(by_gram[g]) >= 2]
        if not dup:
            continue
        spans = []
        start = prev = dup[0]
        for p in dup[1:]:
            if p - prev > K - 1:
                spans.append((start, prev))
                start = p
            prev = p
        spans.append((start, prev))
        covered = [e - s + K for s, e in spans]
        expected[doc_id] = (len(spans), sum(covered), max(covered))

    got = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"], r["longest_span"])
        for r in REGISTRY["text_substring_spans"].fn(spark, SF_DIR).collect()
    }
    assert got == expected
    assert expected, "fixture must contain at least one duplicated span"


def test_stream_ohlcv_late_watermark_semantics(spark):
    from binance_etl_spark.plans.analytics7 import (
        _WM_BASE_MS,
        _WM_PHASES,
    )

    rows = {
        (r["symbol"], (r["win_us"] // 1000 - _WM_BASE_MS) // 1000): r
        for r in REGISTRY["stream_ohlcv_late_watermark"]
        .fn(spark, SF_DIR)
        .collect()
    }
    # sentinel window (+1800s) is never emitted (still open at stop)
    assert ("AAA", 1800) not in rows
    # AAA window [0,60): seqs 0,1 (phase 0) + late-accepted seq 4;
    # phase-2 seq 8 (price 9999) DROPPED -> low stays 10010
    w0 = rows[("AAA", 0)]
    assert w0["n_trades"] == 3
    assert w0["open_e2"] == 10_050  # ev +10s is the earliest
    assert w0["low_e2"] == 10_010   # 9_999 was dropped as late
    assert w0["close_e2"] == 10_010  # ev +30s (late seq 4) is last
    # BBB window [60,120): seq 9 at +110s dropped (window already
    # emitted at wm=150s) -> NO such window in the output at all
    assert ("BBB", 60) not in rows
    # BBB window [0,60): seqs 3 and late-accepted 5
    b0 = rows[("BBB", 0)]
    assert b0["n_trades"] == 2
    assert b0["high_e2"] == 20_500 and b0["close_e2"] == 20_500
    # every real (non-sentinel, non-dropped) row is accounted for
    total = sum(r["n_trades"] for r in rows.values())
    n_fixture = sum(len(p) for p in _WM_PHASES)
    assert total == n_fixture - 3  # 2 dropped late rows + 1 sentinel


def test_replay_pacing_is_poll_count_independent(tmp_path):
    """Round-10 determinism pin (r9 verdict item 1): latestOffset is
    IDEMPOTENT between batch constructions — extra availability polls
    (whose count is wall-clock timing) must not admit extra frames.
    Admission advances only via partitions() (batch construction) or
    commit() (restart catch-up)."""
    import json as _json

    from binance_etl_spark.sources.replay import ReplayStreamReader

    log = tmp_path / "frames.jsonl"
    with open(log, "w") as f:
        for i in range(11):
            f.write(
                _json.dumps(
                    {"frame": "{}", "arrival_ms": i, "seq": i}
                )
                + "\n"
            )
    r = ReplayStreamReader(
        {"path": str(log), "maxframesperbatch": "2"}
    )
    r.initialOffset()
    # any number of polls between constructions returns the same end
    assert [r.latestOffset() for _ in range(5)] == [{"index": 2}] * 5
    r.partitions({"index": 0}, {"index": 2})  # batch 0 constructed
    assert [r.latestOffset() for _ in range(3)] == [{"index": 4}] * 3
    r.partitions({"index": 2}, {"index": 4})
    r.commit({"index": 4})
    assert r.latestOffset() == {"index": 6}
    # exhaustion: the gate caps at the log head and stays there
    for s in (4, 6, 8, 10):
        r.partitions({"index": s}, {"index": min(s + 2, 11)})
    assert [r.latestOffset() for _ in range(3)] == [{"index": 11}] * 3
    # restart catch-up: a committed offset ahead of the counter wins
    r2 = ReplayStreamReader(
        {"path": str(log), "maxframesperbatch": "2"}
    )
    r2.initialOffset()
    r2.commit({"index": 8})
    assert r2.latestOffset() == {"index": 10}
