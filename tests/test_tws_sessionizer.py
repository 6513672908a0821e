"""Event-time-timer sessionization (streaming/session_tws.py).

Scenario (gap = 1s, watermark delay = 1s), replayed deterministically:

  batch 1: AAA events at t=1000,1200,1400        (one open session)
  batch 2: AAA events at t=5000,5100             (gap-close #1, open #2)
  batch 3: BBB events at t=60000                 (watermark jumps to
           59000 -> AAA's timer at 5100+1000 fires -> timer-close #2;
           BBB's own session stays open: nothing ever passes its
           deadline)

Asserts both closure paths ('gap' inline, 'timer' via the event-time
timer firing when the watermark passes last+gap) and that the
still-live key is NOT emitted — the exact semantics session_window
cannot give (it would close BBB at query end or never emit it)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.sources.replay import stream_replay
from binance_etl_spark.streaming.session_tws import sessionize_tws

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

T0 = 1_727_000_000_000


def _frames():
    evs = [
        ("AAA", 1000), ("AAA", 1200), ("AAA", 1400),
        ("AAA", 5000), ("AAA", 5100),
        ("BBB", 60000),
    ]
    out = []
    for i, (sym, t) in enumerate(evs):
        f = {"e": "trade", "E": T0 + t, "s": sym, "t": 2000 + i,
             "p": "1.00000000", "q": "1.00000000", "m": False}
        out.append((json.dumps(f, separators=(",", ":")), T0 + t))
    return out


@pytest.fixture()
def replay_path(tmp_path):
    p = tmp_path / "sessions.jsonl"
    with open(p, "w") as f:
        for seq, (frame, arrival) in enumerate(_frames()):
            f.write(json.dumps({"frame": frame, "arrival_ms": arrival, "seq": seq}) + "\n")
    return str(p)


@pytest.fixture()
def rocksdb_state(spark):
    prior = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    yield
    if prior is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, prior)


def test_timer_closed_sessions(spark, replay_path, rocksdb_state):
    from binance_etl_spark.streaming.parse import parse_trades

    # 3 frames per micro-batch -> the batch boundaries in the scenario
    events = (
        parse_trades(stream_replay(spark, replay_path, 3))
        .select("symbol", "timestamp")
        .withColumn("event_time", F.timestamp_millis("timestamp"))
        .withWatermark("event_time", "1 second")
    )
    sessions = sessionize_tws(events, gap_ms=1000)
    q = (
        sessions.writeStream.format("memory")
        .queryName("mem_sessions")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        (r.symbol, r.session_start - T0, r.session_end - T0, r.n_events, r.closed_by)
        for r in spark.table("mem_sessions").collect()
    )
    assert rows == [
        ("AAA", 1000, 1400, 3, "gap"),      # closed inline by the 5000 event
        ("AAA", 5000, 5100, 2, "timer"),    # closed by the event-time timer
    ]
    # BBB never emitted: its deadline (61000) is past the final watermark
