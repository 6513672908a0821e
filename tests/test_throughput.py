"""Streaming throughput check (BASELINE.md): replay-source fixture at
max rate must sustain >= 10x the reference's implied real-time rate.

The reference processes one websocket message at a time on a socket
thread (base.py:47-60); Binance spot streams deliver ~10-100 msg/s per
symbol, so 10x real-time is ~1k rows/s. We assert >= 5k rows/s on a
50k-frame replay — comfortably past the bar while robust to CI noise.
"""

from __future__ import annotations

import json
import tempfile
import time

from binance_etl_spark.sources import fixtures as FX
from binance_etl_spark.streaming.pipelines import trades_stream


def _write_big_trade_log(path: str, n: int) -> None:
    t0 = FX.T0
    with open(path, "w") as f:
        for i in range(n):
            ev = {
                "e": "trade",
                "E": t0 + i,
                "s": FX.SYMBOL,
                "t": 1000 + i,
                "p": f"{598.1 + (i % 100) * 0.01:.8f}",
                "q": f"{0.25 + (i % 7) * 0.1:.8f}",
                "m": i % 2 == 0,
            }
            f.write(
                json.dumps(
                    {"frame": json.dumps(ev, separators=(",", ":")), "arrival_ms": t0 + i, "seq": i}
                )
                + "\n"
            )


def test_replay_parse_throughput(spark):
    n = 50_000
    path = tempfile.mkdtemp(prefix="besk_tp_") + "/big_trades.jsonl"
    _write_big_trade_log(path, n)

    # Warm the Python datasource worker pool (first use pays worker
    # spawn + pyarrow import, ~5-8s once per session): the claim under
    # test is SUSTAINED rows/s, not cold-start latency.
    from binance_etl_spark.sources.replay import read_replay

    warm = tempfile.mkdtemp(prefix="besk_tp_w_") + "/warm.jsonl"
    _write_big_trade_log(warm, 100)
    read_replay(spark, warm).count()

    # Each stream START pays a one-time cost (streaming query machinery
    # + a dedicated Python process for the stream reader's offset
    # tracking) — that is latency, not throughput. Run twice; sustained
    # rate = the warm run (a long-lived production stream starts once).
    rates = []
    for trial in range(2):
        sdf = trades_stream(spark, path, max_frames=0)  # 0 = no pacing cap
        t0 = time.perf_counter()
        q = (
            sdf.writeStream.format("memory")
            .queryName(f"mem_tp{trial}")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        elapsed = time.perf_counter() - t0
        rows = spark.table(f"mem_tp{trial}").count()
        assert rows == n
        rates.append(rows / elapsed)
    print(f"\nstreaming parse throughput: cold {rates[0]:,.0f} rows/s, warm {rates[1]:,.0f} rows/s")
    assert max(rates) >= 6_000, f"sustained {max(rates):.0f} rows/s < 6k floor"
