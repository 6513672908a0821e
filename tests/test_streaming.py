"""Streaming surface tests: replay source, parse, book sync (golden +
batch/stream equivalence), checkpointed sink restart (SURVEY.md §5.2)."""

from __future__ import annotations

import tempfile

import pytest

from binance_etl_spark.sources import fixtures as FX
from binance_etl_spark.sources.replay import read_replay
from binance_etl_spark.streaming.book_sync import book_sync_batch
from binance_etl_spark.streaming.parse import (
    explode_depth_rows,
    parse_depth_updates,
    parse_trades,
)
from binance_etl_spark.streaming.pipelines import (
    depth_stream,
    trades_stream,
    write_table_stream,
)


@pytest.fixture(scope="module")
def fx_paths():
    d = tempfile.mkdtemp(prefix="besk_fx_")
    return FX.write_fixtures(d)


def _collect_sorted(df, keys):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(str(x) for x in t))


# ---------------------------------------------------------------------------
# Replay source + parse (batch)
# ---------------------------------------------------------------------------


def test_replay_batch_trades(spark, fx_paths):
    frames = read_replay(spark, fx_paths["trades"])
    assert frames.count() == 12  # ack + 10 trades + malformed
    trades = parse_trades(frames).collect()
    assert len(trades) == 10  # ack + malformed dropped
    sides = [t.side for t in trades]
    assert sides.count("sell") == 4 and sides.count("buy") == 6  # m = i%3==0
    t0 = sorted(trades, key=lambda t: t.id)[0]
    assert t0.symbol == FX.SYMBOL
    assert str(t0.price) == "598.100000000000000000"
    assert t0.local_timestamp == t0.timestamp + 7


def test_replay_batch_depth_explode(spark, fx_paths):
    updates = parse_depth_updates(read_replay(spark, fx_paths["depth"]))
    assert updates.count() == 6  # malformed dropped
    rows = explode_depth_rows(updates)
    # level-count conservation: sum(len(bids)+len(asks)) per fixture
    assert rows.count() == 1 + 3 + 2 + 2 + 1 + 2


# ---------------------------------------------------------------------------
# Book sync: golden semantics (batch twin)
# ---------------------------------------------------------------------------


def _golden_sync_rows(spark, fx_paths):
    updates = parse_depth_updates(read_replay(spark, fx_paths["depth"]))
    return book_sync_batch(updates, {FX.SYMBOL: FX.snapshot()}).collect()


def test_book_sync_golden(spark, fx_paths):
    rows = _golden_sync_rows(spark, fx_paths)
    assert len(rows) == 16
    by_seq = sorted(rows, key=lambda r: (r.update_id, not r.is_snapshot, r.side, r.price))

    snap = [r for r in rows if r.is_snapshot]
    assert len(snap) == 6  # 3 bids + 3 asks
    # snapshot ordered before the bridge delta: ts = local - 1
    assert all(r.timestamp == r.local_timestamp - 1 for r in snap)
    assert {r.update_id for r in snap} == {102}

    # stale frame (u=99) never emitted
    assert all(r.update_id != 99 for r in rows)
    # bridge frame emitted with its 3 levels
    assert len([r for r in rows if r.update_id == 103]) == 3
    # gap flagged exactly on the jump frame (115-117 after 110)
    gaps = [r for r in rows if r.gap]
    assert {r.update_id for r in gaps} == {117}
    # recovery frame not flagged
    assert all(not r.gap for r in rows if r.update_id == 120)
    # zero-quantity delete rows flow through (downstream rebuild drops)
    zero = [r for r in rows if float(r.quantity) == 0.0]
    assert {(r.update_id, r.side) for r in zero} == {(103, "bid"), (110, "ask")}
    assert by_seq[0].is_snapshot


# ---------------------------------------------------------------------------
# Batch/stream equivalence
# ---------------------------------------------------------------------------


def _run_stream_to_memory(spark, sdf, name):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def test_trades_stream_equals_batch(spark, fx_paths):
    batch = parse_trades(read_replay(spark, fx_paths["trades"]))
    stream = _run_stream_to_memory(
        spark, trades_stream(spark, fx_paths["trades"], max_frames=3), "mem_trades"
    )
    assert _collect_sorted(stream, None) == _collect_sorted(batch, None)


def test_depth_stream_equals_batch(spark, fx_paths):
    snap = {FX.SYMBOL: FX.snapshot()}
    batch = book_sync_batch(
        parse_depth_updates(read_replay(spark, fx_paths["depth"])), snap
    )
    stream = _run_stream_to_memory(
        spark,
        depth_stream(spark, fx_paths["depth"], snap, max_frames=2),
        "mem_depth",
    )
    got = sorted(
        [(r.update_id, r.side, str(r.price), str(r.quantity), r.is_snapshot, r.gap)
         for r in stream.collect()]
    )
    want = sorted(
        [(r.update_id, r.side, str(float(r.price)), str(float(r.quantity)), r.is_snapshot, r.gap)
         for r in batch.collect()]
    )
    # compare on normalized floats: batch emits raw strings, stream casts
    got_norm = sorted([(u, s, str(float(p)), str(float(qy)), isn, g) for u, s, p, qy, isn, g in got])
    assert got_norm == want
    assert len(got) == 16


# ---------------------------------------------------------------------------
# Checkpointed sink: exactly-once across restart (vs reference's lossy
# tail, base.py:39-45)
# ---------------------------------------------------------------------------


def test_checkpoint_restart_no_dup_no_loss(spark, fx_paths):
    out = tempfile.mkdtemp(prefix="besk_sink_")
    ckpt = tempfile.mkdtemp(prefix="besk_ckpt_")
    sdf = trades_stream(spark, fx_paths["trades"], max_frames=4)
    q = write_table_stream(sdf, out + "/t", ckpt)
    q.processAllAvailable()
    q.stop()
    n1 = spark.read.parquet(out + "/t").count()
    # restart against the same checkpoint: no reprocessing
    sdf2 = trades_stream(spark, fx_paths["trades"], max_frames=4)
    q2 = write_table_stream(sdf2, out + "/t", ckpt)
    q2.processAllAvailable()
    q2.stop()
    n2 = spark.read.parquet(out + "/t").count()
    assert n1 == 10 and n2 == 10


# ---------------------------------------------------------------------------
# Stream-stream join (SURVEY.md §2.5 NS): trades x depth in flight
# ---------------------------------------------------------------------------


def test_stream_stream_interval_join(spark, fx_paths):
    """Each trade joined to depth updates of the same symbol within
    ±1s of its event time — watermarks on both sides bound the state."""
    from pyspark.sql import functions as F

    trades = (
        trades_stream(spark, fx_paths["trades"], max_frames=50)
        .withColumn("t_ts", F.timestamp_millis("timestamp"))
        .withWatermark("t_ts", "5 seconds")
        .select("symbol", "t_ts", F.col("id").alias("trade_id"))
    )
    from binance_etl_spark.sources.replay import stream_replay
    from binance_etl_spark.streaming.parse import parse_depth_updates

    depth = (
        parse_depth_updates(stream_replay(spark, fx_paths["depth"], 50))
        .withColumn("d_ts", F.timestamp_millis("timestamp"))
        .withWatermark("d_ts", "5 seconds")
        .select(F.col("symbol").alias("d_symbol"), "d_ts", "last_update_id")
    )
    joined = trades.join(
        depth,
        (trades.symbol == depth.d_symbol)
        & (depth.d_ts >= trades.t_ts - F.expr("INTERVAL 1 SECOND"))
        & (depth.d_ts <= trades.t_ts + F.expr("INTERVAL 1 SECOND")),
        "inner",
    )
    out = joined.select(
        "symbol",
        F.col("trade_id"),
        F.unix_millis("t_ts").alias("t_ms"),
        "last_update_id",
        F.unix_millis("d_ts").alias("d_ms"),
    )
    q = out.writeStream.format("memory").queryName("mem_ss").outputMode("append").start()
    q.processAllAvailable()
    # sink progress metrics: the engine twin of the reference's
    # total_messages counters (base.py:76-81)
    progress = q.lastProgress
    q.stop()
    rows = spark.table("mem_ss").collect()
    # every (trade, depth-update) pair within 1s: trades at T0+100..1000,
    # 6 parsed depth events (incl. the pre-snapshot stale frame — sync
    # drops it later, parse does not) at T0+{50,150,250,350,450,550}
    assert len(rows) == 10 * 6
    assert progress is not None and "sources" in progress
    # stream == batch twin (the oracle-checked registry query
    # join_stream_stream): watermarks bound state, not which in-window
    # pairs an inner join emits
    from binance_etl_spark.plans import registry

    batch = registry.queries()["join_stream_stream"](spark, "")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch.collect()))


# ---------------------------------------------------------------------------
# Watermarks + event-time windows + in-stream dedup (SURVEY.md §2.10)
# ---------------------------------------------------------------------------


def test_watermark_windowed_ohlcv(spark, fx_paths):
    """Event-time tumbling window with watermark over the trade stream:
    the streaming twin of stream_ohlcv_bars."""
    from pyspark.sql import functions as F

    sdf = trades_stream(spark, fx_paths["trades"], max_frames=20)
    bars = (
        sdf.withColumn("ev_ts", F.timestamp_millis("timestamp"))
        .withWatermark("ev_ts", "10 seconds")
        .groupBy(F.window("ev_ts", "1 second"), "symbol")
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.sum("quantity").alias("volume"),
        )
    )
    q = (
        bars.writeStream.format("memory")
        .queryName("mem_bars")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("mem_bars").collect()
    assert sum(r.n_trades for r in rows) == 10
    assert len(rows) == 2  # trades span T0+100..T0+1000 -> two 1s buckets


def test_stream_dedup_within_watermark(spark, fx_paths):
    """dropDuplicatesWithinWatermark on trade id — bounded-state dedup
    (the reference relies on ws delivery uniqueness; the engine makes
    it explicit, SURVEY.md §2.10 'dedup by id')."""
    from pyspark.sql import functions as F

    # duplicate the replay log to force redelivery
    import shutil

    dup_path = fx_paths["trades"] + ".dup"
    with open(fx_paths["trades"]) as src, open(dup_path, "w") as dst:
        content = src.read()
        dst.write(content)
        # re-append with shifted seq so the source emits them again
        import json as _json

        for line in content.strip().splitlines():
            rec = _json.loads(line)
            rec["seq"] += 100
            dst.write(_json.dumps(rec) + "\n")
    sdf = trades_stream(spark, dup_path, max_frames=50)
    deduped = (
        sdf.withColumn("ev_ts", F.timestamp_millis("timestamp"))
        .withWatermark("ev_ts", "10 seconds")
        .dropDuplicatesWithinWatermark(["id"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("mem_dedup")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("mem_dedup").collect()
    assert len(rows) == 10  # 20 delivered, 10 unique ids
    shutil.os.remove(dup_path)


def test_reference_csv_sink_layout(spark, fx_paths):
    """write_reference_csv reproduces the reference's exact file naming
    and header-once shape (reference storage.py:57-75)."""
    import os
    import tempfile

    from binance_etl_spark.sources.replay import read_replay
    from binance_etl_spark.streaming.sinks import write_reference_csv

    trades = parse_trades(read_replay(spark, fx_paths["trades"]))
    out = tempfile.mkdtemp(prefix="besk_refcsv_")
    path = write_reference_csv(trades, out, FX.SYMBOL, "spot", "trades")
    assert os.path.basename(path) == f"{FX.SYMBOL}.spot.trades.csv"
    lines = open(path).read().strip().splitlines()
    assert lines[0].startswith("symbol,timestamp,local_timestamp,id,side,price,quantity")
    assert len(lines) == 11  # header + 10 trades
    # values survive the round trip
    back = spark.read.csv(path, header=True, inferSchema=False)
    assert back.count() == 10


def test_streaming_session_window(spark, fx_paths):
    """session_window + watermark in a real stream (batch analog:
    win_session query)."""
    from pyspark.sql import functions as F

    sdf = trades_stream(spark, fx_paths["trades"], max_frames=20)
    sessions = (
        sdf.withColumn("ev_ts", F.timestamp_millis("timestamp"))
        .withWatermark("ev_ts", "10 seconds")
        .groupBy(F.session_window("ev_ts", "300 milliseconds"), "symbol")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("mem_sessions")
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("mem_sessions").collect()
    # trades are 100ms apart -> gaps < 300ms merge into one session
    assert sum(r.n for r in rows) == 10
    assert len(rows) == 1


def test_live_spool_tail(spark, fx_paths):
    """The live-websocket path minus the socket: a spool file growing
    between micro-batches is picked up by the same replay reader
    (sources/websocket.py writes spools in exactly this format)."""
    import shutil

    from binance_etl_spark.sources.websocket import stream_live

    spool = fx_paths["trades"] + ".spool"
    with open(fx_paths["trades"]) as src:
        lines = src.read().strip().splitlines()
    with open(spool, "w") as f:
        f.write("\n".join(lines[:6]) + "\n")
    sdf = parse_trades(stream_live(spark, spool, max_frames_per_batch=100))
    q = sdf.writeStream.format("memory").queryName("mem_live").outputMode("append").start()
    q.processAllAvailable()
    n_first = spark.table("mem_live").count()
    with open(spool, "a") as f:  # frames arrive while the query runs
        f.write("\n".join(lines[6:]) + "\n")
    q.processAllAvailable()
    q.stop()
    n_total = spark.table("mem_live").count()
    assert n_first == 5  # frames 0-5: ack dropped
    assert n_total == 10
    shutil.os.remove(spool)


# ---------------------------------------------------------------------------
# Property tests: sync invariants (SURVEY.md §5.2 item 4)
# ---------------------------------------------------------------------------


def test_sync_invariants_random_streams():
    import json
    import random

    from binance_etl_spark.streaming.book_sync import SyncState, _sync_step

    rng = random.Random(42)
    for _ in range(200):
        last_id = rng.randint(50, 150)
        snapshot = {"lastUpdateId": last_id, "bids": [["1.0", "1.0"]], "asks": []}
        u = rng.randint(last_id - 30, last_id + 5)
        deltas = []
        for seq in range(rng.randint(1, 15)):
            span = rng.randint(0, 3)
            U = u + 1 + (rng.randint(1, 10) if rng.random() < 0.2 else 0)
            u = U + span
            deltas.append(
                {
                    "symbol": "S",
                    "timestamp": 1000 + seq,
                    "local_timestamp": 1007 + seq,
                    "first_update_id": U,
                    "last_update_id": u,
                    "bids_json": json.dumps([["1.0", "2.0"]]),
                    "asks_json": "[]",
                    "seq": seq,
                }
            )
        state = SyncState()
        rows = _sync_step(state, deltas, snapshot)
        emitted_uids = [r[7] for r in rows if not r[6]]
        # 1. nothing stale is ever emitted
        assert all(uid > last_id for uid in emitted_uids)
        # 2. snapshot rows precede all delta rows iff sync happened
        snap_rows = [r for r in rows if r[6]]
        if snap_rows:
            first_delta_idx = min(i for i, r in enumerate(rows) if not r[6])
            assert max(i for i, r in enumerate(rows) if r[6]) < first_delta_idx or all(
                r[6] for r in rows[:first_delta_idx]
            )
        # 3. the gap flag is exactly (U != prev_emitted_u + 1) per delta
        if state.synced:
            by_u = {d["last_update_id"]: d for d in deltas}
            seen: list[int] = []
            flags: dict[int, bool] = {}
            for r in rows:
                if r[6]:
                    continue
                if not seen or seen[-1] != r[7]:
                    seen.append(r[7])
                flags[r[7]] = r[8]
            for prev_u_, uid in zip(seen, seen[1:]):
                expected_gap = by_u[uid]["first_update_id"] != prev_u_ + 1
                assert flags[uid] == expected_gap


# ---------------------------------------------------------------------------
# Stream-static join (SURVEY.md §2.5): in-flight dim enrichment
# ---------------------------------------------------------------------------


def test_stream_static_broadcast_join(spark, fx_paths):
    """Trades stream enriched against a static symbol-dim DataFrame —
    the streaming analog of the reference's one-shot snapshot reuse
    (book_utils.py:26-33: fetch once, apply to every later message).
    The static side is broadcast: no stream-side shuffle."""
    from pyspark.sql import functions as F

    dim = spark.createDataFrame(
        [("BNBUSDT", "spot", 8), ("BTCUSDT", "spot", 8)],
        "symbol STRING, market STRING, px_decimals INT",
    )
    sdf = trades_stream(spark, fx_paths["trades"], max_frames=3)
    enriched = sdf.join(F.broadcast(dim), "symbol", "left")
    got = _run_stream_to_memory(spark, enriched, "mem_ssj")
    batch = parse_trades(read_replay(spark, fx_paths["trades"])).join(
        F.broadcast(dim), "symbol", "left"
    )
    assert _collect_sorted(got, None) == _collect_sorted(batch, None)
    assert got.where(F.col("market").isNull()).count() == 0
