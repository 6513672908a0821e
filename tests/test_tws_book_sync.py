"""transformWithStateInPandas book sync — the SURVEY-planned state API
(§2.13 deviation closed in round 3).

Runs the REAL tWS code path end-to-end: Python worker <-> JVM state
server speaking protobuf StateMessage over the vendored minimal
runtime (binance_etl_spark/vendor — used only when no real protobuf is
installed). Asserts the tWS stream reproduces the golden fixture
EXACTLY like the applyInPandasWithState path, including across
multiple micro-batches (state persists between batches through value
state + list state)."""

from __future__ import annotations

import pytest

from binance_etl_spark.session import ensure_protobuf
from binance_etl_spark.sources import fixtures as FX
from binance_etl_spark.sources.replay import stream_replay
from binance_etl_spark.streaming.book_sync import (
    book_sync_stream,
    book_sync_stream_tws,
)
from binance_etl_spark.streaming.parse import parse_depth_updates


@pytest.fixture(scope="module")
def fx_paths(tmp_path_factory):
    return FX.write_fixtures(str(tmp_path_factory.mktemp("fx_tws")))


def _protobuf_available() -> bool:
    try:
        ensure_protobuf()
        return True
    except Exception:
        return False


_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_state(spark):
    """tWS needs multiple column families (one per state variable) —
    HDFSBackedStateStoreProvider cannot; RocksDB (the production
    backend, bundled with Spark) can."""
    prior = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    yield
    if prior is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, prior)


def _run(spark, sdf, name):
    q = sdf.writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    return spark.table(name).collect()


def _norm(rows):
    return sorted(
        (
            r.symbol,
            r.timestamp,
            r.local_timestamp,
            r.side,
            str(float(r.price)),
            str(float(r.quantity)),
            r.is_snapshot,
            r.update_id,
            r.gap,
        )
        for r in rows
    )


@pytest.mark.skipif(not _protobuf_available(), reason="no protobuf and shim failed")
def test_tws_matches_apply_in_pandas_with_state(spark, fx_paths, rocksdb_state):
    snap = {FX.SYMBOL: FX.snapshot()}
    # max_frames=2 -> several micro-batches: state must survive batch
    # boundaries through the JVM state store in BOTH implementations
    updates_a = parse_depth_updates(stream_replay(spark, fx_paths["depth"], 2))
    got_aip = _norm(_run(spark, book_sync_stream(updates_a, snap), "mem_aip"))

    updates_b = parse_depth_updates(stream_replay(spark, fx_paths["depth"], 2))
    got_tws = _norm(_run(spark, book_sync_stream_tws(updates_b, snap), "mem_tws"))

    assert got_tws == got_aip
    assert len(got_tws) == 16  # golden row count (test_book_sync_golden)
    assert any(r[6] for r in got_tws)  # snapshot rows present


@pytest.mark.skipif(not _protobuf_available(), reason="no protobuf and shim failed")
def test_tws_late_snapshot_buffers_in_list_state(spark, fx_paths, rocksdb_state):
    """Snapshot unavailable for the first micro-batches: deltas must
    BUFFER in tWS list state and replay once the snapshot appears —
    the same late-snapshot scenario the applyInPandasWithState path
    tests, now through typed list state."""
    snap = {FX.SYMBOL: FX.snapshot()}
    t0 = FX.T0
    updates_a = parse_depth_updates(stream_replay(spark, fx_paths["depth"], 2))
    got_aip = _norm(
        _run(spark, book_sync_stream(updates_a, snap, available_after_ms=t0 + 350), "mem_aip_late")
    )
    updates_b = parse_depth_updates(stream_replay(spark, fx_paths["depth"], 2))
    got_tws = _norm(
        _run(
            spark,
            book_sync_stream_tws(updates_b, snap, available_after_ms=t0 + 350),
            "mem_tws_late",
        )
    )
    assert got_tws == got_aip


@pytest.mark.skipif(not _protobuf_available(), reason="no protobuf and shim failed")
def test_tws_buffer_survives_checkpoint_restart(spark, tmp_path, rocksdb_state):
    """Kill the tWS query MID-SYNC — deltas buffered in typed LIST
    STATE, snapshot not yet available, zero rows emitted — then
    restart from the checkpoint against the grown spool. The buffered
    deltas must replay from RocksDB-persisted list state and the final
    output must equal one uninterrupted run: the restart guarantee for
    the reference's core loop (base.py:47-60), which buffers in a
    Python list and would lose it on any crash."""
    import json as _json

    snap = {FX.SYMBOL: FX.snapshot()}
    t0 = FX.T0
    cutoff = t0 + 350

    full = FX.write_fixtures(str(tmp_path / "fx"))["depth"]
    lines = open(full).read().splitlines(keepends=False)
    early = [ln for ln in lines if _json.loads(ln)["arrival_ms"] < cutoff]
    late = [ln for ln in lines if _json.loads(ln)["arrival_ms"] >= cutoff]
    assert early and late, "fixture must split around the cutoff"

    spool = str(tmp_path / "depth_grow.jsonl")
    with open(spool, "w") as f:
        f.write("\n".join(early) + "\n")

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        updates = parse_depth_updates(stream_replay(spark, spool, 2))
        q = (
            book_sync_stream_tws(updates, snap, available_after_ms=cutoff)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()  # phase 1: everything buffers, nothing emits
    phase1 = spark.read.parquet(out)
    assert phase1.count() == 0, "mid-sync: buffered deltas must not emit"

    with open(spool, "a") as f:  # the spool grows while 'down'
        f.write("\n".join(late) + "\n")
    run_once()  # phase 2: restart from checkpoint, snapshot available

    golden_updates = parse_depth_updates(stream_replay(spark, full, 2))
    golden = _norm(
        _run(
            spark,
            book_sync_stream(golden_updates, snap, available_after_ms=cutoff),
            "mem_golden_restart",
        )
    )
    got = _norm(spark.read.parquet(out).collect())
    assert got == golden, "restarted run must equal one uninterrupted run"
    assert any(r[6] for r in got), "snapshot rows present after replay"
