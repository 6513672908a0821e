"""foreachBatch upsert sink: latest-per-key state table maintained by a
stream, idempotent under full replay (SURVEY.md §2.10 sink surface)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from binance_etl_spark.sources import fixtures as FX
from binance_etl_spark.sources.replay import read_replay
from binance_etl_spark.streaming.parse import parse_trades
from binance_etl_spark.streaming.pipelines import trades_stream
from binance_etl_spark.streaming.sinks import foreach_batch_upsert


@pytest.fixture(scope="module")
def fx_paths():
    return FX.write_fixtures(tempfile.mkdtemp(prefix="besk_ups_fx_"))


def _run_upsert(spark, fx_paths, state, ckpt):
    sdf = trades_stream(spark, fx_paths["trades"], max_frames=3)
    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(foreach_batch_upsert(state, ["symbol", "side"], ["timestamp", "id"]))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(state)


def test_upsert_state_is_latest_per_key_and_replay_idempotent(spark, fx_paths):
    state = tempfile.mkdtemp(prefix="besk_ups_state_") + "/trades_latest"
    got = _run_upsert(spark, fx_paths, state, tempfile.mkdtemp(prefix="besk_ups_c1_"))

    batch = parse_trades(read_replay(spark, fx_paths["trades"]))
    w = Window.partitionBy("symbol", "side").orderBy(
        F.col("timestamp").desc(), F.col("id").desc()
    )
    want = batch.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")

    key = lambda r: (r["symbol"], r["side"])  # noqa: E731
    got_m = {key(r): (r["timestamp"], r["id"]) for r in got.collect()}
    want_m = {key(r): (r["timestamp"], r["id"]) for r in want.collect()}
    assert got_m == want_m and len(got_m) > 0

    # Full replay with a FRESH checkpoint re-merges every batch into the
    # existing state: latest-per-key is a pure function of rows seen, so
    # the state must not change (idempotent upsert).
    again = _run_upsert(spark, fx_paths, state, tempfile.mkdtemp(prefix="besk_ups_c2_"))
    again_m = {key(r): (r["timestamp"], r["id"]) for r in again.collect()}
    assert again_m == want_m
