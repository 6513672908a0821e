"""foreachBatch SCD2 sink: streaming version history with validity
intervals, idempotent under full replay (SURVEY.md §2.10 sink surface)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from binance_etl_spark.sources import fixtures as FX
from binance_etl_spark.sources.replay import read_replay
from binance_etl_spark.streaming.parse import parse_trades
from binance_etl_spark.streaming.pipelines import trades_stream
from binance_etl_spark.streaming.sinks import foreach_batch_scd2

KEYS = ["symbol", "side"]
ATTRS = ["price", "quantity"]


@pytest.fixture(scope="module")
def fx_paths():
    return FX.write_fixtures(tempfile.mkdtemp(prefix="besk_scd2_fx_"))


def _run(spark, fx_paths, state, ckpt):
    sdf = trades_stream(spark, fx_paths["trades"], max_frames=3)
    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(
            foreach_batch_scd2(state, KEYS, ATTRS, "timestamp", ["id"])
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.read.parquet(state)


def _rows(df):
    return sorted(
        (r["symbol"], r["side"], r["timestamp"], r["id"], str(r["price"]),
         r["valid_to"], r["is_current"])
        for r in df.collect()
    )


def test_scd2_state_matches_batch_history_and_replays_idempotent(spark, fx_paths):
    state = tempfile.mkdtemp(prefix="besk_scd2_state_") + "/trades_hist"
    got = _run(spark, fx_paths, state, tempfile.mkdtemp(prefix="besk_scd2_c1_"))
    got_rows = _rows(got)

    batch = parse_trades(read_replay(spark, fx_paths["trades"]))
    w = Window.partitionBy(*KEYS).orderBy("timestamp", "id")
    want = (
        batch.select(*KEYS, *ATTRS, "timestamp", "id")
        .dropDuplicates(KEYS + ["timestamp", "id"])
        .select("*", F.lead("timestamp").over(w).alias("valid_to"))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
    assert got_rows == _rows(want) and len(got_rows) > 0

    # exactly one open (is_current) version per key
    per_key = (
        got.groupBy(*KEYS).agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
    )
    assert per_key.where("n_open <> 1").count() == 0

    # intervals chain: every closed version's valid_to equals the next
    # version's valid_from within its key
    w2 = Window.partitionBy(*KEYS).orderBy("timestamp", "id")
    chained = got.select(
        "valid_to", F.lead("timestamp").over(w2).alias("next_from")
    ).where(F.col("valid_to").isNotNull())
    assert chained.where("valid_to <> next_from").count() == 0

    # full replay with a fresh checkpoint must reproduce the same table
    again = _run(spark, fx_paths, state, tempfile.mkdtemp(prefix="besk_scd2_c2_"))
    assert _rows(again) == got_rows
