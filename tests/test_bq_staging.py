"""BigQuery staging sink (sources/bq_staging.py) — the storage
provider the reference leaves as "todo" (factory.py:40-42): parquet
shards + a load-job manifest, schema mapped to BigQuery types,
replay-idempotent streaming staging, runner integration."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.sources import bq_staging as BQ


def test_schema_mapping_covers_engine_types(spark):
    df = spark.range(1).select(
        F.col("id"),                                   # long -> INT64
        F.lit(1.5).alias("d"),                         # double -> FLOAT64
        F.lit("x").alias("s"),                         # string -> STRING
        F.lit(True).alias("b"),                        # boolean -> BOOL
        F.lit(b"\x00").alias("raw"),                   # binary -> BYTES
        F.current_timestamp().alias("ts"),             # -> TIMESTAMP
        F.lit(1.5).cast("decimal(19,8)").alias("dec"), # -> NUMERIC
        F.array(F.lit(1), F.lit(2)).alias("arr"),      # -> REPEATED INT64
        F.struct(F.lit(1).alias("a")).alias("rec"),    # -> RECORD
    )
    fields = {f["name"]: f for f in BQ.bq_schema(df)}
    assert fields["id"]["type"] == "INT64"
    assert fields["d"]["type"] == "FLOAT64"
    assert fields["s"]["type"] == "STRING"
    assert fields["b"]["type"] == "BOOL"
    assert fields["raw"]["type"] == "BYTES"
    assert fields["ts"]["type"] == "TIMESTAMP"
    assert fields["dec"]["type"] == "NUMERIC"
    assert fields["arr"] == {"name": "arr", "type": "INT64", "mode": "REPEATED"}
    assert fields["rec"]["type"] == "RECORD"
    assert fields["rec"]["fields"][0]["type"] == "INT64"


def test_batch_staging_writes_manifest_last(spark, tmp_path):
    df = spark.range(100).select("id", (F.col("id") * 2).alias("v"))
    mpath = BQ.write_bigquery_staging(
        df, str(tmp_path), "proj.ds.events", write_disposition="WRITE_TRUNCATE"
    )
    m = json.load(open(mpath))
    assert m["destination_table"] == "proj.ds.events"
    assert m["source_format"] == "PARQUET"
    assert m["write_disposition"] == "WRITE_TRUNCATE"
    assert m["source_uris"], "manifest must reference the staged shards"
    for uri in m["source_uris"]:
        assert os.path.exists(uri)
    # the staged bytes ARE the data: reading the manifest's uris back
    # reproduces the frame exactly
    back = spark.read.parquet(*m["source_uris"])
    assert sorted(r.id for r in back.collect()) == list(range(100))
    with pytest.raises(ValueError):
        BQ.write_bigquery_staging(df, str(tmp_path), "t", write_disposition="NOPE")


def test_streaming_staging_is_replay_idempotent(spark, tmp_path):
    apply = BQ.foreach_batch_bigquery(str(tmp_path), "proj.ds.trades")
    apply(spark.range(10), 0)
    apply(spark.range(10, 30), 1)
    apply(spark.range(10, 30), 1)  # checkpoint-recovery replay
    batches = sorted(d for d in os.listdir(tmp_path) if d.startswith("batch="))
    assert batches == ["batch=0", "batch=1"], "replay rewrites, never duplicates"
    total = 0
    for b in batches:
        m = json.load(open(os.path.join(tmp_path, b, "_bq_load_manifest.json")))
        total += spark.read.parquet(*m["source_uris"]).count()
    assert total == 30


def test_runner_bigquery_storage_end_to_end(spark, tmp_path):
    from binance_etl_spark.runner import start_jobs
    from binance_etl_spark.sources import fixtures as FX
    from binance_etl_spark.streaming.pipelines import stop_all

    fx = FX.write_fixtures(str(tmp_path))
    out = str(tmp_path / "bq_out")
    config = {
        "events": [f"binance.spot.{FX.SYMBOL.lower()}.trade"],
        "storage": {
            "format": "bigquery",
            "output_path": out,
            "bigquery_dataset": "proj.market_data",
        },
        "sources": {f"{FX.SYMBOL.lower()}.trade": fx["trades"]},
        "max_frames": 100,
    }
    queries = start_jobs(spark, config)
    try:
        for q in queries:
            q.processAllAvailable()
    finally:
        stop_all(spark)
    stage = os.path.join(out, "spot", FX.SYMBOL.lower(), "trades")
    batches = [d for d in os.listdir(stage) if d.startswith("batch=")]
    assert batches, "at least one staged micro-batch"
    total = 0
    for b in batches:
        m = json.load(open(os.path.join(stage, b, "_bq_load_manifest.json")))
        assert m["destination_table"] == "proj.market_data.spot_bnbusdt_trades"
        total += spark.read.parquet(*m["source_uris"]).count()
    assert total == 10, "all fixture trades staged exactly once"
