"""Python DataSource writer: commit protocol + reference CSV layout."""

from __future__ import annotations

import csv
import glob
import os

import pyspark.sql.functions as F

from binance_etl_spark.sources import refsink


def _read_all(path: str) -> list[list[str]]:
    rows = []
    for p in sorted(glob.glob(os.path.join(path, "*.csv"))):
        with open(p, newline="") as f:
            rows.extend(list(csv.reader(f)))
    return rows


def test_ref_csv_sink_writes_all_rows_header_once(spark, tmp_path):
    refsink.register(spark)
    out = str(tmp_path / "btcusdt.spot.trades")
    df = spark.range(1000).select(
        F.col("id").alias("trade_id"),
        (F.col("id") * 2).alias("qty"),
    ).repartition(7)
    df.write.format("ref_csv").mode("append").option("path", out).save()

    rows = _read_all(out)
    header = ["trade_id", "qty"]
    assert rows[0] == header
    data = [r for r in rows if r != header]
    assert len(data) == 1000
    assert {int(r[0]) for r in data} == set(range(1000))
    assert all(int(r[1]) == 2 * int(r[0]) for r in data)
    # one part per partition, no temp files left behind
    assert len(glob.glob(os.path.join(out, "part-*.csv"))) == 7
    assert glob.glob(os.path.join(out, ".tmp-*")) == []


def test_ref_csv_sink_second_append_keeps_first_batch(spark, tmp_path):
    """Part names carry a per-job token: appending twice accumulates
    both batches instead of clobbering batch 1's part files."""
    refsink.register(spark)
    out = str(tmp_path / "appends")
    a = spark.range(0, 50).select(F.col("id").alias("v")).repartition(3)
    b = spark.range(50, 80).select(F.col("id").alias("v")).repartition(3)
    a.write.format("ref_csv").mode("append").option("path", out).save()
    b.write.format("ref_csv").mode("append").option("path", out).save()
    rows = [r for r in _read_all(out) if r != ["v"]]
    assert sorted(int(r[0]) for r in rows) == list(range(80))
    assert len(glob.glob(os.path.join(out, "part-*.csv"))) == 6


def test_ref_csv_sink_roundtrips_through_spark_reader(spark, tmp_path):
    refsink.register(spark)
    out = str(tmp_path / "roundtrip")
    src = spark.createDataFrame(
        [(1, "buy", 101.5), (2, "sell", 99.25), (3, "buy", 100.0)],
        "id BIGINT, side STRING, price DOUBLE",
    )
    src.write.format("ref_csv").mode("append").option("path", out).save()
    back = (
        spark.read.option("header", True)
        .schema("id BIGINT, side STRING, price DOUBLE")
        .csv(out)
    )
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in src.collect()
    )


def test_ref_csv_sink_overwrite_replaces_previous_parts(spark, tmp_path):
    refsink.register(spark)
    out = str(tmp_path / "ow")
    a = spark.range(0, 40).select(F.col("id").alias("v")).repartition(4)
    b = spark.range(100, 110).select(F.col("id").alias("v")).repartition(2)
    a.write.format("ref_csv").mode("append").option("path", out).save()
    b.write.format("ref_csv").mode("overwrite").option("path", out).save()
    rows = [int(r[0]) for r in _read_all(out) if r != ["v"]]
    assert sorted(rows) == list(range(100, 110))  # batch 1 fully replaced
    assert len(glob.glob(os.path.join(out, "part-*.csv"))) == 2


def test_ref_csv_sink_property_no_loss_across_random_appends(spark, tmp_path):
    """Losslessness property: across several appends of random sizes and
    partition counts (including empty frames), the union of all parts
    equals the union of all inputs exactly."""
    import random

    rng = random.Random(7)
    refsink.register(spark)
    out = str(tmp_path / "prop")
    expected: list[int] = []
    lo = 0
    for _ in range(5):
        n = rng.choice([0, 1, 17, 256])
        parts = rng.randint(1, 9)
        df = (
            spark.range(lo, lo + n)
            .select(F.col("id").alias("v"))
            .repartition(parts)
        )
        df.write.format("ref_csv").mode("append").option("path", out).save()
        expected.extend(range(lo, lo + n))
        lo += n
    rows = [int(r[0]) for r in _read_all(out) if r != ["v"]]
    assert sorted(rows) == expected
    assert glob.glob(os.path.join(out, ".tmp-*")) == []


def test_ref_csv_sink_commit_spares_other_jobs_temps(spark, tmp_path):
    """Token-scoped stray sweep (ADVICE r2): a CONCURRENT append job's
    in-flight temp files carry a different job token and must survive
    this job's commit — sweeping them would make the other job's
    os.replace publish fail. Our own job's temps are still swept."""
    refsink.register(spark)
    out = str(tmp_path / "concurrent")
    os.makedirs(out)
    foreign = os.path.join(out, ".tmp-deadbeef0123-part-abc.csv")
    with open(foreign, "w") as f:
        f.write("v\n1\n")
    spark.range(10).select(F.col("id").alias("v")).write.format("ref_csv").mode(
        "append"
    ).option("path", out).save()
    assert os.path.exists(foreign)
    assert glob.glob(os.path.join(out, ".tmp-*")) == [foreign]
    # the real batch committed normally around the stranger
    rows = [r for r in _read_all(out) if r != ["v"]]
    assert sorted(int(r[0]) for r in rows) == list(range(10))


def test_ref_csv_stream_sink_roundtrip(spark, tmp_path):
    """Streaming DataSource writer: micro-batches publish atomically
    with batch-id-deterministic part names; all rows land, header once
    per part, no temp files linger."""
    from binance_etl_spark.sources.fixtures import write_fixtures
    from binance_etl_spark.sources.replay import stream_replay
    from binance_etl_spark.streaming.parse import parse_trades

    refsink.register(spark)
    fx = write_fixtures(str(tmp_path / "fx"))
    out = str(tmp_path / "stream_out")
    trades = parse_trades(stream_replay(spark, fx["trades"], 3)).select(
        "symbol", "id", F.col("price").cast("string").alias("price")
    )
    q = (
        trades.writeStream.format("ref_csv")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = [r for r in _read_all(out) if r[0] != "symbol"]
    assert len(rows) == 10  # all fixture trades, none lost
    assert sorted(int(r[1]) for r in rows) == list(range(1001, 1011))
    assert glob.glob(os.path.join(out, ".tmp-*")) == []
    # batch-id-named parts published (one per non-empty task)
    parts = glob.glob(os.path.join(out, "part-b*.csv"))
    assert len(parts) >= 1


def test_ref_csv_stream_sink_restart_is_idempotent(spark, tmp_path):
    """Killing the query and restarting from the same checkpoint must
    not duplicate rows: a replayed batch republishes over the SAME
    deterministic part names."""
    from binance_etl_spark.sources.fixtures import write_fixtures
    from binance_etl_spark.sources.replay import stream_replay
    from binance_etl_spark.streaming.parse import parse_trades

    refsink.register(spark)
    fx = write_fixtures(str(tmp_path / "fx"))
    out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")

    def start():
        trades = parse_trades(stream_replay(spark, fx["trades"], 4)).select("symbol", "id")
        return (
            trades.writeStream.format("ref_csv")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    q2 = start()  # restart from checkpoint: no new input -> no new rows
    q2.processAllAvailable()
    q2.stop()
    rows = [r for r in _read_all(out) if r[0] != "symbol"]
    assert sorted(int(r[1]) for r in rows) == list(range(1001, 1011))
