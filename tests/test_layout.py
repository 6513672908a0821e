"""Range-sorted layout + incremental aggregate view sink."""

from __future__ import annotations

import glob
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.sources import fixtures as FX
from binance_etl_spark.streaming.pipelines import trades_stream
from binance_etl_spark.streaming.sinks import (
    foreach_batch_agg_merge,
    write_range_sorted,
)

SF_DIR = "/root/testdata/sf0.001"


def test_range_sorted_files_have_disjoint_ranges(spark):
    out = tempfile.mkdtemp(prefix="besk_range_") + "/orders_ranged"
    write_range_sorted(load(spark, SF_DIR, "orders"), out, "o_totalprice", 4)
    ranges = []
    for f in glob.glob(out + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["o_totalprice"]).statistics
            los.append(st.min)
            his.append(st.max)
        ranges.append((min(los), max(his)))
    assert len(ranges) == 4
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, f"file ranges overlap: {ranges}"

    # pruned read returns the same rows as a full-scan filter
    lo_cut = sorted(r[0] for r in ranges)[2]
    pruned = spark.read.parquet(out).where(F.col("o_totalprice") >= lo_cut).count()
    full = load(spark, SF_DIR, "orders").where(F.col("o_totalprice") >= lo_cut).count()
    assert pruned == full


@pytest.fixture(scope="module")
def fx_paths():
    return FX.write_fixtures(tempfile.mkdtemp(prefix="besk_aggm_fx_"))


def test_incremental_agg_view_matches_batch_and_skips_replay(spark, fx_paths):
    state = tempfile.mkdtemp(prefix="besk_aggm_state_") + "/per_symbol"
    sink = foreach_batch_agg_merge(
        state, ["symbol", "side"], count_col="n", sum_col="qty", sum_src="quantity"
    )
    sdf = trades_stream(spark, fx_paths["trades"], max_frames=3)
    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="besk_aggm_ck_"))
        .foreachBatch(sink)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r.symbol, r.side): (r.n, str(r.qty))
        for r in spark.read.parquet(state).collect()
    }
    from binance_etl_spark.sources.replay import read_replay
    from binance_etl_spark.streaming.parse import parse_trades

    want = {
        (r.symbol, r.side): (r.n, str(r.qty))
        for r in parse_trades(read_replay(spark, fx_paths["trades"]))
        .groupBy("symbol", "side")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("quantity").cast("decimal(20,6)"))
            .cast("decimal(38,6)")
            .alias("qty"),
        )
        .collect()
    }
    assert got == want and got

    # replaying an already-applied micro-batch must be a no-op
    last_id = spark.read.parquet(state).agg(F.max("__batch_id")).first()[0]
    replay = parse_trades(read_replay(spark, fx_paths["trades"]))
    sink(replay, last_id)
    got2 = {
        (r.symbol, r.side): (r.n, str(r.qty))
        for r in spark.read.parquet(state).collect()
    }
    assert got2 == got


def test_compaction_reduces_file_count_losslessly(spark, sf_dir):
    import glob
    import tempfile

    from binance_etl_spark.catalog import load
    from pyspark.sql import functions as F

    e = load(spark, sf_dir, "events").select("event_id", "value")
    frag = tempfile.mkdtemp(prefix="besk_fragtest_") + "/e64"
    e.repartition(64).write.mode("overwrite").parquet(frag)
    compacted = tempfile.mkdtemp(prefix="besk_comptest_") + "/e4"
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(compacted)
    assert len(glob.glob(frag + "/part-*.parquet")) == 64
    assert len(glob.glob(compacted + "/part-*.parquet")) == 4
    a = spark.read.parquet(frag).agg(
        F.count("*"), F.sum(F.col("value").cast("decimal(20,6)"))
    ).first()
    b = spark.read.parquet(compacted).agg(
        F.count("*"), F.sum(F.col("value").cast("decimal(20,6)"))
    ).first()
    assert tuple(a) == tuple(b)


def test_incremental_agg_view_survives_empty_first_batch(spark):
    """Round-1 advisory regression: an empty micro-batch 0 writes a
    schema-only state table whose max(__batch_id) is NULL; batch 1 must
    treat that as 'nothing applied yet' and merge normally, not raise
    TypeError and kill the stream."""
    state = tempfile.mkdtemp(prefix="besk_aggm_empty_") + "/per_symbol"
    sink = foreach_batch_agg_merge(
        state, ["symbol", "side"], count_col="n", sum_col="qty", sum_src="quantity"
    )
    schema = "symbol STRING, side STRING, quantity DOUBLE"
    empty = spark.createDataFrame([], schema)
    sink(empty, 0)  # schema-only state (or none) — must not poison batch 1
    rows = spark.createDataFrame(
        [("BNBUSDT", "buy", 1.5), ("BNBUSDT", "buy", 2.5), ("BNBUSDT", "sell", 1.0)],
        schema,
    )
    sink(rows, 1)
    got = {
        (r.symbol, r.side): (r.n, float(r.qty))
        for r in spark.read.parquet(state).collect()
    }
    assert got == {("BNBUSDT", "buy"): (2, 4.0), ("BNBUSDT", "sell"): (1, 1.0)}


def test_dynamic_partition_overwrite_touches_only_written_partitions(spark, tmp_path):
    """partitionOverwriteMode=dynamic: an overwrite write replaces ONLY
    the partitions present in the incoming data — the daily-reprocess
    primitive (re-run day N without clobbering the rest of the table).
    Static mode (the default) would truncate every partition first."""
    import pyspark.sql.functions as F

    out = str(tmp_path / "events_by_day")
    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .withColumn("day", F.dayofmonth("ts"))
        .select("event_id", "day", "value")
    )
    ev.write.partitionBy("day").parquet(out)
    total = ev.count()
    one_day = ev.where(F.col("day") == 3)
    fixed = one_day.withColumn("value", F.lit(0.0))

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        fixed.write.mode("overwrite").partitionBy("day").parquet(out)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(out)
    assert back.count() == total  # no other partition lost
    assert back.where("day = 3").agg(F.sum("value")).first()[0] == 0.0
    assert back.where("day <> 3").where("value = 0.0").count() == 0
