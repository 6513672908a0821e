"""Batch/stream equivalence for streaming multi-touch attribution
(streaming/attribution_tws.py vs plans/analytics4.py::
win_attribution): the same sf0.001 event tape, streamed as 4
time-ordered micro-batches (file mtimes force the batch order — the
contract pinned in tests/test_cdc_stream.py), must emit credit rows
whose per-channel sums equal the registered batch query EXACTLY —
first-touch, last-touch, and floor-ppm linear credits alike."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.streaming.attribution_tws import (
    CHANNELS,
    PURCHASE,
    attribution_tws,
)

SF = "/root/testdata/sf0.001"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_state(spark):
    prior = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    yield
    if prior is None:
        spark.conf.unset(_PROVIDER_KEY)
    else:
        spark.conf.set(_PROVIDER_KEY, prior)


def _coded_events(spark):
    e = load(spark, SF, "events").where(
        F.col("event_type").isin(list(CHANNELS) + ["purchase"])
    )
    code = F.when(F.col("event_type") == "purchase", PURCHASE)
    for name, c in CHANNELS.items():
        code = code.when(F.col("event_type") == name, c)
    return e.select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        F.col("event_id").alias("eid"),
        code.cast("int").alias("code"),
    )


def test_stream_attribution_matches_batch(spark, tmp_path, rocksdb_state):
    ev = _coded_events(spark)

    src = str(tmp_path / "src")
    os.makedirs(src)
    qs = ev.approxQuantile("tu", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf")] + qs + [float("inf")]
    for i in range(4):
        part = ev.where(
            (F.col("tu") > bounds[i]) & (F.col("tu") <= bounds[i + 1])
        )
        tmp = str(tmp_path / f"w{i}")
        part.coalesce(1).write.parquet(tmp)
        [f] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.move(f, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("user_id BIGINT, tu BIGINT, eid BIGINT, code INT")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        attribution_tws(stream)
        .writeStream.format("memory")
        .queryName("mem_attr")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["channel"]: r
        for r in spark.table("mem_attr")
        .groupBy("channel")
        .agg(
            F.sum("first_touch").alias("first_touch"),
            F.sum("last_touch").alias("last_touch"),
            F.sum("linear_ppm").alias("linear_ppm"),
        )
        .collect()
    }

    from binance_etl_spark.plans.analytics4 import win_attribution

    batch = {r["channel"]: r for r in win_attribution(spark, SF).collect()}
    assert set(got) == {CHANNELS[name] for name in batch}
    for name, code in CHANNELS.items():
        if name not in batch:
            continue
        b, s = batch[name], got[code]
        assert (s["first_touch"], s["last_touch"], s["linear_ppm"]) == (
            b["first_touch"],
            b["last_touch"],
            b["linear_ppm"],
        ), name

    # changelog sanity: every emission row carries at least one credit
    for r in spark.table("mem_attr").collect():
        assert r["first_touch"] + r["last_touch"] + r["linear_ppm"] > 0


def test_state_survives_empty_flush_and_restart_boundary(
    spark, tmp_path, rocksdb_state
):
    """A conversion with no pending touches emits nothing and leaves
    the summary empty; touches spanning micro-batches accumulate in
    state and flush on the later batch's purchase."""
    import pandas as pd

    rows_b0 = pd.DataFrame(
        {"user_id": [7, 7], "tu": [10, 20], "eid": [1, 2], "code": [1, 3]}
    ).astype({"code": "int32"})
    rows_b1 = pd.DataFrame(
        {
            "user_id": [7, 7, 7],
            "tu": [30, 40, 50],
            "eid": [3, 4, 5],
            "code": [2, 0, 0],  # one more touch, purchase, empty purchase
        }
    ).astype({"code": "int32"})
    src = str(tmp_path / "src2")
    os.makedirs(src)
    for i, pdf in enumerate((rows_b0, rows_b1)):
        p = os.path.join(src, f"{i:04d}.parquet")
        pdf.to_parquet(p)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("user_id BIGINT, tu BIGINT, eid BIGINT, code INT")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        attribution_tws(stream)
        .writeStream.format("memory")
        .queryName("mem_attr2")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.table("mem_attr2").collect()
    # exactly one conversion flush: 3 touches (click tu10 first,
    # signup tu30 last), floor(1e6/3) = 333333 ppm each
    by_ch = {r["channel"]: r for r in rows}
    assert len(rows) == 3
    assert by_ch[1]["first_touch"] == 1 and by_ch[1]["linear_ppm"] == 333333
    assert by_ch[2]["last_touch"] == 1 and by_ch[2]["linear_ppm"] == 333333
    assert by_ch[3]["first_touch"] == 0 and by_ch[3]["last_touch"] == 0
    assert by_ch[3]["linear_ppm"] == 333333
