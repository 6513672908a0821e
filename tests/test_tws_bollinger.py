"""Batch/stream equivalence for the streaming Bollinger monitor
(streaming/bollinger_tws.py vs plans/analytics5.py::
win_bollinger_breach): the same sf0.001 tape streamed as 4
time-ordered micro-batches must count EXACTLY the windows and breaches
the batch window plan computes — the rolling tail survives batch
boundaries in RocksDB state."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.plans.analytics5 import _BOLL_N, win_bollinger_breach
from binance_etl_spark.plans.microstructure import _tape
from binance_etl_spark.streaming.bollinger_tws import BOLL_N, bollinger_tws

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


def test_stream_bollinger_matches_batch(spark, tmp_path, rocksdb_state):
    assert BOLL_N == _BOLL_N  # twin contract: same window length

    t = _tape(spark, SF).select(
        "sym",
        F.unix_micros("ts").alias("tu"),
        F.col("tid").alias("eid"),
        F.floor(F.col("price") * 100).cast("bigint").alias("p"),
    )

    # 4 time-range files, mtimes forcing stream order oldest-first
    src = str(tmp_path / "src")
    os.makedirs(src)
    qs = t.approxQuantile("tu", [0.25, 0.5, 0.75], 0.0)
    bounds = [float("-inf")] + qs + [float("inf")]
    for i in range(4):
        part = t.where(
            (F.col("tu") > bounds[i]) & (F.col("tu") <= bounds[i + 1])
        )
        tmp = str(tmp_path / f"w{i}")
        part.coalesce(1).write.parquet(tmp)
        [f] = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.move(f, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("sym INT, tu BIGINT, eid BIGINT, p BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        bollinger_tws(stream)
        .writeStream.format("memory")
        .queryName("mem_boll_tws")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        r["sym"]: r
        for r in spark.sql(
            """
            SELECT sym, SUM(n_windows) AS n_windows,
                   SUM(n_breach) AS n_breach,
                   SUM(n_breach_up) AS n_breach_up,
                   SUM(n_breach_down) AS n_breach_down
            FROM mem_boll_tws GROUP BY sym
            """
        ).collect()
    }
    expected = {r["sym"]: r for r in win_bollinger_breach(spark, SF).collect()}
    assert set(got) == set(expected)
    for sym, e in expected.items():
        g = got[sym]
        assert g["n_windows"] == e["n_windows"], sym
        assert g["n_breach"] == e["n_breach"], sym
        assert g["n_breach_up"] == e["n_breach_up"], sym
        assert g["n_breach_down"] == e["n_breach_down"], sym
