"""Batch/stream equivalence for the streaming VPIN bucketizer
(streaming/vpin_tws.py vs plans/microstructure3.py::ms_vpin): the same
sf0.001 tape, streamed as 4 time-ordered micro-batches, must close
EXACTLY the volume buckets the batch window plan computes — bucket for
bucket — and the derived per-symbol VPIN ppm must equal the registered
query's output."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.plans.microstructure import _tape
from binance_etl_spark.plans.microstructure3 import _VPIN_V, ms_vpin
from binance_etl_spark.streaming.vpin_tws import VPIN_V, vpin_tws

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


def test_stream_vpin_matches_batch_buckets(spark, tmp_path, rocksdb_state):
    assert VPIN_V == _VPIN_V  # twin contract: same volume clock

    t = _tape(spark, SF).select(
        "sym",
        F.unix_micros("ts").alias("tu"),
        F.col("tid").alias("eid"),
        "qty",
        "side",
    )

    # expected buckets: the batch fold, computed in plain Python
    rows = sorted(t.collect(), key=lambda r: (r["sym"], r["tu"], r["eid"]))
    expected: dict[tuple[int, int], tuple[int, int]] = {}
    cum: dict[int, int] = {}
    for r in rows:
        c = cum.get(r["sym"], 0)
        b = c // VPIN_V
        buy, sell = expected.get((r["sym"], b), (0, 0))
        if r["side"] == 1:
            buy += r["qty"]
        else:
            sell += r["qty"]
        expected[(r["sym"], b)] = (buy, sell)
        cum[r["sym"]] = c + r["qty"]

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
        spark.readStream.schema(
            "sym INT, tu BIGINT, eid BIGINT, qty BIGINT, side INT"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        vpin_tws(stream)
        .writeStream.format("memory")
        .queryName("mem_vpin")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # final state of each bucket = its max-vol (last) emission
    got: dict[tuple[int, int], tuple[int, int, int]] = {}
    for r in spark.table("mem_vpin").collect():
        k = (r.sym, r.bucket)
        if k not in got or r.vol > got[k][2]:
            got[k] = (r.buy_vol, r.sell_vol, r.vol)
    assert {k: (b, s) for k, (b, s, _v) in got.items()} == expected

    # and the derived per-sym VPIN ppm equals the registered query
    derived: dict[int, tuple[int, int]] = {}
    for (sym, _b), (buy, sell, vol) in got.items():
        imb, tot = derived.get(sym, (0, 0))
        derived[sym] = (imb + abs(buy - sell), tot + vol)
    batch = {
        r["sym"]: (r["n_buckets"], r["total_imbalance"], r["vpin_ppm"])
        for r in ms_vpin(spark, SF).collect()
    }
    for sym, (imb, tot) in sorted(derived.items()):
        n_buckets = sum(1 for (s, _b) in got if s == sym)
        assert batch[sym] == (n_buckets, imb, 1_000_000 * imb // tot), sym
