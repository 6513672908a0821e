"""Batch/stream equivalence for the streaming funnel
(streaming/funnel_tws.py vs plans/analytics3.py::win_funnel_steps):
the same sf0.001 event tape, streamed as 4 time-ordered micro-batches
(file mtimes force the batch order — the contract pinned in
tests/test_cdc_stream.py), must land every user on EXACTLY the funnel
step the batch fold computes, and the aggregate step counts must
match the registered query's output."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.analytics3 import _FUNNEL
from binance_etl_spark.streaming.funnel_tws import funnel_tws

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
    e = load(spark, SF, "events").where(F.col("event_type").isin(_FUNNEL))
    code = (
        F.when(F.col("event_type") == "signup", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "click", 3)
        .when(F.col("event_type") == "purchase", 4)
    )
    return e.select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        F.col("event_id").alias("eid"),
        code.cast("int").alias("code"),
    )


def test_stream_funnel_matches_batch_fold(spark, tmp_path, rocksdb_state):
    ev = _coded_events(spark)

    # expected: the batch greedy fold, computed in plain Python
    rows = sorted(ev.collect(), key=lambda r: (r["user_id"], r["tu"], r["eid"]))
    expected: dict[int, int] = {}
    for r in rows:
        st = expected.setdefault(r["user_id"], 0)
        if r["code"] == st + 1:
            expected[r["user_id"]] = st + 1

    # 4 time-range files, mtimes forcing stream order oldest-first
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
        funnel_tws(stream)
        .writeStream.format("memory")
        .queryName("mem_funnel")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got: dict[int, int] = {}
    for r in spark.table("mem_funnel").collect():
        got[r.user_id] = max(got.get(r.user_id, 0), r.step)
    assert got == expected

    # and the registered batch query agrees on the aggregate counts
    agg = (
        spark.createDataFrame(
            [(u, s) for u, s in got.items()], "user_id bigint, step bigint"
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            *[
                F.sum(F.when(F.col("step") >= k, 1).otherwise(0))
                .cast("bigint")
                .alias(f"s{k}")
                for k in (1, 2, 3, 4)
            ],
        )
        .collect()[0]
    )
    from binance_etl_spark.plans.analytics3 import win_funnel_steps

    batch = win_funnel_steps(spark, SF).collect()[0]
    assert (
        agg["n_users"],
        agg["s1"],
        agg["s2"],
        agg["s3"],
        agg["s4"],
    ) == (
        batch["n_users"],
        batch["n_signup"],
        batch["n_view"],
        batch["n_click"],
        batch["n_purchase"],
    )
