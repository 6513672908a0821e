"""df.observe(): pipeline metrics without a second scan.

The reference logs hand-rolled counters per message (base.py:30,76-81);
the Spark-native equivalent is Observation/observe — named aggregate
metrics computed as a side effect of the job that already ran, no
extra pass over the data. At 100 TB a separate metrics query doubles
the scan bill; observe() makes row-quality accounting free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Observation

SF = "/root/testdata/sf0.01"


def test_observe_counts_match_separate_aggregation(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    obs = Observation("etl-metrics")
    out = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.count_if(F.col("l_quantity") < 10).alias("small_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,2)")).alias("price_sum"),
        )
        .where(F.col("l_quantity") < 10)
        .count()
    )
    got = obs.get
    expect_rows = li.count()
    expect_small = li.where("l_quantity < 10").count()
    assert got["rows_in"] == expect_rows
    assert got["small_qty"] == expect_small == out
    assert got["price_sum"] is not None


def test_observe_on_streaming_progress(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "value"
    ).limit(5000).write.parquet(src)
    stream = (
        spark.readStream.schema("event_id BIGINT, value DOUBLE")
        .parquet(src)
        .observe("in_metrics", F.count(F.lit(1)).alias("n_in"))
        .where(F.col("value") > 0)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("obs_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_in = sum(
        p["observedMetrics"]["in_metrics"]["n_in"]
        for p in [q.recentProgress[i] for i in range(len(q.recentProgress))]
        if "in_metrics" in p.get("observedMetrics", {})
    )
    spark.catalog.dropTempView("obs_stream")
    assert n_in == 5000
