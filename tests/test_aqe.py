"""AQE runtime re-planning: the two behaviors the 100 TB posture leans
on (PERFORMANCE.md: "AQE demotes misjudged build sides; skew-join
splitting") — exercised for real, not just claimed.

Thresholds are lowered to make local data trigger the optimizations;
the MECHANISM under test is identical at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def aqe_conf(spark):
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10MB",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is not None:
            spark.conf.set(k, v)
        else:
            spark.conf.unset(k)


def _final_plan(df) -> str:
    # AQE finalizes a plan only when THAT query execution runs —
    # df.count() builds a different tree, leaving df's own plan
    # isFinalPlan=false. collect() drives df's own QE to the end.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan


def test_aqe_splits_skewed_join(spark, aqe_conf):
    # Broadcast fully off for THIS test: with any broadcast threshold,
    # AQE prefers converting the join to broadcast (which eliminates
    # skew entirely — the better fix); forcing SMJ isolates the
    # skew-splitting mechanism itself.
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # key 0 carries ~90% of rows -> one shuffle partition dwarfs the rest
    skewed = spark.range(300_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string").cast("binary"), 256).alias("pad"),
    )
    right = spark.range(2_000).select(
        F.col("id").alias("k"), F.lit("dim").alias("v")
    )
    j = skewed.join(right, "k")
    plan = _final_plan(j)
    assert "SortMergeJoin" in plan
    assert "skew=true" in plan, f"AQE did not split the skewed join:\n{plan[:2000]}"


def test_aqe_demotes_smj_to_broadcast_at_runtime(spark, aqe_conf):
    # static threshold is off (-1) -> initial plan is SMJ; runtime stats
    # reveal a tiny build side -> AQE converts to broadcast
    big = spark.range(100_000).select(F.col("id").alias("k"))
    small = spark.range(500).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    j = big.join(small, "k")
    plan = _final_plan(j)
    assert "BroadcastHashJoin" in plan, f"no runtime broadcast demotion:\n{plan[:2000]}"
    assert "AdaptiveSparkPlan" in plan


@pytest.fixture()
def bloom_conf(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # let the tiny local scan qualify as the application side; the
        # MECHANISM (inject might_contain from the filtered build side)
        # is what 100 TB relies on, where the real thresholds pass.
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is not None:
            spark.conf.set(k, v)
        else:
            spark.conf.unset(k)


def test_runtime_bloom_filter_prunes_fact_side(spark, bloom_conf):
    """A selective dim filter becomes a bloom pre-filter on the fact
    scan: at 100 TB this skips most fact rows BEFORE the shuffle join,
    the single biggest read/shuffle saver for filtered star joins."""
    from binance_etl_spark.catalog import load

    sf = "/root/testdata/sf0.001"
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    # and the result is still correct vs the un-bloomed join
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    expect = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, expect))
