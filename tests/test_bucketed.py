"""Bucketed co-located join: the plan must be exchange-free.

The whole point of bucketBy at 100 TB is removing the per-query
fact-fact shuffle; this test pins that physical property, not just the
result values (those are oracle-checked via join_bucketed_colocate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.plans.relational4 import bucketed_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    o, li = bucketed_tables(spark, SF_DIR)
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority", "l_quantity"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_values_match_plain_join(spark, no_broadcast):
    o, li = bucketed_tables(spark, SF_DIR)
    bucketed = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from binance_etl_spark.catalog import load

    plain = (
        load(spark, SF_DIR, "lineitem")
        .join(load(spark, SF_DIR, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
