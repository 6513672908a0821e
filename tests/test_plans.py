"""Physical-plan regression guards: the properties PERFORMANCE.md
documents must stay true. A refactor that silently drops pushdown,
broadcasts, or top-k planning fails here, not in production."""

from __future__ import annotations

import contextlib
import io

import pytest

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_pushdown_and_pruning(spark, sf_dir):
    p = _plan(spark, sf_dir, "scan_lineitem")
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10.0)]" in p
    # projection pruned to 4 columns at the reader
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_tax" not in read_schema and "l_shipdate" not in read_schema


def test_flagship_partial_agg_and_pushdown(spark, sf_dir):
    p = _plan(spark, sf_dir, "agg_pricing_summary")
    assert "PushedFilters" in p and "l_shipdate" in p
    import re

    # node-detail lines like "(5) Exchange" appear once per plan node
    assert len(re.findall(r"^\(\d+\) HashAggregate", p, re.M)) >= 2  # partial+final
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1  # exactly one shuffle


def test_join_chain_broadcasts_dims(spark, sf_dir):
    p = _plan(spark, sf_dir, "join_inner_broadcast")
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p  # no dim should shuffle-join


def test_topk_is_take_ordered(spark, sf_dir):
    for name in ("sort_topk", "sort_multikey", "sim_topk_cosine"):
        p = _plan(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in p, name


def test_semi_anti_join_types(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "join_semi")
    assert "LeftAnti" in _plan(spark, sf_dir, "join_anti")


def test_range_join_is_not_cartesian(spark, sf_dir):
    # equi key + range residual must plan as a hash/SMJ join with a
    # post-condition, never BroadcastNestedLoop/CartesianProduct
    p = _plan(spark, sf_dir, "join_range_seq")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_partition_pruning_on_partitioned_sink(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from binance_etl_spark.catalog import load

    out = tempfile.mkdtemp(prefix="besk_prune_") + "/events_parted"
    load(spark, sf_dir, "events").select("event_id", "event_type", "value").write.mode(
        "overwrite"
    ).partitionBy("event_type").parquet(out)
    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters" in p and "event_type" in p
    # only the click partition's files are scanned
    assert back.count() == load(spark, sf_dir, "events").where("event_type = 'click'").count()


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir):
    """DPP: a selective DIM filter must prune FACT partitions at
    runtime through the join (the dim's qualifying keys flow into the
    fact scan's PartitionFilters as a dynamicpruning subquery, reusing
    the broadcast). At 100 TB this is what turns 'scan 5 years of
    partitions' into 'scan the two nations the query asked for' when
    the partition predicate only exists on the dim side."""
    import tempfile

    from pyspark.sql import functions as F

    from binance_etl_spark.catalog import load

    out = tempfile.mkdtemp(prefix="besk_dpp_") + "/fact"
    (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_orderkey", "l_extendedprice", "s_nationkey")
        .write.mode("overwrite")
        .partitionBy("s_nationkey")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    dim = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_4")
    )
    j = fact.join(dim, fact["s_nationkey"] == dim["n_nationkey"]).agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    # and the pruned result equals the unpruned join
    expect = (
        fact.join(
            dim.hint("merge"), fact["s_nationkey"] == dim["n_nationkey"]
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .first()["n"]
    )
    assert j.first()["n"] == expect


def test_no_python_udf_in_batch_relational(spark, sf_dir):
    # batch relational/scalar plans must stay JVM-side (no BatchEvalPython
    # / ArrowEvalPython nodes); Python is reserved for stateful ops,
    # multimodal decode and the explicit UDF demos.
    for name in ("agg_pricing_summary", "join_inner_broadcast", "fn_string_suite",
                 "book_rebuild", "dedup_near_jaccard", "sim_topk_cosine"):
        p = _plan(spark, sf_dir, name)
        assert "EvalPython" not in p, name


def test_catalog_load_does_not_mutate_session_timezone(spark, sf_dir):
    """ADVICE r2: a table read must not override a caller-set session
    timezone, and the ts normalization must yield the same INSTANTS
    under any session timezone (conversions are tz-independent)."""
    from pyspark.sql import functions as F

    from binance_etl_spark.catalog import load

    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        vals_ny = (
            load(spark, sf_dir, "events")
            .select(F.unix_micros("ts").alias("u"))
            .orderBy("u")
            .limit(5)
            .collect()
        )
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        vals_utc = (
            load(spark, sf_dir, "events")
            .select(F.unix_micros("ts").alias("u"))
            .orderBy("u")
            .limit(5)
            .collect()
        )
        assert vals_ny == vals_utc
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_bootstrap_conv_carve_equivalence(spark):
    """stats_bootstrap_ci's Spark side carves 16-bit uniforms with
    conv(hex,16,10) while the DuckDB oracle uses instr-nibble
    arithmetic — the two must agree bit-for-bit on every digest slot
    or the oracle hash silently drifts."""
    from binance_etl_spark.plans.stats2 import _U

    df = (
        spark.range(0, 512)
        .selectExpr("md5(CAST(id AS STRING)) AS hk")
        .selectExpr("hk", "explode(sequence(0, 7)) AS s")
        .selectExpr(
            "CAST(conv(substr(hk, s * 4 + 1, 4), 16, 10) AS INT) AS u_conv",
            f"{_U.format(hk='hk')} AS u_instr",
        )
    )
    assert df.where("u_conv <> u_instr").count() == 0
