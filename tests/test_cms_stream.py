"""Streaming CMS maintenance (streaming/cms_stream.py): incremental
micro-batch merges must equal the batch-built sketch, replays must be
no-ops, and estimates from the merged sketch keep the overcount
guarantee."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.operators.text import cms_cells, cms_estimate
from binance_etl_spark.streaming.cms_stream import foreach_batch_cms, read_sketch

SF = "/root/testdata/sf0.01"


def _doc_batches(spark):
    d = load(spark, SF, "documents").select("doc_id", "text")
    return [
        d.where(F.col("doc_id") % 3 == i) for i in range(3)
    ]


def _cells_dict(df):
    return {(r["d"], r["bucket"]): r["c"] for r in df.collect()}


def test_stream_merge_equals_batch_sketch(spark):
    with tempfile.TemporaryDirectory() as root:
        apply = foreach_batch_cms(root)
        for i, b in enumerate(_doc_batches(spark)):
            apply(b, i)
        streamed = _cells_dict(read_sketch(spark, root))
    full_toks = load(spark, SF, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    batch = _cells_dict(cms_cells(full_toks))
    assert streamed == batch


def test_stream_replay_is_noop(spark):
    with tempfile.TemporaryDirectory() as root:
        apply = foreach_batch_cms(root)
        batches = _doc_batches(spark)
        for i, b in enumerate(batches):
            apply(b, i)
        before = _cells_dict(read_sketch(spark, root))
        apply(batches[2], 2)  # restart-without-checkpoint replay
        after = _cells_dict(read_sketch(spark, root))
    assert before == after, "replayed batch must not double-count"


def test_stream_sketch_estimates_never_undercount(spark):
    with tempfile.TemporaryDirectory() as root:
        apply = foreach_batch_cms(root)
        for i, b in enumerate(_doc_batches(spark)):
            apply(b, i)
        cells = read_sketch(spark, root)
        toks = load(spark, SF, "documents").select(
            F.explode(F.split("text", " ")).alias("tok")
        )
        truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_c"))
        est = cms_estimate(toks.distinct(), cells)
        bad = est.join(truth, "tok").where(F.col("est") < F.col("true_c")).count()
    assert bad == 0


def test_state_stays_bounded(spark):
    with tempfile.TemporaryDirectory() as root:
        apply = foreach_batch_cms(root)
        for i, b in enumerate(_doc_batches(spark)):
            apply(b, i)
        n = read_sketch(spark, root).count()
    assert n <= 4 * 256, "sketch state must stay <= D*W cells"


def test_estimate_reports_absent_tokens_as_zero(spark):
    # a probe token absent from the sketched corpus must come back with
    # est = 0 (left join semantics) — not silently dropped, and not an
    # overestimate from min over a partially-matched counter subset
    toks = spark.createDataFrame([("alpha",), ("beta",)], "tok STRING")
    cells = cms_cells(toks)
    probe = spark.createDataFrame(
        [("alpha",), ("nosuchtoken_xyzzy_42",)], "tok STRING"
    )
    est = {r["tok"]: r["est"] for r in cms_estimate(probe, cells).collect()}
    assert est["nosuchtoken_xyzzy_42"] == 0
    assert est["alpha"] >= 1
    assert len(est) == 2
