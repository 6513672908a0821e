"""Persistent ANN index (plans/ann_index.py): lifecycle properties the
oracle can't see — the serve path reads ONLY stored codes (never the
raw vectors), and the refresh encodes ONLY the delta."""

import tempfile

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.operators import snapshots as SNAP
from binance_etl_spark.plans.ann_index import (
    adc_lookup_col,
    build_pq_index,
    sim_ann_index_lifecycle,
)
from binance_etl_spark.plans.llm_ops11 import _pq_setup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lifecycle(spark):
    e = load(spark, SF, "embeddings")
    setup = _pq_setup(e)
    assert setup is not None
    codebook, adc = setup
    table = tempfile.mkdtemp(prefix="annidx_test_") + "/pq"
    v1 = build_pq_index(e.where(F.col("vec_id") % 10 != 7), codebook, table)
    v2 = build_pq_index(e.where(F.col("vec_id") % 10 == 7), codebook, table)
    return e, codebook, adc, table, v1, v2


def test_refresh_appends_only_the_delta(spark, lifecycle):
    e, _, _, table, v1, v2 = lifecycle
    n_total = e.count()
    n_delta = e.where(F.col("vec_id") % 10 == 7).count()
    hist = {h["version"]: h for h in SNAP.history(table)}
    assert hist[v1]["n_rows"] == n_total - n_delta
    # the refresh commit wrote exactly the late slice, not the corpus
    assert hist[v2]["n_rows"] - hist[v1]["n_rows"] == n_delta
    assert SNAP.count_rows(table) == n_total


def test_serve_scan_reads_no_embedding_column(spark, lifecycle):
    _, _, adc, table, _, _ = lifecycle
    served = SNAP.read_version(spark, table).select(
        "vec_id", adc_lookup_col(adc).alias("adc_dist")
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "embedding" not in plan  # codes only — the 32x win is real
    assert served.count() > 0


def test_served_scores_match_inline_recompute(spark, lifecycle):
    e, codebook, adc, table, _, _ = lifecycle
    from binance_etl_spark.plans.llm_ops11 import _pq_adc_col

    inline = {
        r["vec_id"]: r["d"]
        for r in e.select("vec_id", _pq_adc_col(codebook, adc).alias("d")).collect()
    }
    served = {
        r["vec_id"]: r["d"]
        for r in SNAP.read_version(spark, table)
        .select("vec_id", adc_lookup_col(adc).alias("d"))
        .collect()
    }
    assert served == inline  # index consistency: stored == recomputed


def test_registered_query_returns_topk_with_lifecycle_evidence(spark):
    out = sim_ann_index_lifecycle(spark, SF).collect()
    assert len(out) == 10
    assert all(r["n_versions"] == 2 for r in out)
    dists = [r["adc_dist"] for r in out]
    assert dists == sorted(dists)
