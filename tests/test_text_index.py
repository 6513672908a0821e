"""Persistent inverted index (plans/text_index.py): lifecycle
properties the oracle can't see — O(delta) refresh, served == inline,
doc-stat scan pruning, exactly-once streaming refresh, delete
propagation into search results."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo

from binance_etl_spark.catalog import load
from binance_etl_spark.operators import snapshots as SNAP
from binance_etl_spark.plans.llm_ops7 import _BM25_K, _BM25_TERMS, text_bm25_topk
from binance_etl_spark.plans.text_index import (
    build_text_index,
    foreach_batch_text_index,
    serve_bm25,
    text_index_lifecycle,
)
from binance_etl_spark.sources.snapshot_batch import (
    SnapshotPruningBatchReader,
    _batch_schema,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def table(spark):
    d = load(spark, SF, "documents").select("doc_id", "text")
    t = tempfile.mkdtemp(prefix="txtidx_test_") + "/postings"
    v1 = build_text_index(d.where(F.col("doc_id") % 10 != 7), t)
    v2 = build_text_index(d.where(F.col("doc_id") % 10 == 7), t)
    return d, t, v1, v2


def test_refresh_appends_only_the_delta(spark, table):
    d, t, v1, v2 = table
    hist = {h["version"]: h for h in SNAP.history(t)}
    # v2 wrote postings + doc rows for ONLY the late slice
    n_delta_docs = d.where(F.col("doc_id") % 10 == 7).count()
    added = hist[v2]["n_rows"] - hist[v1]["n_rows"]
    assert 0 < added < hist[v1]["n_rows"]  # strictly a delta, not a rebuild
    from binance_etl_spark.sources.snapshot_batch import read_snapshot

    assert (
        read_snapshot(spark, t).where("is_doc = 1").count()
        == d.count()
    )
    assert n_delta_docs > 0


def test_served_equals_inline_recompute(spark, table):
    _, t, _, _ = table
    served = [
        (r["doc_id"], r["score_e6"], r["n_hit_terms"])
        for r in serve_bm25(spark, t, _BM25_TERMS, _BM25_K).collect()
    ]
    inline = [
        (r["doc_id"], r["score_e6"], r["n_hit_terms"])
        for r in text_bm25_topk(spark, SF).collect()
    ]
    assert served == inline  # index consistency: stored == recomputed


def test_doc_stat_scan_prunes_to_doc_row_files(spark, table):
    _, t, _, _ = table
    opts = {"path": t}
    schema = _batch_schema(opts)
    total = len(SnapshotPruningBatchReader(opts, schema).partitions())
    pruned = SnapshotPruningBatchReader(opts, schema)
    pruned.pushFilters([EqualTo(("is_doc",), 1)])
    kept = len(pruned.partitions())
    assert kept < total  # metadata partitioning separated the row kinds


def test_streaming_refresh_is_exactly_once(spark, table):
    d, _, _, _ = table
    t = tempfile.mkdtemp(prefix="txtidx_stream_") + "/postings"
    body = foreach_batch_text_index(t)
    body(d, 0)
    n_v, n_rows = len(SNAP.versions(t)), SNAP.count_rows(t)
    body(d, 0)  # checkpoint replay
    assert len(SNAP.versions(t)) == n_v
    assert SNAP.count_rows(t) == n_rows


def test_deleted_doc_leaves_search_results(spark, table):
    """GDPR for keyword search: MOR-delete a doc's posting AND stat
    rows — it must vanish from the top-k without any file rewrite."""
    d, _, _, _ = table
    t = tempfile.mkdtemp(prefix="txtidx_del_") + "/postings"
    build_text_index(d, t)
    before = serve_bm25(spark, t, _BM25_TERMS, _BM25_K).collect()
    victim = before[0]["doc_id"]
    files_before = SNAP._load_manifest(t, SNAP.versions(t)[-1])["files"]
    SNAP.delete_where_mor(spark, t, f"doc_id = {victim}")
    files_after = SNAP._load_manifest(t, SNAP.versions(t)[-1])["files"]
    assert files_after == files_before  # DV only
    after = serve_bm25(spark, t, _BM25_TERMS, _BM25_K).collect()
    assert victim not in {r["doc_id"] for r in after}


def test_registered_lifecycle_query(spark):
    out = text_index_lifecycle(spark, SF).collect()
    assert len(out) == _BM25_K
    assert all(r["n_versions"] == 2 for r in out)
    scores = [r["score_e6"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_index_maintenance_compact_preserves_serving(spark, table):
    """The index table is a snapshot table, so the maintenance ops
    compose: a full compact (merges the build+refresh segments, folds
    any DV) must not change a single served score."""
    d, _, _, _ = table
    t = tempfile.mkdtemp(prefix="txtidx_compact_") + "/postings"
    build_text_index(d.where(F.col("doc_id") % 10 != 7), t)
    build_text_index(d.where(F.col("doc_id") % 10 == 7), t)
    before = [tuple(r) for r in serve_bm25(spark, t, _BM25_TERMS, _BM25_K).collect()]
    v = SNAP.compact(spark, t, target_files=2)
    m = SNAP._load_manifest(t, v)
    assert m["mode"] == "compact" and len(m["files"]) <= 2
    after = [tuple(r) for r in serve_bm25(spark, t, _BM25_TERMS, _BM25_K).collect()]
    assert after == before
