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


def _topk(spark, table, adc, k=10):
    return (
        SNAP.read_version(spark, table)
        .select("vec_id", adc_lookup_col(adc).alias("d"))
        .orderBy("d", "vec_id")
        .limit(k)
        .collect()
    )


def test_deleted_vectors_leave_the_topk_without_file_rewrites(spark, lifecycle):
    """Right-to-be-forgotten for vector search: a merge-on-read DELETE
    on the index table drops the vector from every subsequent top-k
    WITHOUT rewriting a single code file (DV only) — read_version
    applies the deletion vector on the serve path for free."""
    e, codebook, adc, _, _, _ = lifecycle
    import tempfile

    table = tempfile.mkdtemp(prefix="annidx_del_") + "/pq"
    build_pq_index(e, codebook, table)
    before = _topk(spark, table, adc)
    victim = before[0]["vec_id"]
    files_before = SNAP._load_manifest(table, SNAP.versions(table)[-1])["files"]
    SNAP.delete_where_mor(spark, table, f"vec_id = {victim}")
    files_after = SNAP._load_manifest(table, SNAP.versions(table)[-1])["files"]
    assert files_after == files_before  # DV only — no data-file rewrite
    after = _topk(spark, table, adc)
    assert victim not in {r["vec_id"] for r in after}
    # survivors keep their order; one new row fills the freed slot
    assert [r["vec_id"] for r in after][:9] == [r["vec_id"] for r in before[1:]]


def test_streaming_refresh_keeps_index_current(spark, lifecycle):
    """foreach_batch_ann_index driven by a REAL file-source stream:
    one snapshot version per micro-batch, encode cost O(batch), served
    scores identical to inline recompute over the full corpus."""
    import os

    from binance_etl_spark.plans.ann_index import foreach_batch_ann_index

    e, codebook, adc, _, _, _ = lifecycle
    root = tempfile.mkdtemp(prefix="annidx_stream_")
    src = os.path.join(root, "src")
    e.where(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "f0")
    )
    e.where(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "f1")
    )
    table = os.path.join(root, "pq")
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_ann_index(codebook, table))
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(SNAP.main_versions(table)) == 2  # one version per batch
    assert SNAP.count_rows(table) == e.count()
    served = {r["vec_id"]: r["d"] for r in _topk(spark, table, adc, k=10_000)}
    from binance_etl_spark.plans.llm_ops11 import _pq_adc_col

    inline = {
        r["vec_id"]: r["d"]
        for r in e.select("vec_id", _pq_adc_col(codebook, adc).alias("d")).collect()
    }
    assert served == inline


def test_replayed_batch_is_a_noop(spark, lifecycle):
    """Checkpoint recovery re-delivers the last micro-batch; the
    batch-id token must make the second commit a no-op (no duplicate
    vectors in the index, no extra version)."""
    from binance_etl_spark.plans.ann_index import foreach_batch_ann_index

    e, codebook, _, _, _, _ = lifecycle
    table = tempfile.mkdtemp(prefix="annidx_replay_") + "/pq"
    body = foreach_batch_ann_index(codebook, table)
    body(e, 0)
    n_v, n_rows = len(SNAP.versions(table)), SNAP.count_rows(table)
    body(e, 0)  # replay
    assert len(SNAP.versions(table)) == n_v
    assert SNAP.count_rows(table) == n_rows
