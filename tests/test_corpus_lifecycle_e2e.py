"""Corpus lifecycle end-to-end: the round-6 lakehouse features
composed the way a training-data pipeline actually uses them.

  raw stream ──foreach_batch_branch──▶ WAP branch (invisible)
       audit ──publish_branch──▶ main          (atomic expose)
       pin   ──create_tag──▶ "train-v1"        (reproducibility)
       GDPR  ──delete_keys──▶ bloom-pruned erasure
       fix   ──update_where_mor──▶ zero-rewrite correction
       fork  ──shallow_clone──▶ experiment, thrown away
       maint ──compact + vacuum──▶ tag still byte-readable

One test, every arrow asserted — the integration surface the
individual suites cannot see."""

from __future__ import annotations

import pytest

from binance_etl_spark.operators import snapshots as SNAP


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "corpus")


def _docs(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id",
        "CONCAT('document body number ', id) AS text",
        "CAST(id % 3 AS STRING) AS lang",
    ).repartitionByRange(2, "doc_id")


def test_corpus_lifecycle(spark, table, tmp_path):
    # bootstrap an audited empty-ish corpus with blooms on the key
    SNAP.write_version(
        _docs(spark, 0, 10),
        table,
        bloom_cols=["doc_id"],
        expectations={"has_text": "length(text) > 0"},
    )
    SNAP.create_branch(table, "ingest")

    # 1. STREAMING INGESTION onto the WAP branch
    src = str(tmp_path / "src")
    _docs(spark, 10, 110).coalesce(2).write.parquet(src)
    sdf = spark.readStream.schema("doc_id BIGINT, text STRING, lang STRING").parquet(src)
    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(SNAP.foreach_batch_branch(table, "ingest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert SNAP.read_version(spark, table).count() == 10  # still staged
    assert SNAP.read_ref(spark, table, "ingest").count() == 110

    # 2. AUDIT + PUBLISH — main atomically sees the ingested corpus
    SNAP.publish_branch(
        table, "ingest", spark=spark, audit={"ids_sane": "doc_id < 10000"}
    )
    assert SNAP.count_rows(table) == 110

    # 3. TAG the training snapshot
    SNAP.create_tag(table, "train-v1")
    train_v = SNAP.refs(table)["train-v1"]["version"]

    # 4. GDPR erasure batch through the bloom-pruned path
    v = SNAP.delete_keys(spark, table, "doc_id", [7, 42, 99])
    m = SNAP._load_manifest(table, v)
    assert m["bloom_pruned"] >= 0  # evidence recorded
    assert SNAP.read_version(spark, table).count() == 107
    # the tagged training snapshot is UNCHANGED (reproducibility)
    assert SNAP.read_ref(spark, table, "train-v1").count() == 110

    # 5. zero-rewrite correction via MOR update
    files_before = set(SNAP._load_manifest(table, SNAP.main_versions(table)[-1])["files"])
    v = SNAP.update_where_mor(
        spark, table, "lang = '2'", {"text": "CONCAT(text, ' [rev2]')"}
    )
    m = SNAP._load_manifest(table, v)
    assert files_before <= set(m["files"])  # nothing rewritten
    got = SNAP.read_version(spark, table)
    assert got.where("lang = '2' AND text NOT LIKE '%[rev2]'").count() == 0
    assert got.count() == 107

    # 6. fork an EXPERIMENT clone, mutate it, throw it away
    clone = str(tmp_path / "exp")
    SNAP.shallow_clone(table, clone)
    SNAP.delete_where(spark, clone, "lang = '0'")
    assert SNAP.read_version(spark, clone).count() < 107
    assert SNAP.read_version(spark, table).count() == 107  # untouched

    # 7. MAINTENANCE: compact folds the vector, vacuum respects the tag
    SNAP.compact(spark, table, target_files=2)
    assert "dv" not in SNAP._load_manifest(table, SNAP.main_versions(table)[-1])
    SNAP.vacuum(table, keep_last=1)
    # the tag still reads byte-complete after retention ran
    train = SNAP.read_ref(spark, table, "train-v1")
    assert train.count() == 110
    assert train.where("doc_id = 42").count() == 1  # pre-erasure snapshot
    # current corpus state survives maintenance
    cur = SNAP.read_version(spark, table)
    assert cur.count() == 107
    assert cur.where("doc_id IN (7, 42, 99)").count() == 0
    assert SNAP.read_version(spark, table, train_v).count() == 110

    # 8. CDC between the tag and now tells the whole story
    ch = SNAP.read_changes(spark, table, train_v, SNAP.main_versions(table)[-1])
    kinds = {r["change_type"] for r in ch.collect()}
    assert kinds == {"insert", "delete"}  # erasures + the MOR revision
