"""Round-11 optimization pins: staging auto-coalesce and the
source_unique gate skip.

The staging auto-coalesce (_stage_files coalesce_small) merges a small
metadata-free commit's task-shard files into one — file layout is only
load-bearing when pruning metadata (partition_by / stats / blooms) or
a detectable range clustering exists, and those cases must keep their
layout bit-for-bit. source_unique skips the structurally-redundant
in-batch dup gates while the vs-table collision probe (the actual
concurrency guard) keeps firing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.operators import snapshots as SNAP


def test_metadata_free_small_commit_coalesces_to_one_file(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("v"))
    SNAP.write_version(df.repartition(16), table, mode="append")
    m = SNAP._load_manifest(table, 1)
    assert len(m["files"]) == 1, "16 task shards of a tiny commit -> 1 file"
    assert m["file_meta"][m["files"][0]]["rows"] == 1000
    got = sorted(r.id for r in SNAP.read_version(spark, table).collect())
    assert got == list(range(1000)), "coalesce is row-preserving"


def test_stats_table_keeps_its_layout(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("v"))
    SNAP.write_version(
        df.repartition(8), table, mode="append", stats_cols=["id"]
    )
    assert len(SNAP._load_manifest(table, 1)["files"]) == 8, (
        "declared per-file stats mean the layout is load-bearing"
    )


def test_bloom_table_keeps_its_layout(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("v"))
    SNAP.write_version(
        df.repartition(8), table, mode="append", bloom_cols=["id"]
    )
    assert len(SNAP._load_manifest(table, 1)["files"]) == 8


def test_undeclared_range_clustering_detected_and_kept(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("v"))
    SNAP.write_version(df.repartitionByRange(4, "id"), table, mode="append")
    assert len(SNAP._load_manifest(table, 1)["files"]) == 4, (
        "disjoint per-file id ranges = deliberate clustering, kept"
    )


def test_inherited_pruning_metadata_blocks_coalesce_on_append(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("v"))
    SNAP.write_version(
        df.repartitionByRange(4, "id"), table, mode="append",
        stats_cols=["id"],
    )
    df2 = spark.range(1000, 2000).select("id", (F.col("id") % 7).alias("v"))
    SNAP.write_version(df2.repartition(8), table, mode="append")
    m2 = SNAP._load_manifest(table, 2)
    new_files = [f for f in m2["files"] if "v1" not in f and len(m2["files"]) > 4]
    assert len(m2["files"]) == 12, (
        "a stats table's appends keep their shard layout (4 carried + 8 new)"
    )


def test_big_commit_keeps_parallel_layout(spark, tmp_path, monkeypatch):
    # shrink the threshold instead of writing 32 MB in a unit test
    monkeypatch.setattr(SNAP, "_STAGE_COMPACT_MAX_BYTES", 1)
    table = str(tmp_path / "t")
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("v"))
    SNAP.write_version(df.repartition(6), table, mode="append")
    assert len(SNAP._load_manifest(table, 1)["files"]) == 6


def test_merge_rewrite_coalesces_metadata_free_table(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.range(100).select("id", (F.col("id") % 3).alias("v"))
    SNAP.write_version(df.repartition(5), table, mode="append")
    # interleaved source ids: every rewrite shard overlaps the kept
    # file's id range, so no accidental range clustering appears
    src = spark.createDataFrame(
        [(i * 10 + 5, (i * 10 + 5) % 3) for i in range(10)],
        "id long, v long",
    ).withColumn("v", F.col("v") + 100)
    SNAP.merge_into(spark, table, src.repartition(4), ["id"])
    m2 = SNAP._load_manifest(table, 2)
    assert len(m2["files"]) == 1
    out = SNAP.read_version(spark, table)
    assert out.where(F.col("v") >= 100).count() == 10
    assert out.count() == 100


def test_looks_clustered_rejects_overlapping_shards(spark, tmp_path):
    import os

    table = str(tmp_path / "t")
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("v"))
    # round-robin shards overlap on every column
    df.repartition(4).write.parquet(os.path.join(table, "data", "tx-x"))
    rels = sorted(
        os.path.join(table, "data", "tx-x", n)
        for n in os.listdir(os.path.join(table, "data", "tx-x"))
        if n.endswith(".parquet")
    )
    assert SNAP._looks_clustered(rels) is False
    df.repartitionByRange(4, "id").write.mode("overwrite").parquet(
        os.path.join(table, "data", "tx-y")
    )
    rels = sorted(
        os.path.join(table, "data", "tx-y", n)
        for n in os.listdir(os.path.join(table, "data", "tx-y"))
        if n.endswith(".parquet")
    )
    assert SNAP._looks_clustered(rels) is True


def test_source_unique_default_still_gates_merge(spark, tmp_path):
    table = str(tmp_path / "t")
    SNAP.write_version(
        spark.range(10).select("id", F.lit("a").alias("v")), table
    )
    dup_src = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id long, v string"
    )
    with pytest.raises(ValueError, match="multiple rows"):
        SNAP.merge_into(spark, table, dup_src, ["id"])


def test_source_unique_keeps_vs_table_collision_guard(spark, tmp_path):
    table = str(tmp_path / "t")
    SNAP.write_version(
        spark.range(10).select("id", F.lit("a").alias("v")),
        table,
        unique_keys=["id"],
        source_unique=True,
    )
    # second append colliding on a live key must still refuse, even
    # with the structural-uniqueness promise (it guards the BATCH,
    # not the table)
    clash = spark.createDataFrame([(3, "z")], "id long, v string")
    with pytest.raises(ValueError, match="already live"):
        SNAP.write_version(clash, table, source_unique=True)


def test_source_unique_first_commit_skips_batch_scan(spark, tmp_path):
    # the promise is trusted on a first commit: no gate job runs, so
    # even a (lying) duplicate batch commits — documented contract
    table = str(tmp_path / "t")
    lying = spark.createDataFrame(
        [(1, "x"), (1, "y")], "id long, v string"
    )
    v = SNAP.write_version(
        lying, table, unique_keys=["id"], source_unique=True
    )
    assert v == 1
    assert SNAP.read_version(spark, table).count() == 2
