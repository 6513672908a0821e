"""Streaming CDC-apply sink (snapshots.foreach_batch_merge) — the DLT
APPLY CHANGES INTO shape: per-micro-batch MERGE commits, SEQUENCE BY
conflict resolution within a batch, exactly-once replay, and a real
writeStream leg."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.operators import snapshots as SNAP

SCHEMA = "k BIGINT, v STRING, seq BIGINT, op STRING"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "cdc")
    SNAP.write_version(
        _rows(spark, [(1, "a", 0, "i"), (2, "b", 0, "i"), (3, "c", 0, "i")]), t
    )
    return t


def _state(spark, t):
    return {
        r["k"]: r["v"]
        for r in SNAP.read_version(spark, t).select("k", "v").collect()
    }


def test_apply_changes_upserts_deletes_and_replays(spark, table):
    body = SNAP.foreach_batch_merge(
        table, ["k"], sequence_col="seq", delete_condition="op = 'd'"
    )
    # batch 0: update k=1, insert k=4, delete k=3
    b0 = _rows(spark, [(1, "a2", 1, "u"), (4, "d", 1, "i"), (3, "c", 1, "d")])
    body(b0, 0)
    assert _state(spark, table) == {1: "a2", 2: "b", 4: "d"}
    n_v = len(SNAP.versions(table))
    body(b0, 0)  # checkpoint replay: same batch id must no-op
    assert len(SNAP.versions(table)) == n_v
    assert _state(spark, table) == {1: "a2", 2: "b", 4: "d"}


def test_sequence_by_keeps_only_the_latest_change_per_key(spark, table):
    body = SNAP.foreach_batch_merge(
        table, ["k"], sequence_col="seq", delete_condition="op = 'd'"
    )
    # one batch carries THREE changes for k=2: update, delete, update —
    # only the highest-sequence row (the final update) applies
    b = _rows(spark, [(2, "x1", 1, "u"), (2, "gone", 2, "d"), (2, "x3", 3, "u")])
    body(b, 0)
    assert _state(spark, table)[2] == "x3"
    # and when the delete is the latest change, the key goes away
    b2 = _rows(spark, [(2, "y", 4, "u"), (2, "y", 5, "d")])
    body(b2, 1)
    assert 2 not in _state(spark, table)


def test_without_sequence_col_multirow_key_raises(spark, table):
    body = SNAP.foreach_batch_merge(table, ["k"])
    with pytest.raises(ValueError, match="multiple rows"):
        body(_rows(spark, [(1, "p", 1, "u"), (1, "q", 2, "u")]), 0)


def test_real_writestream_cdc_apply(spark, table, tmp_path):
    import time

    src = str(tmp_path / "src")
    _rows(spark, [(1, "s1", 1, "u"), (5, "s5", 1, "i")]).coalesce(1).write.parquet(
        os.path.join(src, "f0")
    )
    _rows(spark, [(5, "s5b", 2, "u"), (2, "b", 2, "d")]).coalesce(1).write.parquet(
        os.path.join(src, "f1")
    )
    # the file source admits files in mtime order; both dirs were just
    # written within the same tick, so pin the intended batch order
    # explicitly (f0 strictly older than f1)
    now = time.time()
    for i, d in enumerate(("f0", "f1")):
        for name in os.listdir(os.path.join(src, d)):
            os.utime(os.path.join(src, d, name), (now - 20 + i * 10,) * 2)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            SNAP.foreach_batch_merge(
                table, ["k"], sequence_col="seq", delete_condition="op = 'd'"
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert _state(spark, table) == {1: "s1", 3: "c", 5: "s5b"}


def test_delete_matched_only_vs_cdc_default(spark, tmp_path):
    """The two tombstone semantics of merge_into: the CDC default
    suppresses an UNMATCHED delete-marked row entirely (a tombstone
    for an absent key is a no-op); delete_matched_only=True (the ANSI
    rule the SQL front end uses) lets it fall through to INSERT."""
    src = _rows(
        spark,
        [
            (2, "B", 1, "d"),   # matched tombstone: deletes either way
            (9, "Z", 1, "d"),   # UNMATCHED tombstone: the semantic fork
            (3, "C", 1, "u"),   # matched upsert
            (8, "H", 1, "i"),   # unmatched insert
        ],
    )
    t_cdc = str(tmp_path / "cdc_mode")
    t_ansi = str(tmp_path / "ansi_mode")
    base = [(1, "a", 0, "i"), (2, "b", 0, "i"), (3, "c", 0, "i")]
    for t in (t_cdc, t_ansi):
        SNAP.write_version(_rows(spark, base), t)
    SNAP.merge_into(spark, t_cdc, src, ["k"], delete_condition="op = 'd'")
    SNAP.merge_into(
        spark, t_ansi, src, ["k"], delete_condition="op = 'd'",
        delete_matched_only=True,
    )
    assert _state(spark, t_cdc) == {1: "a", 3: "C", 8: "H"}
    assert _state(spark, t_ansi) == {1: "a", 3: "C", 8: "H", 9: "Z"}
