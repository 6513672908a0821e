"""Merge-on-read deletes via deletion vectors
(operators/snapshots.py: delete_where_mor / _live_rows / _carry_dv).

Contract: a MOR delete touches ZERO data files — deleted rows live as
(file, row_position) pairs in a sidecar dataset every reader applies;
copy-on-write maintenance folds the vector in (rewritten files come
out clean, carried files keep their entries) and a full compact purges
it entirely."""

from __future__ import annotations

import os

import pytest

from binance_etl_spark.operators import snapshots as SNAP


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, parts=4):
    return (
        spark.range(lo, hi)
        .selectExpr("id", "id * 2 AS v")
        .repartitionByRange(parts, "id")
    )


def test_mor_delete_touches_no_data_files(spark, table):
    SNAP.write_version(_df(spark, 0, 1000), table)
    m1 = SNAP._load_manifest(table, 1)
    v = SNAP.delete_where_mor(spark, table, "id % 10 = 3")
    m2 = SNAP._load_manifest(table, v)
    # same file list, byte for byte — only the DV is new
    assert m2["files"] == m1["files"]
    assert m2["rewrote"] == 0
    assert m2["dv_rows"] == 100
    got = SNAP.read_version(spark, table)
    assert got.count() == 900
    assert got.where("id % 10 = 3").count() == 0
    # time travel still sees the pre-delete rows
    assert SNAP.read_version(spark, table, 1).count() == 1000
    # metadata-only count subtracts the vector
    assert SNAP.count_rows(table) == 900
    assert SNAP.history(table)[-1]["n_rows"] == 900


def test_mor_deletes_accumulate_and_dedupe(spark, table):
    SNAP.write_version(_df(spark, 0, 100), table)
    SNAP.delete_where_mor(spark, table, "id < 10")
    v = SNAP.delete_where_mor(spark, table, "id < 20")  # overlaps first
    m = SNAP._load_manifest(table, v)
    assert m["dv_rows"] == 20  # no duplicate positions
    assert SNAP.read_version(spark, table).count() == 80


def test_mor_null_condition_keeps_row(spark, table):
    df = spark.sql(
        "SELECT * FROM VALUES (1, CAST(NULL AS INT)), (2, 5) AS t(id, x)"
    )
    SNAP.write_version(df, table)
    SNAP.delete_where_mor(spark, table, "x > 3")
    got = SNAP.read_version(spark, table)
    assert [r["id"] for r in got.collect()] == [1]


def test_append_carries_dv_by_name(spark, table):
    SNAP.write_version(_df(spark, 0, 100), table)
    SNAP.delete_where_mor(spark, table, "id < 10")
    v = SNAP.write_version(_df(spark, 100, 150), table)
    m = SNAP._load_manifest(table, v)
    assert m["dv"] == SNAP._load_manifest(table, 2)["dv"]
    assert SNAP.read_version(spark, table).count() == 140
    assert SNAP.count_rows(table) == 140


def test_full_compact_purges_the_vector(spark, table):
    SNAP.write_version(_df(spark, 0, 1000), table)
    SNAP.delete_where_mor(spark, table, "id % 10 = 3")
    v = SNAP.compact(spark, table, target_files=2)
    m = SNAP._load_manifest(table, v)
    assert "dv" not in m
    got = SNAP.read_version(spark, table, v)
    assert got.count() == 900 and got.where("id % 10 = 3").count() == 0


def test_cow_delete_on_dv_table_folds_rewritten_files(spark, table):
    SNAP.write_version(_df(spark, 0, 1000), table)
    SNAP.delete_where_mor(spark, table, "id = 5")  # MOR: in file 1 of 4
    # CoW delete hits a DIFFERENT key range -> different file rewrites
    v = SNAP.delete_where(spark, table, "id >= 900")
    m = SNAP._load_manifest(table, v)
    got = SNAP.read_version(spark, table, v)
    assert got.count() == 899  # both deletes in effect
    assert got.where("id = 5 OR id >= 900").count() == 0
    # the carried file holding id=5 still has its DV entry
    assert m.get("dv_rows", 0) == 1
    # and a CoW delete on the DV-bearing file folds the entry away
    v2 = SNAP.delete_where(spark, table, "id = 6")
    m2 = SNAP._load_manifest(table, v2)
    got2 = SNAP.read_version(spark, table, v2)
    assert got2.count() == 898
    assert got2.where("id IN (5, 6)").count() == 0  # 5 must NOT resurrect
    # ids 5 and 6 share a range file, so rewriting it folded the DV
    # entry into the clean file and the vector is gone entirely
    assert "dv" not in m2


def test_merge_on_dv_table_does_not_resurrect(spark, table):
    SNAP.write_version(_df(spark, 0, 100, parts=2), table)
    SNAP.delete_where_mor(spark, table, "id = 7")
    src = spark.createDataFrame([(8, 999)], "id long, v long")
    v = SNAP.merge_into(spark, table, src, ["id"])
    got = SNAP.read_version(spark, table, v)
    assert got.where("id = 7").count() == 0
    assert got.where("id = 8").collect()[0]["v"] == 999
    assert got.count() == 99


def test_read_changes_reports_dv_delta(spark, table):
    SNAP.write_version(_df(spark, 0, 100), table)
    SNAP.delete_where_mor(spark, table, "id IN (4, 40)")
    ch = SNAP.read_changes(spark, table, 1, 2)
    rows = {(r["change_type"], r["id"]) for r in ch.collect()}
    assert rows == {("delete", 4), ("delete", 40)}
    # append on top: changes 2 -> 3 are pure inserts, no replayed deletes
    SNAP.write_version(_df(spark, 100, 110), table)
    ch2 = SNAP.read_changes(spark, table, 2, 3)
    got = {(r["change_type"], r["id"]) for r in ch2.collect()}
    assert got == {("insert", i) for i in range(100, 110)}
    # full span 1 -> 3: inserts plus the two deletes
    ch3 = SNAP.read_changes(spark, table, 1, 3)
    got3 = {(r["change_type"], r["id"]) for r in ch3.collect()}
    assert got3 == {("insert", i) for i in range(100, 110)} | {
        ("delete", 4),
        ("delete", 40),
    }


def test_vacuum_keeps_referenced_dv_sweeps_expired(spark, table):
    SNAP.write_version(_df(spark, 0, 100), table)
    SNAP.delete_where_mor(spark, table, "id < 5")  # v2 + dv/v2
    SNAP.delete_where_mor(spark, table, "id < 10")  # v3 + dv/v3
    dv2 = os.path.join(table, "dv", "v2")
    dv3 = os.path.join(table, "dv", "v3")
    assert os.path.isdir(dv2) and os.path.isdir(dv3)
    SNAP.vacuum(table, keep_last=1)
    # v3's vector survives (latest references it); v2's is expired-only
    assert os.path.isdir(dv3)
    assert not os.path.isdir(dv2)
    assert SNAP.read_version(spark, table).count() == 90


def test_mor_delete_with_blooms_carries_them(spark, table):
    SNAP.write_version(_df(spark, 0, 200), table, bloom_cols=["id"])
    v = SNAP.delete_where_mor(spark, table, "id = 17")
    m = SNAP._load_manifest(table, v)
    entries = SNAP._load_bloom_entries(table, m)
    covered = {f for (f, c) in entries}
    assert covered >= {SNAP.os.path.normpath(f) for f in m["files"]}
    assert SNAP.read_version(spark, table).count() == 199


def test_mor_no_match_on_vectorless_table_is_clean_noop(spark, table):
    SNAP.write_version(_df(spark, 0, 50), table)
    v = SNAP.delete_where_mor(spark, table, "id > 9999")
    m = SNAP._load_manifest(table, v)
    # an empty vector must not be recorded (it could not even be read)
    assert "dv" not in m
    assert SNAP.read_version(spark, table).count() == 50
    assert SNAP.count_rows(table) == 50
    # same guard on the MOR update path
    v2 = SNAP.update_where_mor(spark, table, "id > 9999", {"v": "0"})
    assert "dv" not in SNAP._load_manifest(table, v2)
    assert SNAP.read_version(spark, table).count() == 50


def test_delete_that_empties_the_table_still_reads(spark, table):
    SNAP.write_version(_df(spark, 0, 20), table)
    v = SNAP.delete_where(spark, table, "id >= 0")
    m = SNAP._load_manifest(table, v)
    # Spark writes a zero-row part for the empty rewrite, so the list
    # holds only empty files (the rels==[] guard in _live_rows is
    # defense-in-depth for manifests built without that behavior)
    assert m["rewrote"] >= 1 and m["carried"] == 0
    got = SNAP.read_version(spark, table)
    assert got.count() == 0
    assert got.columns == ["id", "v"]  # schema survives via the manifest
    assert SNAP.count_rows(table) == 0
    # and the table remains appendable afterwards
    SNAP.write_version(_df(spark, 100, 105), table)
    assert SNAP.read_version(spark, table).count() == 5
