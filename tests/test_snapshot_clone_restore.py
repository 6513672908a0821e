"""RESTORE (zero-copy rollback) and SHALLOW CLONE over the snapshot
log (operators/snapshots.py::restore / shallow_clone).

Contracts: restore makes an earlier snapshot latest WITHOUT rewriting
data (history preserved for forensics); a shallow clone references the
source's files in place, is fully writable with clone-local commits,
and its vacuum can never delete source bytes."""

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


# --- restore ----------------------------------------------------------


def test_restore_rolls_back_without_rewrite(spark, table):
    SNAP.write_version(_df(spark, 0, 100), table)
    SNAP.write_version(_df(spark, 100, 200), table)
    SNAP.delete_where(spark, table, "id < 50")  # the "bad" commit
    assert SNAP.read_version(spark, table).count() == 150
    v = SNAP.restore(table, 2)
    m = SNAP._load_manifest(table, v)
    assert m["mode"] == "restore" and m["restored_from"] == 2
    # zero-copy: the restored file list is v2's, verbatim
    assert m["files"] == SNAP._load_manifest(table, 2)["files"]
    assert SNAP.read_version(spark, table).count() == 200
    # forensics: the bad delete still time-travels
    assert SNAP.read_version(spark, table, 3).count() == 150
    assert SNAP.count_rows(table) == 200


def test_restore_carries_dv_and_blooms(spark, table):
    SNAP.write_version(_df(spark, 0, 100), table, bloom_cols=["id"])
    SNAP.delete_where_mor(spark, table, "id < 10")
    SNAP.write_version(_df(spark, 100, 150), table)  # later commit
    v = SNAP.restore(table, 2)  # back to the MOR-deleted state
    m = SNAP._load_manifest(table, v)
    assert m["dv_rows"] == 10 and m["bloom_cols"] == ["id"]
    assert SNAP.read_version(spark, table).count() == 90


def test_restore_unknown_version_raises(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    with pytest.raises(FileNotFoundError):
        SNAP.restore(table, 99)


# --- shallow clone ----------------------------------------------------


def test_clone_is_zero_copy_and_readable(spark, table, tmp_path):
    clone = str(tmp_path / "clone")
    SNAP.write_version(_df(spark, 0, 500), table)
    SNAP.shallow_clone(table, clone)
    m = SNAP._load_manifest(clone, 1)
    assert m["mode"] == "clone"
    assert all(os.path.isabs(f) for f in m["files"])
    # no data files under the clone at all
    assert not os.path.isdir(os.path.join(clone, "data"))
    got = SNAP.read_version(spark, clone)
    assert got.count() == 500
    assert SNAP.count_rows(clone) == 500  # metadata carried


def test_clone_writes_stay_local_and_source_untouched(spark, table, tmp_path):
    clone = str(tmp_path / "clone")
    SNAP.write_version(_df(spark, 0, 500), table)
    SNAP.shallow_clone(table, clone)
    # mutate the clone three ways
    SNAP.write_version(_df(spark, 500, 600), clone)
    SNAP.delete_where(spark, clone, "id < 10")
    SNAP.update_where(spark, clone, "id = 20", {"v": "0"})
    got = SNAP.read_version(spark, clone)
    assert got.count() == 590
    assert got.where("id = 20").collect()[0]["v"] == 0
    # the source never moved
    src = SNAP.read_version(spark, table)
    assert src.count() == 500
    assert src.where("id = 20").collect()[0]["v"] == 40
    assert src.where("id < 10").count() == 10


def test_clone_vacuum_never_deletes_source_files(spark, table, tmp_path):
    clone = str(tmp_path / "clone")
    SNAP.write_version(_df(spark, 0, 200), table)
    SNAP.shallow_clone(table, clone)
    # clone overwrites -> v1's borrowed files become expired-only
    SNAP.write_version(_df(spark, 0, 50), clone, mode="overwrite")
    res = SNAP.vacuum(clone, keep_last=1)
    assert res["removed_files"] == 0  # borrowed files are out of reach
    assert SNAP.read_version(spark, table).count() == 200  # source intact
    assert SNAP.read_version(spark, clone).count() == 50


def test_clone_of_mor_table_applies_borrowed_dv(spark, table, tmp_path):
    clone = str(tmp_path / "clone")
    SNAP.write_version(_df(spark, 0, 100), table)
    SNAP.delete_where_mor(spark, table, "id < 10")
    SNAP.shallow_clone(table, clone)
    got = SNAP.read_version(spark, clone)
    assert got.count() == 90
    assert got.where("id < 10").count() == 0
    # a clone-local MOR delete composes with the borrowed vector
    SNAP.delete_where_mor(spark, clone, "id >= 95")
    assert SNAP.read_version(spark, clone).count() == 85
    assert SNAP.read_version(spark, table).count() == 90  # source intact


def test_clone_borrowed_blooms_still_prune(spark, table, tmp_path):
    clone = str(tmp_path / "clone")
    SNAP.write_version(_df(spark, 0, 1000), table, bloom_cols=["id"])
    SNAP.shallow_clone(table, clone)
    cand, skipped = SNAP.select_files_point(clone, None, "id", [7])
    assert len(skipped) >= 1, "borrowed bloom index must keep pruning"
    v = SNAP.delete_keys(spark, clone, "id", [7])
    assert SNAP.read_version(spark, clone, v).count() == 999
    assert SNAP.read_version(spark, table).count() == 1000


def test_clone_refuses_non_empty_destination(spark, table, tmp_path):
    clone = str(tmp_path / "clone")
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.shallow_clone(table, clone)
    with pytest.raises(ValueError, match="already has committed versions"):
        SNAP.shallow_clone(table, clone)
