"""ANSI DML text front end (operators/sql_dml.py): parser contract
and end-to-end lowering onto the snapshot DML operators."""

from __future__ import annotations

import pytest

from binance_etl_spark.operators import snapshots as SNAP
from binance_etl_spark.operators.sql_dml import (
    _merge_keys,
    _split_assignments,
    execute_dml,
)


def test_split_assignments_protects_nesting_and_quotes():
    got = _split_assignments(
        "a = f(x, y) + 1, b = 'lit,eral', c = arr[2], d=d*2"
    )
    assert got == {
        "a": "f(x, y) + 1",
        "b": "'lit,eral'",
        "c": "arr[2]",
        "d": "d*2",
    }


def test_split_assignments_rejects_garbage():
    with pytest.raises(ValueError):
        _split_assignments("not an assignment")


def test_merge_keys_requires_same_column_equalities():
    assert _merge_keys("t.k = s.k AND t.j = s.j", "t", "s") == ["k", "j"]
    with pytest.raises(ValueError):
        _merge_keys("t.k = s.other", "t", "s")
    with pytest.raises(ValueError):
        _merge_keys("t.k < s.k", "t", "s")


def test_unsupported_statements_raise(spark):
    for bad in (
        "SELECT 1",
        "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *",
        "TRUNCATE TABLE t",
    ):
        with pytest.raises(ValueError):
            execute_dml(spark, bad, {"t": "/nonexistent"})


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(0, 100).selectExpr(
        "id", "id % 4 AS grp", "CAST(id * 1.5 AS DOUBLE) AS v"
    )
    SNAP.write_version(df, t)
    return t


def test_delete_update_merge_chain(spark, table):
    execute_dml(spark, "DELETE FROM tbl WHERE grp = 3", {"tbl": table})
    assert SNAP.read_version(spark, table).count() == 75

    execute_dml(
        spark,
        "UPDATE tbl SET v = v + 100, grp = grp * 10 WHERE id < 8",
        {"tbl": table},
    )
    got = SNAP.read_version(spark, table)
    r = {x["id"]: x for x in got.where("id < 8").collect()}
    assert r[0]["v"] == 100.0 and r[0]["grp"] == 0
    assert r[4]["v"] == 106.0 and r[4]["grp"] == 0
    assert r[1]["grp"] == 10  # grp 1 * 10; grp 3 rows are deleted
    assert 3 not in r and 7 not in r

    spark.range(0, 3).selectExpr(
        "id * 2 + 200 AS id", "CAST(9 AS BIGINT) AS grp",
        "CAST(-1.0 AS DOUBLE) AS v",
    ).union(
        spark.range(0, 2).selectExpr(
            "id * 4 AS id", "CAST(-9 AS BIGINT) AS grp",
            "CAST(0.0 AS DOUBLE) AS v",
        )
    ).createOrReplaceTempView("chg")
    execute_dml(
        spark,
        "MERGE INTO tbl t USING chg s ON t.id = s.id "
        "WHEN MATCHED AND s.grp = -9 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"tbl": table},
    )
    final = SNAP.read_version(spark, table)
    assert final.where("id IN (0, 4)").count() == 0  # tombstoned
    assert final.where("grp = 9").count() == 3  # inserted
    assert final.count() == 75 - 2 + 3
