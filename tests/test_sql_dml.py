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
    assert _merge_keys("s.k = t.k", "t", "s") == ["k"]  # either order
    with pytest.raises(ValueError):
        _merge_keys("t.k = s.other", "t", "s")
    with pytest.raises(ValueError):
        _merge_keys("t.k < s.k", "t", "s")
    # same-alias "equality" is an always-true predicate in SQL (a cross
    # join), not a merge key — must not be silently reinterpreted
    with pytest.raises(ValueError):
        _merge_keys("t.k = t.k", "t", "s")
    with pytest.raises(ValueError):
        _merge_keys("s.k = s.k", "t", "s")


def test_unsupported_statements_raise(spark):
    for bad in (
        "SELECT 1",
        "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *",
        "CREATE TABLE t (a INT)",
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


def test_column_mode_merge(spark, tmp_path):
    """UPDATE SET col = expr referencing t./s. with a source whose
    schema differs from the target's, plus an explicit INSERT list —
    unassigned columns keep target values, unlisted INSERT columns
    are NULL, unmatched-source-only rows insert, matched rows update."""
    t = str(tmp_path / "tbl")
    SNAP.write_version(
        spark.range(0, 20).selectExpr(
            "id", "CAST(id * 10 AS DOUBLE) AS v", "'old' AS tag"
        ),
        t,
    )
    spark.createDataFrame(
        [(5, 1.5), (7, 2.5), (100, 9.0)], "id BIGINT, delta DOUBLE"
    ).createOrReplaceTempView("feed")
    execute_dml(
        spark,
        "MERGE INTO tbl t USING feed s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = t.v + s.delta "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.delta * 2)",
        {"tbl": t},
    )
    rows = {r["id"]: r for r in SNAP.read_version(spark, t).collect()}
    assert rows[5]["v"] == 51.5 and rows[5]["tag"] == "old"
    assert rows[7]["v"] == 72.5
    assert rows[100]["v"] == 18.0 and rows[100]["tag"] is None
    assert rows[3]["v"] == 30.0  # untouched
    assert len(rows) == 21


def test_column_mode_update_only_ignores_unmatched(spark, tmp_path):
    t = str(tmp_path / "tbl")
    SNAP.write_version(
        spark.range(0, 10).selectExpr("id", "CAST(0 AS DOUBLE) AS v"), t
    )
    spark.createDataFrame(
        [(2, 5.0), (99, 5.0)], "id BIGINT, delta DOUBLE"
    ).createOrReplaceTempView("feed2")
    execute_dml(
        spark,
        "MERGE INTO tbl t USING feed2 s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.delta",
        {"tbl": t},
    )
    got = SNAP.read_version(spark, t)
    assert got.count() == 10  # no INSERT branch: 99 ignored
    assert got.where("id = 2").first()["v"] == 5.0


def test_column_mode_rejects_mixing_and_unknowns(spark, tmp_path):
    t = str(tmp_path / "tbl")
    SNAP.write_version(spark.range(0, 3).selectExpr("id", "id AS v"), t)
    spark.range(1).selectExpr("id", "id AS delta").createOrReplaceTempView("f3")
    with pytest.raises(ValueError):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING f3 s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)",
            {"tbl": t},
        )
    with pytest.raises(ValueError):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING f3 s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET nope = 1 "
            "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)",
            {"tbl": t},
        )


def test_not_matched_guard_filters_inserts(spark, tmp_path):
    """WHEN NOT MATCHED AND <cond> THEN INSERT — the guard filters
    unmatched source rows (column mode); star mode rejects guards."""
    t = str(tmp_path / "tbl")
    SNAP.write_version(
        spark.range(0, 5).selectExpr("id", "CAST(0 AS DOUBLE) AS v"), t
    )
    spark.createDataFrame(
        [(2, 1.0), (50, 2.0), (60, -1.0)], "id BIGINT, delta DOUBLE"
    ).createOrReplaceTempView("g_feed")
    execute_dml(
        spark,
        "MERGE INTO tbl t USING g_feed s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.delta "
        "WHEN NOT MATCHED AND s.delta >= 0 THEN INSERT (id, v) "
        "VALUES (s.id, s.delta)",
        {"tbl": t},
    )
    got = SNAP.read_version(spark, t)
    assert got.where("id = 50").count() == 1  # guard passes
    assert got.where("id = 60").count() == 0  # guard filters
    assert got.where("id = 2").first()["v"] == 1.0
    with pytest.raises(ValueError):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING g_feed s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED AND s.delta >= 0 THEN INSERT *",
            {"tbl": t},
        )


def test_update_set_cannot_touch_merge_key(spark, tmp_path):
    """Assigning a merge-key column in UPDATE SET would make the
    whole-row lowering insert a second row instead of updating —
    rejected, as warehouses reject it."""
    t = str(tmp_path / "tbl")
    SNAP.write_version(spark.range(0, 3).selectExpr("id", "id AS v"), t)
    spark.range(1).selectExpr("id", "id AS d").createOrReplaceTempView("k_feed")
    with pytest.raises(ValueError, match="merge-key"):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING k_feed s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET id = t.id + 1000",
            {"tbl": t},
        )


def test_case_when_inside_set_expression(spark, tmp_path):
    """CASE WHEN ... THEN ... END inside a SET expression must not be
    mistaken for a MERGE clause boundary, and trailing assignments
    after the CASE must survive."""
    t = str(tmp_path / "tbl")
    SNAP.write_version(
        spark.range(0, 6).selectExpr(
            "id", "CAST(0 AS DOUBLE) AS v", "CAST(0 AS BIGINT) AS w"
        ),
        t,
    )
    spark.createDataFrame(
        [(1, 5.0), (2, -5.0), (50, 3.0)], "id BIGINT, d DOUBLE"
    ).createOrReplaceTempView("c_feed")
    execute_dml(
        spark,
        "MERGE INTO tbl t USING c_feed s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET "
        "v = CASE WHEN s.d > 0 THEN s.d ELSE 0 END, w = 2 "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.d)",
        {"tbl": t},
    )
    rows = {r["id"]: r for r in SNAP.read_version(spark, t).collect()}
    assert rows[1]["v"] == 5.0 and rows[1]["w"] == 2
    assert rows[2]["v"] == 0.0 and rows[2]["w"] == 2
    assert rows[50]["v"] == 3.0
    # unparseable clause fragments raise instead of being dropped
    with pytest.raises(ValueError, match="fragment"):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING c_feed s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = 1 "
            "WHEN MATCHED OOPS garbage",
            {"tbl": t},
        )


def test_insert_into_and_truncate(spark, tmp_path):
    t = str(tmp_path / "tbl")
    SNAP.write_version(
        spark.range(0, 5).selectExpr("id", "CAST(id AS DOUBLE) AS v"), t
    )
    execute_dml(
        spark,
        "INSERT INTO tbl SELECT id + 100, CAST(-1.0 AS DOUBLE) "
        "FROM range(3)",
        {"tbl": t},
    )
    got = SNAP.read_version(spark, t)
    assert got.count() == 8
    assert got.where("id >= 100").count() == 3
    assert got.columns == ["id", "v"]  # positional bind renames

    execute_dml(
        spark, "INSERT INTO tbl VALUES (200, 9.0), (201, 9.5)", {"tbl": t}
    )
    assert SNAP.read_version(spark, t).count() == 10
    with pytest.raises(ValueError):
        execute_dml(spark, "INSERT INTO tbl SELECT 1", {"tbl": t})

    execute_dml(spark, "TRUNCATE TABLE tbl", {"tbl": t})
    final = SNAP.read_version(spark, t)
    assert final.count() == 0
    assert final.columns == ["id", "v"]  # schema survives
    assert len(SNAP.main_versions(t)) >= 4  # history survives


def test_duplicate_and_misplaced_when_clauses_raise(spark, tmp_path):
    """A second clause of the same kind would silently overwrite the
    first, and WHEN MATCHED THEN INSERT is meaningless — both raise
    instead of guessing."""
    t = str(tmp_path / "tbl")
    SNAP.write_version(spark.range(0, 3).selectExpr("id", "id AS v"), t)
    spark.range(1).selectExpr("id", "id AS d").createOrReplaceTempView("dup_f")
    with pytest.raises(ValueError, match="one WHEN NOT MATCHED"):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING dup_f s ON t.id = s.id "
            "WHEN NOT MATCHED AND s.d = 1 THEN INSERT (id) VALUES (s.id) "
            "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.d)",
            {"tbl": t},
        )
    with pytest.raises(ValueError, match="one WHEN MATCHED ... UPDATE"):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING dup_f s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = 1 "
            "WHEN MATCHED THEN UPDATE SET v = 2",
            {"tbl": t},
        )
    with pytest.raises(ValueError, match="one WHEN MATCHED ... DELETE"):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING dup_f s ON t.id = s.id "
            "WHEN MATCHED AND s.d = 1 THEN DELETE "
            "WHEN MATCHED AND s.d = 2 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            {"tbl": t},
        )
    with pytest.raises(ValueError, match="unsupported WHEN MATCHED"):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING dup_f s ON t.id = s.id "
            "WHEN MATCHED THEN INSERT (id) VALUES (s.id) "
            "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)",
            {"tbl": t},
        )


def test_alias_strip_preserves_string_literals():
    from binance_etl_spark.operators.sql_dml import (
        _strip_alias_outside_quotes,
    )

    assert (
        _strip_alias_outside_quotes("s.note = 'see s.3' AND s.b = 1", "s")
        == "note = 'see s.3' AND b = 1"
    )
    # a dotted reference like x.s.col is NOT an s.-prefixed column
    assert _strip_alias_outside_quotes("x.s.col = 2", "s") == "x.s.col = 2"


def test_dotted_names_require_explicit_alias(spark, tmp_path):
    t = str(tmp_path / "tbl")
    SNAP.write_version(spark.range(0, 3).selectExpr("id", "id AS v"), t)
    spark.range(1).selectExpr("id", "id AS v").createOrReplaceTempView("dsrc")
    with pytest.raises(ValueError, match="explicit alias"):
        execute_dml(
            spark,
            "MERGE INTO db.tbl USING dsrc s ON db.tbl.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            {"db.tbl": t},
        )


def test_insert_only_merge_is_pure_append(spark, tmp_path):
    """An INSERT-only column MERGE must not rewrite files holding
    matched keys — matched rows are untouched, so the commit carries
    every prior file by name and only appends the unmatched rows."""
    t = str(tmp_path / "tbl")
    SNAP.write_version(
        spark.range(0, 20).selectExpr("id", "CAST(id AS DOUBLE) AS v"), t
    )
    before = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])["files"]
    spark.createDataFrame(
        [(5, 1.0), (50, 2.0)], "id BIGINT, delta DOUBLE"
    ).createOrReplaceTempView("io_feed")
    execute_dml(
        spark,
        "MERGE INTO tbl t USING io_feed s ON t.id = s.id "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.delta)",
        {"tbl": t},
    )
    after = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])["files"]
    assert set(before) <= set(after)  # zero rewrites of matched files
    got = {r["id"]: r["v"] for r in SNAP.read_version(spark, t).collect()}
    assert got[5] == 5.0  # matched row untouched
    assert got[50] == 2.0  # unmatched row inserted
    assert len(got) == 21


def test_star_merge_matched_clause_order_enforced(spark, tmp_path):
    """ANSI/Delta evaluate WHEN MATCHED clauses in textual order and
    only the LAST may omit its condition. This engine applies the
    DELETE branch before UPDATE SET *, so star-mode text with the
    unconditioned UPDATE first (or an unguarded DELETE first) must be
    REJECTED, not silently executed with different semantics than a
    warehouse engine would give the same text."""
    import pytest

    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.operators.sql_dml import execute_dml

    t = str(tmp_path / "tbl")
    SNAP.write_version(
        spark.range(0, 10).selectExpr("id", "CAST(id AS DOUBLE) AS v"), t
    )
    spark.createDataFrame(
        [(1, -1.0), (99, 9.0)], "id BIGINT, v DOUBLE"
    ).createOrReplaceTempView("order_feed")
    with pytest.raises(ValueError, match="unreachable"):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING order_feed s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN MATCHED AND s.v < 0 THEN DELETE "
            "WHEN NOT MATCHED THEN INSERT *",
            {"tbl": t},
        )
    with pytest.raises(ValueError, match="guard the DELETE"):
        execute_dml(
            spark,
            "MERGE INTO tbl t USING order_feed s ON t.id = s.id "
            "WHEN MATCHED THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            {"tbl": t},
        )
    # the canonical order still executes
    execute_dml(
        spark,
        "MERGE INTO tbl t USING order_feed s ON t.id = s.id "
        "WHEN MATCHED AND s.v < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"tbl": t},
    )
    got = {r["id"]: r["v"] for r in SNAP.read_version(spark, t).collect()}
    assert 1 not in got and got[99] == 9.0 and len(got) == 10


def test_alter_table_rename_drop_add(spark, tmp_path):
    """ALTER TABLE text lowers onto the metadata-only schema-edit
    operators, and the SAME text runs on DuckDB (shared-text DDL the
    way UPDATE/DELETE are shared)."""
    import duckdb

    table = str(tmp_path / "t")
    SNAP.write_version(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v"), table
    )
    stmts = [
        "ALTER TABLE t RENAME COLUMN v TO price",
        "ALTER TABLE t ADD COLUMN note string",
        "ALTER TABLE t DROP COLUMN note",
    ]
    for s in stmts:
        execute_dml(spark, s, {"t": table})
    got = SNAP.read_version(spark, table)
    assert got.columns == ["id", "price"]
    assert sorted(r["price"] for r in got.collect()) == [
        i * 2 for i in range(10)
    ]
    # zero data I/O: all three commits carry the original file verbatim
    ms = [SNAP._load_manifest(table, v) for v in SNAP.versions(table)]
    assert all(m["files"] == ms[0]["files"] for m in ms[1:])

    # the identical text drives DuckDB (type name differs: string ->
    # VARCHAR is the one engine-specific token, as documented)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT i AS id, i * 2 AS v FROM range(10) r(i)")
    for s in stmts:
        con.execute(s.replace(" string", " VARCHAR"))
    cols = [d[0] for d in con.execute("SELECT * FROM t").description]
    assert cols == ["id", "price"]


def test_alter_table_guards_propagate(spark, tmp_path):
    table = str(tmp_path / "t")
    SNAP.write_version(
        spark.range(0, 5).selectExpr("id", "id * 2 AS v"),
        table,
        unique_keys=["id"],
    )
    with pytest.raises(ValueError, match="unique_keys"):
        execute_dml(spark, "ALTER TABLE t RENAME COLUMN id TO key", {"t": table})
    with pytest.raises(ValueError, match="bad field"):
        execute_dml(spark, "ALTER TABLE t ADD COLUMNS nope", {"t": table})


def test_alter_add_drop_constraint(spark, tmp_path):
    table = str(tmp_path / "t")
    SNAP.write_version(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v"), table
    )
    # existing data violates -> refused, nothing committed
    n_before = len(SNAP.versions(table))
    with pytest.raises(ValueError, match="expectations violated"):
        execute_dml(
            spark, "ALTER TABLE t ADD CONSTRAINT v_big CHECK (v > 100)",
            {"t": table},
        )
    assert len(SNAP.versions(table)) == n_before

    execute_dml(
        spark, "ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)",
        {"t": table},
    )
    # the constraint now gates appends
    with pytest.raises(ValueError, match="expectations violated"):
        SNAP.write_version(
            spark.range(0, 1).selectExpr("id", "CAST(-2 AS BIGINT) AS v"),
            table,
        )
    # duplicate name refused
    with pytest.raises(ValueError, match="already exists"):
        execute_dml(
            spark, "ALTER TABLE t ADD CONSTRAINT v_pos CHECK (v >= 0)",
            {"t": table},
        )
    # drop releases the gate
    execute_dml(spark, "ALTER TABLE t DROP CONSTRAINT v_pos", {"t": table})
    SNAP.write_version(
        spark.range(0, 1).selectExpr("id", "CAST(-2 AS BIGINT) AS v"), table
    )
    assert SNAP.read_version(spark, table).where("v < 0").count() == 1
    with pytest.raises(ValueError, match="no constraint"):
        execute_dml(spark, "ALTER TABLE t DROP CONSTRAINT nope", {"t": table})
