"""Column mapping: metadata-only RENAME/DROP COLUMN over the snapshot
log (operators/snapshots.py::rename_column/drop_column — the Delta
column-mapping model: files keep immutable PHYSICAL names; logical
renames/drops edit only the manifest's schema + logical->physical
map). Under test: zero data I/O, per-version logical schemas (time
travel shows each version's own names), appends/rewrites after a
rename, the retired-physical-name ledger, constraint guards, stats
pruning through the mapping, DV reads, restore/clone, and the batch
DataSource."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from binance_etl_spark.operators import snapshots as SNAP
from binance_etl_spark.sources.snapshot_batch import read_snapshot


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def _vals(df, col="v"):
    return sorted(r[col] for r in df.collect())


def test_rename_is_metadata_only_and_versioned(spark, table):
    v1 = SNAP.write_version(_df(spark, 0, 100), table)
    files_before = SNAP._load_manifest(table, v1)["files"]
    v2 = SNAP.rename_column(table, "v", "price")
    m2 = SNAP._load_manifest(table, v2)
    # zero data I/O: the file list is carried verbatim
    assert m2["files"] == files_before
    assert m2["column_mapping"] == {"price": "v"}
    # head reads the NEW logical name with the same values
    head = SNAP.read_version(spark, table)
    assert head.columns == ["id", "price"]
    assert _vals(head, "price") == [i * 2 for i in range(100)]
    # time travel shows the old version's OWN name
    old = SNAP.read_version(spark, table, v1)
    assert old.columns == ["id", "v"]


def test_append_after_rename_writes_physical_names(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.rename_column(table, "v", "price")
    v3 = SNAP.write_version(
        spark.range(10, 20).selectExpr("id", "id * 2 AS price"), table
    )
    m3 = SNAP._load_manifest(table, v3)
    assert m3["column_mapping"] == {"price": "v"}
    # the NEW files physically carry the original name
    new_files = [f for f in m3["files"] if f.startswith("data/tx-")]
    assert new_files
    names = pq.ParquetFile(os.path.join(table, new_files[-1])).schema_arrow.names
    assert "v" in names and "price" not in names
    got = SNAP.read_version(spark, table)
    assert _vals(got, "price") == [i * 2 for i in range(20)]


def test_rename_then_rewrites_stay_correct(spark, table):
    SNAP.write_version(_df(spark, 0, 100), table)
    SNAP.rename_column(table, "v", "price")
    SNAP.delete_where(spark, table, "price >= 100")  # drops ids 50..99
    SNAP.update_where(spark, table, "id = 0", {"price": "price + 7"})
    got = SNAP.read_version(spark, table)
    assert _vals(got, "price") == sorted(
        [7] + [i * 2 for i in range(1, 50)]
    )
    # compact reads through the mapping and re-writes physical names
    v = SNAP.compact(spark, table)
    got2 = SNAP.read_version(spark, table, v)
    assert _vals(got2, "price") == _vals(got, "price")


def test_rename_preserves_dv_reads(spark, table):
    SNAP.write_version(_df(spark, 0, 100), table)
    SNAP.delete_where_mor(spark, table, "v < 10")
    SNAP.rename_column(table, "v", "price")
    got = SNAP.read_version(spark, table)
    assert _vals(got, "price") == [i * 2 for i in range(5, 50)] + [
        i * 2 for i in range(50, 100)
    ]


def test_stats_pruning_translates_through_mapping(spark, table):
    SNAP.write_version(
        _df(spark, 0, 1000).repartitionByRange(4, "id"),
        table,
        stats_cols=["v"],
    )
    SNAP.rename_column(table, "v", "price")
    kept, skipped = SNAP.select_files(table, None, "price", 0, 10)
    assert skipped, "expected file skipping on the renamed column"
    # append after the rename records stats under the PHYSICAL key
    SNAP.write_version(
        spark.range(5000, 6000).selectExpr("id", "id * 2 AS price"),
        table,
        stats_cols=["price"],
    )
    m = SNAP._load_manifest(table, SNAP.main_versions(table)[-1])
    new_files = [f for f in m["files"] if f.startswith("data/tx-")]
    assert all("v" in m["stats"][f] for f in new_files if f in m["stats"])
    kept2, skipped2 = SNAP.select_files(table, None, "price", 0, 10)
    assert len(skipped2) > len(skipped)


def test_constraint_guards_refuse_rename_and_drop(spark, table):
    SNAP.write_version(
        _df(spark, 0, 10),
        table,
        expectations={"v_pos": "v >= 0"},
        unique_keys=["id"],
    )
    with pytest.raises(ValueError, match="expectation:v_pos"):
        SNAP.rename_column(table, "v", "price")
    with pytest.raises(ValueError, match="unique_keys"):
        SNAP.drop_column(table, "id")


def test_freed_physical_name_is_reserved(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.rename_column(table, "v", "price")
    # a new column may not take the physical name 'v'
    with pytest.raises(ValueError, match="PHYSICAL"):
        SNAP.add_columns(table, {"v": "bigint"})
    with pytest.raises(ValueError, match="PHYSICAL"):
        SNAP.write_version(
            spark.range(10, 20).selectExpr(
                "id", "id * 2 AS price", "id AS v"
            ),
            table,
        )
    with pytest.raises(ValueError, match="PHYSICAL"):
        SNAP.rename_column(table, "price", "v")


def test_drop_column_retires_physical_name(spark, table):
    SNAP.write_version(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v", "id * 3 AS w"),
        table,
    )
    v2 = SNAP.drop_column(table, "w")
    got = SNAP.read_version(spark, table)
    assert got.columns == ["id", "v"]
    assert SNAP._load_manifest(table, v2)["retired_columns"] == ["w"]
    # the dead physical name cannot come back
    with pytest.raises(ValueError, match="PHYSICAL"):
        SNAP.add_columns(table, {"w": "bigint"})
    # but time travel still reads it in v1
    old = SNAP.read_version(spark, table, SNAP.versions(table)[0])
    assert old.columns == ["id", "v", "w"]
    # drop of a RENAMED column retires its PHYSICAL name
    SNAP.rename_column(table, "v", "price")
    v4 = SNAP.drop_column(table, "price")
    assert SNAP._load_manifest(table, v4)["retired_columns"] == ["v", "w"]


def test_restore_across_rename_shows_old_schema(spark, table):
    v1 = SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.rename_column(table, "v", "price")
    SNAP.restore(table, v1)
    got = SNAP.read_version(spark, table)
    assert got.columns == ["id", "v"]
    # and the mapping did not leak onto the restored head
    head = SNAP._load_manifest(table, SNAP.main_versions(table)[-1])
    assert head.get("column_mapping", {}) == {}


def test_shallow_clone_carries_mapping(spark, table, tmp_path):
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.rename_column(table, "v", "price")
    clone = str(tmp_path / "clone")
    SNAP.shallow_clone(table, clone)
    got = SNAP.read_version(spark, clone)
    assert got.columns == ["id", "price"]
    assert _vals(got, "price") == [i * 2 for i in range(10)]


def test_batch_source_reads_mapped_table(spark, table):
    SNAP.write_version(_df(spark, 0, 50), table, stats_cols=["v"])
    SNAP.rename_column(table, "v", "price")
    SNAP.write_version(
        spark.range(50, 60).selectExpr("id", "id * 2 AS price"), table
    )
    df = read_snapshot(spark, table)
    assert sorted(df.columns) == ["id", "price"]
    assert _vals(df, "price") == [i * 2 for i in range(60)]
    pruned = read_snapshot(spark, table, prune=True).where("price <= 20")
    assert _vals(pruned, "price") == [i * 2 for i in range(11)]


def test_read_changes_after_rename(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    v2 = SNAP.rename_column(table, "v", "price")
    v3 = SNAP.write_version(
        spark.range(10, 12).selectExpr("id", "id * 2 AS price"), table
    )
    ch = SNAP.read_changes(spark, table, v2, v3)
    rows = ch.collect()
    assert {r["change_type"] for r in rows} == {"insert"}
    assert sorted(r["price"] for r in rows) == [20, 22]
    # a rename alone is a zero-change commit
    assert SNAP.read_changes(spark, table, v2 - 1, v2).count() == 0


def test_append_racing_rename_is_refused_cleanly(spark, table, monkeypatch):
    """A rename committed between an append's staging and its commit
    loop must refuse the append (the staged bytes carry stale physical
    names) and clean up its staging dir — never publish a mixed-name
    file."""
    SNAP.write_version(_df(spark, 0, 10), table)
    dirs_before = set(os.listdir(os.path.join(table, "data")))
    real_stage = SNAP._stage_files
    fired = {"done": False}

    def stage_then_rename(table_dir, rel_dir, **kw):
        out = real_stage(table_dir, rel_dir, **kw)
        if not fired["done"] and rel_dir.startswith("data/tx-"):
            fired["done"] = True
            SNAP.rename_column(table, "v", "price")  # the racer
        return out

    monkeypatch.setattr(SNAP, "_stage_files", stage_then_rename)
    with pytest.raises(ValueError, match="concurrent column-mapping"):
        SNAP.write_version(_df(spark, 10, 20), table)
    monkeypatch.setattr(SNAP, "_stage_files", real_stage)
    # table state: the rename won, the append is fully absent
    got = SNAP.read_version(spark, table)
    assert got.columns == ["id", "price"]
    assert got.count() == 10
    # staging cleaned on refusal: no NEW data dir survives (the first
    # commit's tx- dir is permanent table data, not staging)
    assert set(os.listdir(os.path.join(table, "data"))) == dirs_before


def test_schema_edit_dml_fuzz(spark, tmp_path):
    """Seeded random interleaving of metadata schema edits (RENAME /
    DROP / ADD COLUMN through the ALTER text front end) with physical
    DML (INSERT / UPDATE / DELETE) against an in-memory model: after
    every statement the table must equal the model exactly, under
    whatever logical schema is current."""
    import random

    from binance_etl_spark.operators.sql_dml import execute_dml

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        table = str(tmp_path / f"fz{seed}")
        cols = ["a", "b"]  # mutable non-key columns, id is fixed
        model = {i: {"a": i * 3, "b": i % 5} for i in range(20)}
        SNAP.write_version(
            spark.createDataFrame(
                [(k, v["a"], v["b"]) for k, v in sorted(model.items())],
                "id long, a long, b long",
            ).repartition(2),
            table,
        )
        next_id, next_col = 20, 0
        stmts = []

        def check():
            rows = SNAP.read_version(spark, table).collect()
            got = {
                r["id"]: {c: r[c] for c in cols} for r in rows
            }
            assert got == model, f"seed {seed} after {stmts[-1]!r}"

        for _ in range(14):
            op = rng.choice(
                ["rename", "drop", "add", "insert", "update", "delete"]
            )
            if op == "rename":
                old = rng.choice(cols)
                new = f"c{next_col}"
                next_col += 1
                stmt = f"ALTER TABLE t RENAME COLUMN {old} TO {new}"
                cols[cols.index(old)] = new
                for v in model.values():
                    v[new] = v.pop(old)
            elif op == "drop":
                if len(cols) < 2:
                    continue
                victim = rng.choice(cols)
                stmt = f"ALTER TABLE t DROP COLUMN {victim}"
                cols.remove(victim)
                for v in model.values():
                    del v[victim]
            elif op == "add":
                new = f"c{next_col}"
                next_col += 1
                stmt = f"ALTER TABLE t ADD COLUMN {new} bigint"
                cols.append(new)
                for v in model.values():
                    v[new] = None
            elif op == "insert":
                vals = [
                    tuple(
                        [next_id + i]
                        + [rng.randrange(100) for _ in cols]
                    )
                    for i in range(rng.randrange(1, 3))
                ]
                next_id += len(vals)
                body = ", ".join(str(t) for t in vals)
                stmt = f"INSERT INTO t VALUES {body}"
                for t in vals:
                    model[t[0]] = dict(zip(cols, t[1:]))
            elif op == "update":
                c = rng.choice(cols)
                add = rng.randrange(1, 9)
                r = rng.randrange(0, 4)
                stmt = f"UPDATE t SET {c} = {c} + {add} WHERE id % 4 = {r}"
                for k, v in model.items():
                    if k % 4 == r and v[c] is not None:
                        v[c] += add
            else:
                r = rng.randrange(0, 5)
                stmt = f"DELETE FROM t WHERE id % 5 = {r}"
                model = {k: v for k, v in model.items() if k % 5 != r}
            stmts.append(stmt)
            execute_dml(spark, stmt, {"t": table})
            check()


def test_mor_update_and_delete_on_renamed_column(spark, table):
    """Regression: the MOR paths scan raw files with _metadata, so
    they must read the PHYSICAL schema and project to logical — with
    a logical-schema scan the renamed column reads NULL (update wrote
    NULL deltas; delete matched nothing). Found by the schema-edit
    artillery (test_snapshot_model.py)."""
    SNAP.write_version(_df(spark, 0, 6), table)
    SNAP.rename_column(table, "v", "price")
    SNAP.update_where_mor(spark, table, "id = 2", {"price": "price + 100"})
    SNAP.delete_where_mor(spark, table, "price = 8")  # id 4
    got = sorted(
        (r["id"], r["price"])
        for r in SNAP.read_version(spark, table).collect()
    )
    assert got == [(0, 0), (1, 2), (2, 104), (3, 6), (5, 10)]
    # and the delta file physically carries the ORIGINAL name
    import pyarrow.parquet as pq2

    m = SNAP._load_manifest(table, SNAP.main_versions(table)[-1])
    delta = [f for f in m["files"] if f.startswith("data/v")]
    names = pq2.ParquetFile(os.path.join(table, delta[-1])).schema_arrow.names
    assert "v" in names and "price" not in names


# ---- round-9 regression battery: branch-lane ledger parity --------------


def test_branch_append_refuses_renamed_physical_name_reuse(spark, table):
    """write_branch append gets write_version's physical-name reuse
    guard: a branch append adding a column named after a renamed
    column's PHYSICAL name would make carried files' dead bytes
    resurface as the new column's values."""
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.rename_column(table, "v", "price")
    SNAP.create_branch(table, "wap")
    bad = spark.range(10, 20).selectExpr(
        "id", "id * 2 AS price", "id AS v"
    )
    with pytest.raises(ValueError, match="PHYSICAL name"):
        SNAP.write_branch(bad, table, "wap")


def test_branch_append_refuses_retired_physical_name_reuse(spark, table):
    SNAP.write_version(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v", "id AS w"), table
    )
    SNAP.drop_column(table, "w")
    SNAP.create_branch(table, "wap")
    bad = spark.range(10, 20).selectExpr("id", "id * 2 AS v", "id + 1 AS w")
    with pytest.raises(ValueError, match="PHYSICAL name"):
        SNAP.write_branch(bad, table, "wap")


def test_branch_manifest_retired_ledger_explicit(spark, table):
    """Branch manifests record retired_columns explicitly (matching
    write_version): append carries the head's ledger; overwrite clears
    it — _commit_manifest's truthiness carry must never re-import the
    main head's ledger into an overwritten branch lane."""
    SNAP.write_version(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v", "id AS w"), table
    )
    SNAP.drop_column(table, "w")
    SNAP.create_branch(table, "wap")
    bv1 = SNAP.write_branch(
        spark.range(10, 20).selectExpr("id", "id * 2 AS v"), table, "wap"
    )
    m1 = SNAP._load_manifest(table, bv1)
    assert m1["retired_columns"] == ["w"]
    bv2 = SNAP.write_branch(
        spark.range(0, 5).selectExpr("id", "id AS w"),
        table,
        "wap",
        mode="overwrite",
    )
    m2 = SNAP._load_manifest(table, bv2)
    assert m2["retired_columns"] == []
    assert m2["column_mapping"] == {}
    # the overwritten lane may legally reuse the name: fresh files
    got = SNAP.read_ref(spark, table, "wap")
    assert sorted(r["w"] for r in got.collect()) == list(range(5))


def test_pruning_reader_pushdown_state_not_mutated(spark, table):
    """SnapshotPruningBatchReader translates logical->physical stats
    keys into a LOCAL list: repeated partitions() calls (Spark may
    re-plan) must not re-translate already-translated names."""
    from binance_etl_spark.sources.snapshot_batch import (
        SnapshotPruningBatchReader,
        _batch_schema,
    )
    from pyspark.sql.datasource import EqualTo

    SNAP.write_version(
        _df(spark, 0, 1000).repartitionByRange(4, "id"),
        table,
        stats_cols=["v"],
    )
    SNAP.rename_column(table, "v", "price")
    opts = {"path": table}
    reader = SnapshotPruningBatchReader(opts, _batch_schema(opts))
    reader.pushFilters([EqualTo(("price",), 4)])
    before = [list(rs) for rs in reader._range_sets]
    k1 = reader._kept_files()
    assert [list(rs) for rs in reader._range_sets] == before
    k2 = reader._kept_files()  # second planning pass: same answer
    assert k1 == k2
    assert len(k1) < len(SNAP._load_manifest(
        table, SNAP.main_versions(table)[-1]
    )["files"])


def test_rename_then_wap_branch_roundtrip(spark, table):
    """Deterministic branch+rename seed: stage onto a WAP branch forked
    AFTER a rename — write_branch must write PHYSICAL names (the fork
    head's mapping), publish must serve logical ones, and the published
    head must keep the mapping for later MOR ops."""
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.rename_column(table, "v", "price")
    SNAP.create_branch(table, "wap")
    SNAP.write_branch(
        spark.range(10, 20).selectExpr("id", "id * 2 AS price"), table, "wap"
    )
    # staged rows invisible to default readers
    assert SNAP.read_version(spark, table).count() == 10
    SNAP.publish_branch(table, "wap")
    got = SNAP.read_version(spark, table)
    assert got.columns == ["id", "price"]
    assert _vals(got, "price") == [i * 2 for i in range(20)]
    # the staged files physically carry the original name
    m = SNAP._load_manifest(table, SNAP.main_versions(table)[-1])
    assert m["column_mapping"] == {"price": "v"}
    SNAP.delete_where_mor(spark, table, "price >= 30")  # ids 15..19
    got2 = SNAP.read_version(spark, table)
    assert _vals(got2, "price") == [i * 2 for i in range(15)]
