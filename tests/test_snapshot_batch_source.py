"""Batch snapshot DataSource (sources/snapshot_batch.py) — the
`spark.read.format("snapshot")` surface: consistency with read_version
across MOR deletes and schema evolution, versionAsOf time travel, and
manifest-stats file pruning through pushFilters."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from binance_etl_spark.catalog import load
from binance_etl_spark.operators import snapshots as SNAP
from binance_etl_spark.sources.snapshot_batch import (
    SnapshotBatchReader,
    SnapshotPruningBatchReader,
    _batch_schema,
    read_snapshot,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def table(spark):
    d = load(spark, SF, "documents").select("doc_id", "lang", "n_chars")
    t = tempfile.mkdtemp(prefix="besk_bsrc_") + "/docs"
    SNAP.write_version(
        d.repartitionByRange(4, "doc_id"), t, stats_cols=["doc_id"]
    )
    SNAP.delete_where_mor(spark, t, "doc_id % 5 = 2")
    SNAP.add_columns(t, {"quality": "double"})
    SNAP.write_version(
        d.where(F.col("doc_id") % 5 == 2).withColumn("quality", F.lit(0.5)),
        t,
        mode="append",
        stats_cols=["doc_id"],
    )
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.select("doc_id", "lang", "n_chars", "quality").collect())


def test_latest_matches_read_version(spark, table):
    got = read_snapshot(spark, table)
    want = SNAP.read_version(spark, table)
    assert got.schema == want.schema or set(got.columns) == set(want.columns)
    assert _rows(got) == _rows(want)
    # MOR-deleted originals are gone, re-appended copies present
    ids = [r["doc_id"] for r in got.collect()]
    assert len(ids) == len(set(ids))  # no resurrected duplicates


def test_version_as_of_time_travel(spark, table):
    got = read_snapshot(spark, table, version=1)
    want = SNAP.read_version(spark, table, version=1)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # v1 predates the evolution: no quality column
    assert "quality" not in got.columns


def test_evolved_column_is_null_for_old_files(spark, table):
    got = read_snapshot(spark, table)
    n_old = got.where(F.col("quality").isNull()).count()
    n_new = got.where(F.col("quality") == 0.5).count()
    assert n_new > 0 and n_old > 0
    assert n_old + n_new == got.count()


def test_push_filters_prune_files_from_stats(spark, table):
    opts = {"path": table}
    schema = _batch_schema(opts)
    reader = SnapshotBatchReader(opts, schema)
    total = len(reader.partitions())
    assert total >= 5  # 4 range files + the append
    from pyspark.sql.datasource import DataSourceReader

    # default reader must NOT override pushFilters (safe under scan reuse)
    assert SnapshotBatchReader.pushFilters is DataSourceReader.pushFilters

    pruned = SnapshotPruningBatchReader(opts, schema)
    unhandled = pruned.pushFilters([EqualTo(("doc_id",), 3)])
    # every filter comes back: pruning is I/O-only, Spark re-applies
    assert len(list(unhandled)) == 1
    assert len(pruned.partitions()) < total

    rng = SnapshotPruningBatchReader(opts, schema)
    rng.pushFilters([GreaterThanOrEqual(("doc_id",), 0), LessThan(("doc_id",), 5)])
    assert len(rng.partitions()) < total

    # defense in depth: a shared reader fed CONFLICTING scans keeps the
    # UNION of survivors — it must never prune below either leg's needs
    multi = SnapshotPruningBatchReader(opts, schema)
    multi.pushFilters([EqualTo(("doc_id",), 3)])
    n_one = len(multi.partitions())
    multi.pushFilters([GreaterThanOrEqual(("doc_id",), 10_000)])
    assert len(multi.partitions()) >= n_one


def test_shared_relation_conflicting_filters_join_is_correct(spark, table):
    """REGRESSION (Spark Python-source pushdown hazard): one load()
    relation scanned under two conflicting filters inside ONE query
    returned zero rows when the reader implemented pushFilters. The
    default reader implements none, so this must be exact."""
    idx = read_snapshot(spark, table)
    legA = idx.where(F.col("quality").isNull()).groupBy().count()
    legB = idx.where(F.col("quality") == 0.5).groupBy().count()
    both = legA.crossJoin(legB.withColumnRenamed("count", "count_b")).first()
    want = SNAP.read_version(spark, table)
    assert both["count"] == want.where(F.col("quality").isNull()).count()
    assert both["count_b"] == want.where(F.col("quality") == 0.5).count()


def test_filtered_read_is_still_exact(spark, table):
    got = read_snapshot(spark, table).where("doc_id >= 10 AND doc_id < 20")
    want = SNAP.read_version(spark, table).where("doc_id >= 10 AND doc_id < 20")
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_sql_ddl_view_over_snapshot_table(spark, table):
    """Snapshot tables are addressable from PURE SQL — CREATE VIEW
    USING snapshot — so a SQL-only consumer needs no Python API at
    all (the Delta `USING delta` ergonomics)."""
    from binance_etl_spark.sources.snapshot_batch import register

    register(spark)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW snap_docs "
        f"USING snapshot OPTIONS (path '{table}')"
    )
    got = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(quality) AS nq FROM snap_docs"
    ).first()
    want = SNAP.read_version(spark, table)
    assert got["n"] == want.count()
    assert got["nq"] == want.where(F.col("quality").isNotNull()).count()


def test_timestamp_as_of_reads_the_then_newest_snapshot(spark, table):
    """timestampAsOf through the DataSource must match
    read_version_as_of: mtime gates eligibility, version orders."""
    import os as _os
    import time

    from binance_etl_spark.operators.snapshots import _manifest_dir
    from binance_etl_spark.sources.snapshot_batch import read_snapshot as RS

    mdir = _manifest_dir(table)
    t_v1 = _os.path.getmtime(_os.path.join(mdir, "v1.json"))
    got = RS(spark, table, timestamp=t_v1)
    want = SNAP.read_version_as_of(spark, table, t_v1)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # a timestamp after every commit serves the latest snapshot
    now = time.time() + 60
    assert RS(spark, table, timestamp=now).count() == SNAP.read_version(
        spark, table
    ).count()
    with pytest.raises(Exception):
        RS(spark, table, timestamp=t_v1 - 10_000).count()


def test_sql_time_travel_via_view_options(spark, table):
    """SQL-only time travel: versionAsOf rides the view's OPTIONS, so
    a SQL consumer pins a snapshot with DDL alone."""
    from binance_etl_spark.sources.snapshot_batch import register

    register(spark)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW snap_docs_v1 "
        f"USING snapshot OPTIONS (path '{table}', versionAsOf '1')"
    )
    got = spark.sql("SELECT COUNT(*) AS n FROM snap_docs_v1").first()["n"]
    assert got == SNAP.read_version(spark, table, version=1).count()
    # v1 predates the evolution: the pinned view has no quality column
    cols = [f.name for f in spark.table("snap_docs_v1").schema.fields]
    assert "quality" not in cols


def test_clone_of_mor_table_applies_borrowed_dv_through_batch_source(
    spark, tmp_path
):
    """A shallow clone's manifest lists borrowed files ABSOLUTELY while
    the borrowed DV sidecar's `f` entries stay source-relative; the
    reader must match both spellings or it silently serves deleted rows
    (round-6 advisor finding — untested combination)."""
    src = str(tmp_path / "src")
    clone = str(tmp_path / "clone")
    d = load(spark, SF, "documents").select("doc_id", "lang", "n_chars")
    SNAP.write_version(d.repartitionByRange(4, "doc_id"), src)
    SNAP.delete_where_mor(spark, src, "doc_id % 5 = 2")
    SNAP.shallow_clone(src, clone)
    got = read_snapshot(spark, clone)
    want = SNAP.read_version(spark, clone)
    assert got.count() == want.count()
    assert got.where("doc_id % 5 = 2").count() == 0
    # a clone-local MOR delete (mixed-spelling sidecar) composes too
    SNAP.delete_where_mor(spark, clone, "doc_id % 5 = 3")
    got2 = read_snapshot(spark, clone)
    assert got2.where("doc_id % 5 = 3").count() == 0
    assert got2.count() == SNAP.read_version(spark, clone).count()
