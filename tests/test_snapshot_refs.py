"""Snapshot-log refs: tags, branches, write-audit-publish (WAP), and
incremental (small-file-only) compaction — operators/snapshots.py.

The WAP contract under test is Iceberg's: staged branch commits share
the table's version log and data namespace but are INVISIBLE to every
default reader until an audited, fast-forward-only publish; a tag pins
a snapshot against retention."""

from __future__ import annotations

import os

import pytest

from binance_etl_spark.operators import snapshots as SNAP


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


# --- incremental compaction ------------------------------------------


def test_incremental_compact_merges_only_small_files(spark, table):
    # one big commit (single file) + many small append commits
    SNAP.write_version(_df(spark, 0, 50_000).coalesce(1), table)
    for i in range(4):
        SNAP.write_version(
            _df(spark, 50_000 + i * 10, 50_000 + (i + 1) * 10).coalesce(1), table
        )
    m_before = SNAP._load_manifest(table, SNAP.versions(table)[-1])
    big = [
        rel
        for rel, meta in m_before["file_meta"].items()
        if meta["bytes"] >= 100_000
    ]
    assert big, "expected the 50k-row file to exceed the threshold"
    v = SNAP.compact(spark, table, min_file_bytes=100_000)
    m = SNAP._load_manifest(table, v)
    assert m["mode"] == "compact"
    # the big file is carried BY NAME — zero I/O for it
    for rel in big:
        assert rel in m["files"]
    assert m["carried"] == len(big)
    assert m["rewrote"] == len(m_before["files"]) - len(big)
    # row-preserving
    assert SNAP.read_version(spark, table).count() == 50_040
    # far fewer files than before
    assert len(m["files"]) < len(m_before["files"])


def test_incremental_compact_noop_when_nothing_to_merge(spark, table):
    SNAP.write_version(_df(spark, 0, 50_000).coalesce(1), table)
    head = SNAP.versions(table)[-1]
    assert SNAP.compact(spark, table, min_file_bytes=100_000) == head
    assert SNAP.versions(table)[-1] == head  # no new commit


# --- tags -------------------------------------------------------------


def test_tag_pins_snapshot_and_survives_vacuum(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.create_tag(table, "train-v1")
    SNAP.write_version(_df(spark, 10, 20), table)
    SNAP.write_version(_df(spark, 20, 30), table)
    assert SNAP.read_ref(spark, table, "train-v1").count() == 10
    # tags are immutable names
    with pytest.raises(FileExistsError):
        SNAP.create_tag(table, "train-v1")
    # vacuum(keep_last=1) would expire v1, but the tag pins it
    SNAP.vacuum(table, keep_last=1)
    assert SNAP.read_ref(spark, table, "train-v1").count() == 10
    # dropping the tag releases the pin
    SNAP.drop_ref(table, "train-v1")
    SNAP.vacuum(table, keep_last=1)
    assert 1 not in SNAP.versions(table)


# --- branches + WAP ---------------------------------------------------


def test_branch_commits_invisible_until_published(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.create_branch(table, "staging")
    bv = SNAP.write_branch(_df(spark, 10, 25), table, "staging")
    # staged rows visible on the branch...
    assert SNAP.read_ref(spark, table, "staging").count() == 25
    assert SNAP.read_version(spark, table, bv).count() == 25  # explicit
    # ...but every default-reader surface still sees only main
    assert SNAP.read_version(spark, table).count() == 10
    assert SNAP.count_rows(table) == 10
    assert SNAP.main_versions(table) == [1]
    # a concurrent main append is NOT contaminated by the staged files
    SNAP.write_version(_df(spark, 1000, 1005), table)
    assert SNAP.read_version(spark, table).count() == 15


def test_publish_is_zero_copy_and_atomic(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.create_branch(table, "wap")
    SNAP.write_branch(_df(spark, 10, 25), table, "wap")
    head = SNAP.refs(table)["wap"]["version"]
    head_files = set(SNAP._load_manifest(table, head)["files"])
    v = SNAP.publish_branch(table, "wap")
    m = SNAP._load_manifest(table, v)
    assert m["mode"] == "publish" and m["published_from"] == head
    # publish carries the audited FILE LIST by name — no new data files
    assert set(m["files"]) == head_files
    assert SNAP.read_version(spark, table).count() == 25
    assert SNAP.count_rows(table) == 25


def test_publish_audit_failure_leaves_main_untouched(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.create_branch(table, "wap")
    SNAP.write_branch(_df(spark, 10, 25), table, "wap")
    with pytest.raises(ValueError, match="expectations violated"):
        SNAP.publish_branch(table, "wap", spark=spark, audit={"v_small": "v < 40"})
    assert SNAP.read_version(spark, table).count() == 10
    # fix the data on a fresh branch-overwrite and publish with audit
    SNAP.write_branch(
        _df(spark, 0, 12), table, "wap", mode="overwrite"
    )
    v = SNAP.publish_branch(table, "wap", spark=spark, audit={"v_small": "v < 40"})
    assert SNAP.read_version(spark, table, v).count() == 12


def test_publish_refuses_non_fast_forward(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.create_branch(table, "wap")
    SNAP.write_branch(_df(spark, 10, 25), table, "wap")
    SNAP.write_version(_df(spark, 100, 105), table)  # main advances
    with pytest.raises(RuntimeError, match="fast-forward"):
        SNAP.publish_branch(table, "wap")
    assert SNAP.read_version(spark, table).count() == 15


def test_branch_writes_inherit_expectations(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table, expectations={"pos": "id >= 0"})
    SNAP.create_branch(table, "b")
    with pytest.raises(ValueError, match="expectations violated"):
        SNAP.write_branch(_df(spark, -5, 0), table, "b")


def test_vacuum_expires_unpinned_branch_commits(spark, table):
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.create_branch(table, "b")
    bv1 = SNAP.write_branch(_df(spark, 10, 20), table, "b")
    bv2 = SNAP.write_branch(_df(spark, 20, 30), table, "b")
    SNAP.write_version(_df(spark, 100, 110), table)
    # branch HEAD (bv2) is ref-pinned; the intermediate bv1 expires
    SNAP.vacuum(table, keep_last=1)
    vs = SNAP.versions(table)
    assert bv2 in vs and bv1 not in vs
    assert SNAP.read_ref(spark, table, "b").count() == 30


def test_stream_skips_staged_commits_and_serves_publish(spark, table, tmp_path):
    from binance_etl_spark.sources.snapshot_stream import stream_snapshot

    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.create_branch(table, "wap")
    SNAP.write_branch(_df(spark, 10, 25), table, "wap")

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            stream_snapshot(spark, table)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    # staged rows did NOT stream
    assert drain().count() == 10
    # publish, then resume: exactly the staged rows arrive as adds
    SNAP.publish_branch(table, "wap")
    got = drain()
    assert got.count() == 25
    assert got.selectExpr("max(id)").collect()[0][0] == 24


def test_streaming_wap_ingestion_e2e(spark, table, tmp_path):
    """The streaming write-audit-publish loop: a real writeStream
    stages micro-batches onto a branch (replay-idempotent via batch
    ids), main stays untouched throughout, and one audited publish
    atomically exposes everything staged."""
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.create_branch(table, "ingest")

    src = str(tmp_path / "src")
    _df(spark, 100, 150).coalesce(2).write.parquet(src)
    sdf = spark.readStream.schema("id BIGINT, v BIGINT").parquet(src)
    q = (
        sdf.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(SNAP.foreach_batch_branch(table, "ingest"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # staged rows visible on the branch, invisible on main
    assert SNAP.read_ref(spark, table, "ingest").count() == 60
    assert SNAP.read_version(spark, table).count() == 10
    assert SNAP.count_rows(table) == 10

    # replay: re-applying an already-committed batch id is a no-op
    head_before = SNAP.refs(table)["ingest"]["version"]
    bm = SNAP._load_manifest(table, head_before)
    assert "batch_id" in bm
    v = SNAP.write_branch(
        _df(spark, 100, 150), table, "ingest", batch_id=bm["batch_id"]
    )
    assert v == head_before
    assert SNAP.refs(table)["ingest"]["version"] == head_before

    # audited publish exposes exactly the staged snapshot
    SNAP.publish_branch(
        table, "ingest", spark=spark, audit={"ids_sane": "id < 1000"}
    )
    assert SNAP.read_version(spark, table).count() == 60


def test_compact_zorder_clusters_and_prunes(spark, table):
    """compact(zorder_by=[a, b]) — OPTIMIZE ZORDER: the rewrite
    clusters rows on the Morton curve of both columns and records
    their per-file stats, so `select_files` prunes on EITHER
    dimension afterwards; row-preserving like every compact."""
    df = spark.range(100_000).selectExpr(
        "id AS a", "CAST((id * 7919) % 100000 AS BIGINT) AS b"
    )
    SNAP.write_version(df.repartition(8), table)
    v = SNAP.compact(spark, table, target_files=8, zorder_by=["a", "b"])
    m = SNAP._load_manifest(table, v)
    assert m["mode"] == "compact"
    assert SNAP.read_version(spark, table, v).count() == 100_000
    # both dimensions prune: a narrow range on each must skip files
    kept_a, skipped_a = SNAP.select_files(table, v, "a", 0, 5000)
    kept_b, skipped_b = SNAP.select_files(table, v, "b", 0, 5000)
    assert skipped_a, "z-order must give file skipping on column a"
    assert skipped_b, "z-order must give file skipping on column b"
    # and pruning is still correct (never loses matching rows)
    import os as _os

    got = spark.read.parquet(*[_os.path.join(table, f) for f in kept_a])
    want = SNAP.read_version(spark, table, v).where("a BETWEEN 0 AND 5000")
    assert got.where("a BETWEEN 0 AND 5000").count() == want.count()


# --- predicate-scoped compaction (OPTIMIZE WHERE) ---------------------


def test_where_scoped_compact_rewrites_only_intersecting_files(spark, table):
    """compact(where_stats=(col, lo, hi)): files whose manifest stats
    are provably outside the range carry BY NAME; only the hot region
    rewrites, and values are identical (whole candidate files rewrite
    — row-preserving by construction)."""
    # 4 range-clustered files over id: [0,25k) [25k,50k) [50k,75k) [75k,100k)
    SNAP.write_version(
        _df(spark, 0, 100_000).repartitionByRange(4, "id"),
        table,
        stats_cols=["id"],
    )
    m0 = SNAP._load_manifest(table, SNAP.versions(table)[-1])
    assert len(m0["files"]) == 4
    want = sorted(map(tuple, SNAP.read_version(spark, table).collect()))

    # scope: the hot upper half (two of the four range files)
    v = SNAP.compact(
        spark, table, target_files=1, where_stats=("id", 50_000, 99_999)
    )
    m = SNAP._load_manifest(table, v)
    assert m["mode"] == "compact"
    outside = [
        rel
        for rel in m0["files"]
        if m0["stats"][rel]["id"][1] < 50_000
    ]
    assert len(outside) == 2
    for rel in outside:  # cold files carried by name — zero I/O
        assert rel in m["files"]
    assert m["carried"] == 2 and m["rewrote"] == 2
    got = sorted(map(tuple, SNAP.read_version(spark, table).collect()))
    assert got == want  # row-preserving

    # a scope that intersects <2 files is a no-op, no commit
    head = SNAP.versions(table)[-1]
    assert (
        SNAP.compact(spark, table, where_stats=("id", 0, 10)) == head
    )
    assert SNAP.versions(table)[-1] == head


def test_where_scoped_compact_composes_with_size_threshold(spark, table):
    """Scope first, then the size threshold: only SMALL files INSIDE
    the range merge; large in-scope files and everything out of scope
    carry."""
    SNAP.write_version(
        _df(spark, 0, 50_000).coalesce(1), table, stats_cols=["id"]
    )
    for i in range(4):  # small hot appends at the id tail
        SNAP.write_version(
            _df(spark, 50_000 + i * 10, 50_000 + (i + 1) * 10).coalesce(1),
            table,
            stats_cols=["id"],
        )
    m0 = SNAP._load_manifest(table, SNAP.versions(table)[-1])
    v = SNAP.compact(
        spark,
        table,
        min_file_bytes=100_000,
        where_stats=("id", 50_000, 60_000),
    )
    m = SNAP._load_manifest(table, v)
    assert m["rewrote"] == 4  # the four small hot files
    assert m["carried"] == len(m0["files"]) - 4
    assert SNAP.read_version(spark, table).count() == 50_040


def test_where_scoped_zorder_compact_composes(spark, table):
    """OPTIMIZE ... WHERE ... ZORDER BY: the scope limits which files
    rewrite, the rewrite itself is z-clustered, values unchanged."""
    df = spark.range(40_000).selectExpr(
        "id", "CAST(id % 200 AS INT) AS a", "CAST((id * 7) % 200 AS INT) AS b"
    )
    SNAP.write_version(df.repartitionByRange(4, "id"), table, stats_cols=["id"])
    m0 = SNAP._load_manifest(table, SNAP.versions(table)[-1])
    want = SNAP.read_version(spark, table).count()
    v = SNAP.compact(
        spark,
        table,
        target_files=4,
        zorder_by=["a", "b"],
        where_stats=("id", 20_000, 39_999),
    )
    m = SNAP._load_manifest(table, v)
    assert m["mode"] == "compact"
    assert m["carried"] == 2 and m["rewrote"] == 2  # scope held
    assert SNAP.read_version(spark, table).count() == want
    # the rewritten files carry stats for BOTH z-columns
    new_files = [f for f in m["files"] if f not in m0["files"]]
    assert new_files
    assert all(
        {"a", "b"} <= set(m["stats"][f]) for f in new_files
    )


# --- round-7 advisor fixes: idx late-insert + batch-id lanes ----------


def test_branch_and_main_batch_counters_do_not_collide(spark, table):
    """A main foreachBatch sink and a branch sink share a table; both
    batch counters start at 0. The branch's batch 0 must NOT read as a
    main-line replay of batch 0 (round-6 advisor: _find_batch_commit
    matched branch manifests and main batches were silently dropped)."""
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.create_branch(table, "ingest")
    bv = SNAP.write_branch(
        _df(spark, 100, 110), table, "ingest", batch_id=0
    )
    # main-line batch 0 arrives after the branch's batch 0: must commit
    mv = SNAP.write_version(
        _df(spark, 10, 20), table, mode="append", batch_id=0
    )
    assert mv != bv
    assert mv in SNAP.main_versions(table)
    assert SNAP.read_version(spark, table).count() == 20
    # replay of each lane's batch 0 is a no-op returning its own version
    assert SNAP.write_version(
        _df(spark, 10, 20), table, mode="append", batch_id=0
    ) == mv
    assert SNAP.write_branch(
        _df(spark, 100, 110), table, "ingest", batch_id=0
    ) == bv


def test_idx_late_insert_keeps_lower_main_commit_visible(spark, table):
    """A branch commit can publish a HIGHER version while a main
    committer is mid data-write; the main commit then updates the idx
    with v <= last. The old early-return dropped it from idx["main"]
    forever (the tail scan only covers v > last) — e.g. a GDPR delete
    vanishing from forward history."""
    SNAP.write_version(_df(spark, 0, 10), table)
    # simulate the interleave directly at the idx layer: a branch
    # commit advanced the checkpoint to v=3 while main v=2 was in flight
    SNAP._update_main_idx(table, 3, is_main=False)
    SNAP._update_main_idx(table, 2, is_main=True, batch_key="7")
    idx = SNAP._load_main_idx(table)
    assert 2 in idx["main"]
    assert idx["main"] == sorted(idx["main"])
    assert idx["batch_ids"]["7"] == 2
    assert idx["last"] == 3
