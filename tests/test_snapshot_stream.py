"""Streaming source over the snapshot log
(sources/snapshot_stream.py) — the Delta streaming-source contract:
append commits stream exactly once with _commit_version, rewrite
commits raise unless skipChangeCommits, offsets restart from the
checkpoint, and the versioned schema governs evolved reads."""

from __future__ import annotations

import pytest

from binance_etl_spark.operators import snapshots as SNAP
from binance_etl_spark.sources.snapshot_stream import stream_snapshot


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def _drain(spark, sdf, name, checkpoint=None):
    w = sdf.writeStream.format("memory").queryName(name).outputMode("append")
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def test_catchup_then_live_appends_stream_exactly_once(spark, tmp_path):
    table = str(tmp_path / "t")
    SNAP.write_version(_df(spark, 0, 10), table)
    SNAP.write_version(_df(spark, 10, 15), table)

    name = "snapstream_basic"
    q = (
        stream_snapshot(spark, table)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.id, r._commit_version) for r in spark.table(name).collect()}
        assert {i for i, _ in got} == set(range(15))
        assert all(cv == (1 if i < 10 else 2) for i, cv in got)
        # live append lands mid-stream; only the delta is served
        SNAP.write_version(_df(spark, 15, 18), table)
        q.processAllAvailable()
        rows = spark.table(name).collect()
        assert len(rows) == 18, "no row served twice"
        assert {r.id for r in rows if r._commit_version == 3} == {15, 16, 17}
    finally:
        q.stop()


def test_rewrite_commit_raises_unless_skipped(spark, tmp_path):
    table = str(tmp_path / "t")
    SNAP.write_version(_df(spark, 0, 20).repartitionByRange(2, "id"), table)
    SNAP.delete_where(spark, table, "id < 3")
    SNAP.write_version(_df(spark, 20, 25), table)

    q = stream_snapshot(spark, table).writeStream.format("memory").queryName(
        "snapstream_strict"
    ).start()
    try:
        with pytest.raises(Exception, match="skipChangeCommits"):
            q.processAllAvailable()
    finally:
        q.stop()

    got = _drain(
        spark, stream_snapshot(spark, table, skip_change_commits=True),
        "snapstream_skip",
    ).collect()
    ids = sorted(r.id for r in got)
    # v1's full base + v3's append; the delete commit contributes nothing
    # (including its rewritten survivors — no re-serve)
    assert ids == list(range(25))
    assert {r._commit_version for r in got} == {1, 3}


def test_append_after_skipped_rewrite_diffs_against_rewritten_list(
    spark, tmp_path
):
    """The file-diff cursor must track THROUGH a skipped rewrite: the
    next append's delta is its new files only, not the rewrite's."""
    table = str(tmp_path / "t")
    SNAP.write_version(_df(spark, 0, 10).repartitionByRange(2, "id"), table)
    start = _drain(
        spark, stream_snapshot(spark, table, skip_change_commits=True),
        "snapstream_cursor_a",
    ).count()
    assert start == 10
    SNAP.delete_where(spark, table, "id = 0")  # rewrite (skipped)
    SNAP.write_version(_df(spark, 10, 12), table)  # append after rewrite
    got = _drain(
        spark, stream_snapshot(spark, table, skip_change_commits=True),
        "snapstream_cursor_b",
    ).collect()
    by_v = {}
    for r in got:
        by_v.setdefault(r._commit_version, set()).add(r.id)
    assert by_v[3] == {10, 11}, "post-rewrite append serves only its own files"


def test_checkpoint_restart_serves_only_new_versions(spark, tmp_path):
    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    SNAP.write_version(_df(spark, 0, 8), table)

    def run():
        rows: list = []
        q = (
            stream_snapshot(spark, table)
            .writeStream.foreachBatch(lambda df, _i: rows.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return rows

    first = run()
    assert sorted(r.id for r in first) == list(range(8))
    SNAP.write_version(_df(spark, 8, 11), table)
    second = run()
    assert sorted(r.id for r in second) == [8, 9, 10], "restart from offset"
    assert all(r._commit_version == 2 for r in second)


def test_evolved_schema_serves_null_for_pre_evolution_files(spark, tmp_path):
    table = str(tmp_path / "t")
    SNAP.write_version(_df(spark, 0, 5), table)
    SNAP.write_version(
        _df(spark, 5, 9).selectExpr("id", "v", "id * 3 AS w"), table
    )
    got = _drain(spark, stream_snapshot(spark, table), "snapstream_evo").collect()
    w = {r.id: r.w for r in got}
    assert w[2] is None and w[7] == 21
    assert len(got) == 9
