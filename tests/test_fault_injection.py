"""Fault injection for the state-swap commit protocols: kill the
process (simulated by a raising rename/replace) at every dangerous
point and prove (a) committed state is never lost, (b) a replayed /
retried micro-batch never double-counts and completes.

Covers VERDICT r3/r4 items: cms_stream's sketch+ledger commit must be
one atomic publish, and sinks._swap_state's rename window must be
recoverable by the next batch's read."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.operators.text import cms_cells
from binance_etl_spark.streaming import cms_stream, sinks
from binance_etl_spark.streaming.cms_stream import foreach_batch_cms, read_sketch
from binance_etl_spark.streaming.sinks import foreach_batch_upsert, recover_state

SF = "/root/testdata/sf0.01"


class Boom(RuntimeError):
    pass


def _cells_dict(df):
    return {(r["d"], r["bucket"]): r["c"] for r in df.collect()}


def _doc_batches(spark, n=2):
    d = load(spark, SF, "documents").select("doc_id", "text")
    return [d.where(F.col("doc_id") % n == i) for i in range(n)]


def test_cms_crash_at_commit_point_then_replay_counts_once(spark, monkeypatch):
    """Kill exactly at the atomic commit (the CURRENT pointer replace):
    the state must still be the pre-batch state, and replaying the
    batch must produce the exact once-applied sketch — no double count,
    no partial (sketch-without-ledger) state."""
    b0, b1 = _doc_batches(spark)
    with tempfile.TemporaryDirectory() as root:
        state = os.path.join(root, "cms")
        apply = foreach_batch_cms(state)
        apply(b0, 0)
        before = _cells_dict(read_sketch(spark, state))

        real_replace = os.replace

        def failing_replace(src, dst, *a, **kw):
            if os.path.basename(str(dst)) == "CURRENT" and str(dst).startswith(state):
                raise Boom("crash at commit point")
            return real_replace(src, dst, *a, **kw)

        monkeypatch.setattr(cms_stream.os, "replace", failing_replace)
        with pytest.raises(Boom):
            apply(b1, 1)
        monkeypatch.undo()

        # crash before the pointer flip: committed state is untouched
        assert _cells_dict(read_sketch(spark, state)) == before

        apply(b1, 1)  # replay after restart
        apply(b1, 1)  # and a second replay must be a ledger no-op
        streamed = _cells_dict(read_sketch(spark, state))

    full_toks = load(spark, SF, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    assert streamed == _cells_dict(cms_cells(full_toks)), (
        "replayed batch must count exactly once"
    )


def test_cms_crash_after_commit_then_replay_is_noop(spark, monkeypatch):
    """Kill after the pointer flip (during best-effort GC): the commit
    is published, so the replayed batch must be a no-op."""
    b0, b1 = _doc_batches(spark)
    with tempfile.TemporaryDirectory() as root:
        state = os.path.join(root, "cms")
        apply = foreach_batch_cms(state)
        apply(b0, 0)

        real_rmtree = cms_stream.shutil.rmtree

        def failing_rmtree(path, *a, **kw):
            raise Boom("crash during GC")

        monkeypatch.setattr(cms_stream.shutil, "rmtree", failing_rmtree)
        try:
            apply(b1, 1)  # GC errors are allowed to surface or not
        except Boom:
            pass
        monkeypatch.setattr(cms_stream.shutil, "rmtree", real_rmtree)

        after_crash = _cells_dict(read_sketch(spark, state))
        apply(b1, 1)  # replay: ledger already contains batch 1
        assert _cells_dict(read_sketch(spark, state)) == after_crash

    full_toks = load(spark, SF, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    assert after_crash == _cells_dict(cms_cells(full_toks))


def test_swap_state_crash_between_renames_recovers_and_retries(spark, monkeypatch):
    """Kill `_swap_state` between rename(live -> .__old) and
    rename(staging -> live): the committed table must survive on disk,
    the next batch's read must see it (recover_state), and the retried
    batch must complete with the correct merged result."""
    with tempfile.TemporaryDirectory() as root:
        state = os.path.join(root, "book")
        apply = foreach_batch_upsert(state, ["symbol"], ["ts"])
        b0 = spark.createDataFrame(
            [("BTC", 1, 100.0), ("ETH", 1, 10.0)], "symbol STRING, ts INT, px DOUBLE"
        )
        b1 = spark.createDataFrame(
            [("BTC", 2, 101.0), ("SOL", 1, 5.0)], "symbol STRING, ts INT, px DOUBLE"
        )
        apply(b0, 0)

        real_rename = os.rename

        def failing_rename(src, dst, *a, **kw):
            if "__staging_" in str(src):
                raise Boom("crash between the two renames")
            return real_rename(src, dst, *a, **kw)

        monkeypatch.setattr(sinks.os, "rename", failing_rename)
        with pytest.raises(Boom):
            apply(b1, 1)
        monkeypatch.undo()

        # the committed table survives (renamed aside, never deleted)
        assert os.path.isdir(state + ".__old") and not os.path.isdir(state)

        # a bare reader can heal and see the committed state
        recover_state(state)
        rows = {r["symbol"]: r["px"] for r in spark.read.parquet(state).collect()}
        assert rows == {"BTC": 100.0, "ETH": 10.0}

        # retry completes and merges against the recovered state
        apply(b1, 1)
        rows = {r["symbol"]: r["px"] for r in spark.read.parquet(state).collect()}
        assert rows == {"BTC": 101.0, "ETH": 10.0, "SOL": 5.0}
        assert not os.path.isdir(state + ".__old")


def test_swap_state_crash_after_swap_drops_stale_old(spark, monkeypatch):
    """Kill after the second rename but before cleanup: `.__old` is
    stale; recovery must keep the NEW table and drop the old copy."""
    with tempfile.TemporaryDirectory() as root:
        state = os.path.join(root, "book")
        apply = foreach_batch_upsert(state, ["symbol"], ["ts"])
        apply(
            spark.createDataFrame([("BTC", 1, 100.0)], "symbol STRING, ts INT, px DOUBLE"),
            0,
        )

        real_rmtree = sinks.shutil.rmtree

        def failing_rmtree(path, *a, **kw):
            if str(path).endswith(".__old"):
                raise Boom("crash before old-copy cleanup")
            return real_rmtree(path, *a, **kw)

        monkeypatch.setattr(sinks.shutil, "rmtree", failing_rmtree)
        with pytest.raises(Boom):
            apply(
                spark.createDataFrame(
                    [("BTC", 2, 101.0)], "symbol STRING, ts INT, px DOUBLE"
                ),
                1,
            )
        monkeypatch.undo()

        assert os.path.isdir(state) and os.path.isdir(state + ".__old")
        recover_state(state)
        assert not os.path.isdir(state + ".__old")
        rows = {r["symbol"]: r["px"] for r in spark.read.parquet(state).collect()}
        assert rows == {"BTC": 101.0}


def test_recover_state_sweeps_orphaned_staging(spark, monkeypatch):
    """A crash DURING the staging parquet write leaves a .__staging_*
    orphan; the next batch's recover_state must sweep it (single-writer
    contract) while leaving the committed table untouched."""
    with tempfile.TemporaryDirectory() as root:
        state = os.path.join(root, "book")
        apply = foreach_batch_upsert(state, ["symbol"], ["ts"])
        apply(
            spark.createDataFrame([("BTC", 1, 100.0)], "symbol STRING, ts INT, px DOUBLE"),
            0,
        )
        orphan = state + ".__staging_deadbeef"
        os.makedirs(orphan)
        recover_state(state)
        assert not os.path.isdir(orphan), "orphaned staging dir swept"
        rows = {r["symbol"]: r["px"] for r in spark.read.parquet(state).collect()}
        assert rows == {"BTC": 100.0}


# ---- round-9: crash faults around metadata-only ALTER commits -----------


def test_rename_crash_before_commit_leaves_table_intact(
    spark, tmp_path, monkeypatch
):
    """A writer that dies between claiming its version and publishing
    the rename manifest must leave the table EXACTLY as it was: old
    logical schema, old mapping, readable; and a retried rename must
    succeed (the stranded claim is crash debris the next committer
    waits out, never a corrupt state)."""
    from binance_etl_spark.operators import snapshots as SNAP

    table = str(tmp_path / "t")
    SNAP.write_version(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v"), table
    )
    real_commit = SNAP._commit_manifest

    def dying_commit(table_dir, v, manifest):
        raise OSError("simulated crash before manifest publish")

    monkeypatch.setattr(SNAP, "_commit_manifest", dying_commit)
    with pytest.raises(OSError, match="simulated crash"):
        SNAP.rename_column(table, "v", "price")
    monkeypatch.setattr(SNAP, "_commit_manifest", real_commit)
    got = SNAP.read_version(spark, table)
    assert got.columns == ["id", "v"]  # table untouched
    assert got.count() == 10
    # retry succeeds; the crashed attempt's claim is waited out/skipped
    SNAP.rename_column(table, "v", "price")
    got2 = SNAP.read_version(spark, table)
    assert got2.columns == ["id", "price"]
    assert sorted(r["price"] for r in got2.collect()) == [
        i * 2 for i in range(10)
    ]


def test_stray_tmp_manifest_is_invisible(spark, tmp_path):
    """A crash INSIDE _commit_manifest (after writing .tmp-vN.json,
    before the atomic os.replace) leaves a dot-prefixed temp file in
    the manifest dir: every read surface must ignore it."""
    import json as _json

    from binance_etl_spark.operators import snapshots as SNAP

    table = str(tmp_path / "t")
    v1 = SNAP.write_version(
        spark.range(0, 5).selectExpr("id", "id AS v"), table
    )
    mdir = SNAP._manifest_dir(table)
    with open(os.path.join(mdir, f".tmp-v{v1 + 1}.json"), "w") as f:
        _json.dump({"version": v1 + 1, "mode": "rename_column",
                    "files": [], "schema": None}, f)
    assert SNAP.main_versions(table)[-1] == v1
    assert SNAP.read_version(spark, table).count() == 5
    # and the next real commit claims/uses the version number cleanly
    v2 = SNAP.rename_column(table, "v", "w")
    assert v2 > v1
    assert SNAP.read_version(spark, table).columns == ["id", "w"]
