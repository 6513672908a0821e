"""main.idx.json checkpoint edge cases (operators/snapshots.py)."""

from __future__ import annotations


def test_corrupt_idx_rebuild_keeps_full_history(spark, tmp_path):
    """A missing/corrupt main.idx.json must be rebuilt from a FULL
    manifest scan at the next commit — seeding an empty idx and
    stamping last=v would hide every earlier main version from
    idx-answered reads."""
    import os

    from binance_etl_spark.operators import snapshots as SNAP

    t = str(tmp_path / "tbl")
    SNAP.write_version(spark.range(0, 5).selectExpr("id", "id AS v"), t)
    for i in range(3):
        SNAP.write_version(
            spark.range(i * 10, i * 10 + 2).selectExpr("id", "id AS v"),
            t,
            mode="append",
        )
    full = SNAP.main_versions(t)
    assert len(full) == 4
    idx_path = os.path.join(SNAP._manifest_dir(t), SNAP._MAIN_IDX)
    os.remove(idx_path)  # simulate corruption/loss
    SNAP.write_version(
        spark.range(100, 102).selectExpr("id", "id AS v"), t, mode="append"
    )
    rebuilt = SNAP.main_versions(t)
    assert rebuilt == full + [rebuilt[-1]]
    # and the idx itself (not just the scan fallback) answers fully
    import json

    idx = json.load(open(idx_path))
    assert idx["main"] == rebuilt and idx["last"] == rebuilt[-1]
