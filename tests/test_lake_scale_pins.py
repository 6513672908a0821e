"""Write-path scale regression pins (round-10, verdict items 3 & 7):

- files-REWRITTEN counts are O(affected files), pinned exactly: the
  manifest `rewrote` of delete_keys / merge_into / compact must equal
  the number of files that genuinely hold matched rows (or the small-
  file tail for compact) — a regression that silently rewrites the
  whole table still returns correct values, so only this pin catches
  it cheaply.
- merge_into's round-10 bloom-pruned affected-file scan: candidates
  come from manifest blooms (delete_keys discipline), the composite-
  key / no-bloom / big-source cases fall back to the full scan, and
  values are identical either way.
- SnapshotPruningBatchReader: repeated partitions()/pushFilters
  interleavings are idempotent (r9 fixed the mutation; this pins it).
- write_branch append/overwrite carries/clears the column-mapping +
  retired-names ledger exactly like write_version under schema edits.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from binance_etl_spark.operators import snapshots as SNAP

SF = "/root/testdata/sf0.001"


def _docs(spark, n_files: int = 8):
    return (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "lang", "n_chars")
        .repartitionByRange(n_files, "doc_id")
    )


def _table(spark, bloom: bool = True, n_files: int = 8) -> str:
    t = tempfile.mkdtemp(prefix="lake_pin_") + "/t"
    SNAP.write_version(
        _docs(spark, n_files), t, bloom_cols=["doc_id"] if bloom else None
    )
    return t


def _files_holding(spark, t: str, keys: list[int]) -> int:
    """Ground truth: how many committed files actually hold the keys."""
    m = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])
    live = SNAP._live_rows(spark, t, m, m["files"], with_file=True)
    return (
        live.where(F.col("doc_id").isin(keys))
        .select("__f")
        .distinct()
        .count()
    )


def test_delete_keys_rewrote_is_affected_file_count(spark):
    t = _table(spark)
    keys = [3, 7, 11]
    expected_files = _files_holding(spark, t, keys)
    assert expected_files >= 1
    n_before = SNAP.count_rows(t)
    v = SNAP.delete_keys(spark, t, "doc_id", keys)
    m = SNAP._load_manifest(t, v)
    assert m["rewrote"] == expected_files
    assert m["bloom_pruned"] >= 1, "range-clustered files must prune"
    assert m["rewrote"] + m["carried"] >= 8 - 1  # untouched carried by name
    assert SNAP.count_rows(t) == n_before - len(keys)


def _merge_source(spark, t: str, update_keys: list[int], new_key: int):
    head = SNAP.read_version(spark, t)
    upd = (
        head.where(F.col("doc_id").isin(update_keys))
        .withColumn("n_chars", F.col("n_chars") + F.lit(1000000))
    )
    ins = spark.createDataFrame(
        [(new_key, "xx", 1)], "doc_id BIGINT, lang STRING, n_chars BIGINT"
    ).select(*head.columns)
    return upd.unionByName(ins)


def test_merge_bloom_prunes_and_rewrites_only_matched_files(spark):
    t = _table(spark)
    update_keys = [5, 9]
    expected_files = _files_holding(spark, t, update_keys)
    src = _merge_source(spark, t, update_keys, new_key=10_000_000)
    n_before = SNAP.count_rows(t)
    v = SNAP.merge_into(spark, t, src, ["doc_id"])
    m = SNAP._load_manifest(t, v)
    assert m["rewrote"] == expected_files, "only files holding matched keys"
    assert m["bloom_pruned"] >= 1, "bloom-pruned merge scan must engage"
    assert SNAP.count_rows(t) == n_before + 1
    got = {
        r["doc_id"]: r["n_chars"]
        for r in SNAP.read_version(spark, t)
        .where(F.col("doc_id").isin(update_keys + [10_000_000]))
        .collect()
    }
    assert got[10_000_000] == 1
    assert all(got[k] > 1_000_000 for k in update_keys)


def test_merge_fallback_paths_skip_pruning_with_same_values(spark):
    # composite key: no pruning field, values still exact
    t = _table(spark)
    head = SNAP.read_version(spark, t)
    src = (
        head.where(F.col("doc_id").isin([2, 4]))
        .withColumn("n_chars", F.lit(-1))
    )
    v = SNAP.merge_into(spark, t, src, ["doc_id", "lang"])
    m = SNAP._load_manifest(t, v)
    assert "bloom_pruned" not in m
    got = (
        SNAP.read_version(spark, t)
        .where(F.col("doc_id").isin([2, 4]))
        .select("n_chars")
        .collect()
    )
    assert [r["n_chars"] for r in got] == [-1, -1]

    # bloom-less table: full-scan fallback, no pruning field, and the
    # rewrote pin still holds (computed against the PRE-merge head)
    t2 = _table(spark, bloom=False)
    expected2 = _files_holding(spark, t2, [5])
    src2 = _merge_source(spark, t2, [5], new_key=10_000_001)
    v2 = SNAP.merge_into(spark, t2, src2, ["doc_id"])
    m2 = SNAP._load_manifest(t2, v2)
    assert "bloom_pruned" not in m2
    assert m2["rewrote"] == expected2


def test_compact_min_file_bytes_rewrites_small_tail_only(spark):
    t = _table(spark, bloom=False, n_files=2)
    # append a small-file tail (4 tiny appends = 4 small files)
    for i in range(4):
        SNAP.write_version(
            spark.createDataFrame(
                [(20_000_000 + i, "aa", 1)],
                "doc_id BIGINT, lang STRING, n_chars BIGINT",
            ),
            t,
        )
    head = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])
    sizes = [
        os.path.getsize(os.path.join(t, rel)) for rel in head["files"]
    ]
    threshold = 4096
    small = sum(1 for s in sizes if s < threshold)
    assert small >= 4, "tiny appends must land under the threshold"
    n_before = SNAP.count_rows(t)
    v = SNAP.compact(spark, t, min_file_bytes=threshold)
    m = SNAP._load_manifest(t, v)
    assert m["rewrote"] == small, "compaction touches the small tail only"
    assert m["carried"] == len(sizes) - small
    assert SNAP.count_rows(t) == n_before  # row-preserving


def test_pruning_reader_interleaved_calls_idempotent(spark):
    """r9 verdict residual 1: partitions()/pushFilters interleavings
    must not mutate pushdown state (sources/snapshot_batch.py
    translates into a LOCAL list; this pins it)."""
    from pyspark.sql.types import StructType

    from binance_etl_spark.sources.snapshot_batch import (
        SnapshotPruningBatchReader,
    )

    t = tempfile.mkdtemp(prefix="lake_pin_rdr_") + "/t"
    SNAP.write_version(
        _docs(spark, 4), t, stats_cols=["doc_id"]
    )
    # rename so the reader exercises the col_map translation path
    SNAP.rename_column(t, "doc_id", "document_id")
    m = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])
    schema = SNAP._manifest_schema(m)
    assert isinstance(schema, StructType)
    reader = SnapshotPruningBatchReader({"path": t}, schema)

    from pyspark.sql.datasource import EqualTo

    reader.pushFilters([EqualTo(("document_id",), 3)])
    snap1 = [list(rs) for rs in reader._range_sets]
    kept1 = reader._kept_files()
    parts1 = [p.path for p in reader.partitions()]
    # interleave: more partitions()/_kept_files calls, then another
    # pushFilters, then repeat — state must only ever APPEND
    kept2 = reader._kept_files()
    parts2 = [p.path for p in reader.partitions()]
    assert kept1 == kept2
    assert parts1 == parts2
    assert [list(rs) for rs in reader._range_sets] == snap1, (
        "pushdown state mutated by _kept_files/partitions"
    )
    reader.pushFilters([EqualTo(("document_id",), 5)])
    kept3 = reader._kept_files()
    # union-of-survivors contract: a second pushFilters can only KEEP
    # MORE files (a file is dropped only when EVERY call's range-set
    # excludes it) — a regression that replaces instead of appending
    # would shrink this set
    assert set(kept3) >= set(kept1)
    # translated names never leak back: raw state still logical
    assert all(
        c == "document_id" for rs in reader._range_sets for c, _, _ in rs
    )


def test_write_branch_ledger_matches_write_version_under_schema_edits(spark):
    """r9 verdict residual 2: branch-lane append must carry the head's
    column mapping + retired ledger and enforce the physical-name
    reuse guard exactly like write_version; overwrite clears both."""
    t = tempfile.mkdtemp(prefix="lake_pin_br_") + "/t"
    SNAP.write_version(_docs(spark, 2), t)
    SNAP.rename_column(t, "lang", "language")
    SNAP.drop_column(t, "n_chars")
    head = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])
    SNAP.create_branch(t, "wap")

    br_df = spark.createDataFrame(
        [(30_000_000, "zz")], "doc_id BIGINT, language STRING"
    )
    v = SNAP.write_branch(br_df, t, "wap", mode="append")
    m = SNAP._load_manifest(t, v)
    assert m["column_mapping"] == SNAP._mapping(head)
    assert set(m["retired_columns"]) == set(head.get("retired_columns", []))

    # physical-name reuse guard: 'lang' is the physical name behind
    # 'language'; 'n_chars' is retired — both must refuse, as
    # write_version does
    for bad in ("lang", "n_chars"):
        with pytest.raises(ValueError, match="PHYSICAL name"):
            SNAP.write_branch(
                br_df.withColumn(bad, F.lit("x")), t, "wap", mode="append"
            )
        with pytest.raises(ValueError, match="PHYSICAL name"):
            SNAP.write_version(
                br_df.withColumn(bad, F.lit("x")), t, mode="append"
            )

    # overwrite clears the ledger on BOTH lanes
    v2 = SNAP.write_branch(br_df, t, "wap", mode="overwrite")
    m2 = SNAP._load_manifest(t, v2)
    assert m2["column_mapping"] == {}
    assert m2["retired_columns"] == []


def test_merge_null_source_key_skips_pruning(spark):
    """Review r10 finding: the bloom builder skips NULL values, so a
    NULL-keyed probe could false-negative-prune the file holding a
    NULL-keyed target row (the struct join matches NULL==NULL). The
    guard must route any NULL source key to the full scan — and the
    merge must replace the NULL-keyed row exactly like the full-scan
    semantics say."""
    t = tempfile.mkdtemp(prefix="lake_pin_null_") + "/t"
    base = spark.createDataFrame(
        [(1, "aa", 10), (2, "bb", 20), (None, "nn", 30)],
        "doc_id BIGINT, lang STRING, n_chars BIGINT",
    ).repartition(2)
    SNAP.write_version(base, t, bloom_cols=["doc_id"])
    src = spark.createDataFrame(
        [(None, "nn", 99), (5, "ee", 50)],
        "doc_id BIGINT, lang STRING, n_chars BIGINT",
    )
    v = SNAP.merge_into(spark, t, src, ["doc_id"])
    m = SNAP._load_manifest(t, v)
    assert "bloom_pruned" not in m, "NULL key must take the full scan"
    got = {
        r["doc_id"]: r["n_chars"]
        for r in SNAP.read_version(spark, t).collect()
    }
    assert got == {1: 10, 2: 20, None: 99, 5: 50}


# --- round-11: distributed zone+bloom probe + composite-key blooms ---


def _synth(spark, n_rows: int = 100_000, n_files: int = 8):
    return (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("string").alias("lang"),
            (F.col("id") * 3).alias("n_chars"),
        )
        .repartitionByRange(n_files, "doc_id")
    )


def test_merge_wide_key_distributed_prune(spark, monkeypatch):
    """r10 verdict item 1: a 10k-key CDC merge must NOT fall back to a
    full affected-file scan — the distributed zone+bloom probe opens
    only MAYBE files. The fixture is the CDC reality the zone stage
    exists for: keys contiguous in doc_id against a range-clustered
    table, so files outside the key range prune by zone even though
    accumulated per-key bloom FPR alone would read every file MAYBE."""
    # KB-scale fixture: force the distributed probe past the
    # round-11 byte gate (perf-only; both paths value-identical)
    monkeypatch.setattr(SNAP, "_PROBE_MIN_BYTES", 0)
    t = tempfile.mkdtemp(prefix="lake_pin_wide_") + "/t"
    SNAP.write_version(
        _synth(spark), t, bloom_cols=["doc_id"], stats_cols=["doc_id"]
    )
    keys = list(range(10_000))
    head = SNAP.read_version(spark, t)
    src = head.where(F.col("doc_id") < 10_000).withColumn(
        "n_chars", F.col("n_chars") + F.lit(1_000_000)
    )
    m0 = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])
    live = SNAP._live_rows(spark, t, m0, m0["files"], with_file=True)
    expected_files = (
        live.where(F.col("doc_id").isin(keys))
        .select("__f")
        .distinct()
        .count()
    )
    n_before = SNAP.count_rows(t)
    v = SNAP.merge_into(spark, t, src, ["doc_id"])
    m = SNAP._load_manifest(t, v)
    assert m["rewrote"] == expected_files, "only files holding matched keys"
    assert m["bloom_pruned"] >= 8 - expected_files - 1, (
        "wide-key probe must zone-prune the out-of-range files"
    )
    assert SNAP.count_rows(t) == n_before
    got = (
        SNAP.read_version(spark, t)
        .where(F.col("doc_id").isin([0, 9_999, 10_000]))
        .orderBy("doc_id")
        .collect()
    )
    assert [r["n_chars"] for r in got] == [1_000_000, 1_029_997, 30_000]


def test_merge_composite_key_bloom_prunes(spark, monkeypatch):
    """r10 verdict item 2: a composite (doc_id, lang) merge key with a
    composite bloom spec takes the PRUNED path (the old guard fell
    back to a full scan for any multi-column key), including a
    NULL-keyed row — the composite encoding is null-preserving, so
    NULL==NULL struct-join matches stay visible to the probe."""
    # KB-scale fixture: force the distributed probe past the
    # round-11 byte gate (perf-only; both paths value-identical)
    monkeypatch.setattr(SNAP, "_PROBE_MIN_BYTES", 0)
    t = tempfile.mkdtemp(prefix="lake_pin_comp_") + "/t"
    base = _synth(spark)
    nullrow = spark.createDataFrame(
        [(None, None, 777)], "doc_id BIGINT, lang STRING, n_chars BIGINT"
    )
    SNAP.write_version(
        base.unionByName(nullrow).repartitionByRange(8, "doc_id"),
        t,
        bloom_cols=[("doc_id", "lang")],
    )
    m0 = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])
    assert m0["bloom_cols"] == ["doc_id,lang"]
    head = SNAP.read_version(spark, t)
    src = head.where(F.col("doc_id").isin([5, 9])).withColumn(
        "n_chars", F.lit(-1)
    )
    src = src.unionByName(
        spark.createDataFrame(
            [(None, None, 888)], "doc_id BIGINT, lang STRING, n_chars BIGINT"
        )
    )
    v = SNAP.merge_into(spark, t, src, ["doc_id", "lang"])
    m = SNAP._load_manifest(t, v)
    assert m.get("bloom_pruned") is not None, "composite path must prune"
    assert m["bloom_pruned"] >= 1
    got = {
        r["doc_id"]: r["n_chars"]
        for r in SNAP.read_version(spark, t)
        .where(F.col("doc_id").isin([5, 9]) | F.col("doc_id").isNull())
        .collect()
    }
    assert got == {5: -1, 9: -1, None: 888}


def test_merge_composite_key_prunes_after_rename(spark, monkeypatch):
    """The composite spec stores PHYSICAL names; _bloom_spec_for must
    resolve it through the column mapping after a rename, and the
    positional k0..kn encoding must keep build==probe despite the
    logical name change."""
    # KB-scale fixture: force the distributed probe past the
    # round-11 byte gate (perf-only; both paths value-identical)
    monkeypatch.setattr(SNAP, "_PROBE_MIN_BYTES", 0)
    t = tempfile.mkdtemp(prefix="lake_pin_compren_") + "/t"
    SNAP.write_version(_synth(spark), t, bloom_cols=[("doc_id", "lang")])
    SNAP.rename_column(t, "lang", "language")
    head = SNAP.read_version(spark, t)
    src = head.where(F.col("doc_id") == 11).withColumn("n_chars", F.lit(-2))
    v = SNAP.merge_into(spark, t, src, ["doc_id", "language"])
    m = SNAP._load_manifest(t, v)
    assert m.get("bloom_pruned") is not None
    assert m["bloom_pruned"] >= 1
    got = (
        SNAP.read_version(spark, t)
        .where(F.col("doc_id") == 11)
        .collect()
    )
    assert [r["n_chars"] for r in got] == [-2]


def test_delete_keys_wide_distributed(spark, monkeypatch):
    """delete_keys above the driver cap routes through the distributed
    probe: rewrote stays O(affected files), values exact."""
    # KB-scale fixture: force the distributed probe past the
    # round-11 byte gate (perf-only; both paths value-identical)
    monkeypatch.setattr(SNAP, "_PROBE_MIN_BYTES", 0)
    t = tempfile.mkdtemp(prefix="lake_pin_widedel_") + "/t"
    SNAP.write_version(
        _synth(spark), t, bloom_cols=["doc_id"], stats_cols=["doc_id"]
    )
    keys = list(range(2_000))
    n_before = SNAP.count_rows(t)
    v = SNAP.delete_keys(spark, t, "doc_id", keys)
    m = SNAP._load_manifest(t, v)
    assert SNAP.count_rows(t) == n_before - 2_000
    assert m["bloom_pruned"] >= 6, "zone stage must prune out-of-range files"
    assert m["rewrote"] <= 8 - m["bloom_pruned"]


def test_wide_probe_null_key_still_falls_back(spark, monkeypatch):
    """The single-column NULL-source-key fallback survives the wide
    path: >1024 keys with one NULL must decline pruning (the builder
    skips NULLs) and still merge the NULL row correctly."""
    # KB-scale fixture: force the distributed probe past the
    # round-11 byte gate (perf-only; both paths value-identical)
    monkeypatch.setattr(SNAP, "_PROBE_MIN_BYTES", 0)
    t = tempfile.mkdtemp(prefix="lake_pin_widenull_") + "/t"
    base = _synth(spark, n_rows=5_000, n_files=4).unionByName(
        spark.createDataFrame(
            [(None, "nn", 30)], "doc_id BIGINT, lang STRING, n_chars BIGINT"
        )
    )
    SNAP.write_version(
        base.repartitionByRange(4, "doc_id"), t, bloom_cols=["doc_id"]
    )
    head = SNAP.read_version(spark, t)
    src = head.where(
        F.col("doc_id").isNotNull() & (F.col("doc_id") < 1_500)
    ).withColumn("n_chars", F.lit(-3))
    src = src.unionByName(
        spark.createDataFrame(
            [(None, "nn", 99)], "doc_id BIGINT, lang STRING, n_chars BIGINT"
        )
    )
    v = SNAP.merge_into(spark, t, src, ["doc_id"])
    m = SNAP._load_manifest(t, v)
    assert "bloom_pruned" not in m, "NULL key must take the full scan"
    got = {
        r["doc_id"]: r["n_chars"]
        for r in SNAP.read_version(spark, t)
        .where(F.col("doc_id").isNull() | (F.col("doc_id") == 10))
        .collect()
    }
    assert got == {None: 99, 10: -3}


def test_select_files_keys_on_shallow_clone_borrowed_blooms(spark):
    """The distributed probe must canonicalize borrowed bloom-index
    `f` entries exactly like _load_bloom_entries (a shallow clone's
    manifest lists its source's files ABSOLUTE while the borrowed
    index records them source-relative) — a spelling mismatch would
    silently disable pruning (or worse, mis-assign verdicts)."""
    t = _table(spark)  # bloom_cols=["doc_id"], 8 range files
    dst = tempfile.mkdtemp(prefix="lake_pin_clone_") + "/c"
    SNAP.shallow_clone(t, dst)
    m = SNAP._load_manifest(dst, SNAP.main_versions(dst)[-1])
    keys_sdf = spark.range(20).select(
        F.col("id").cast("string").alias("_kv"),
        F.col("id").cast("long").alias("_rv"),
    )
    res = SNAP.select_files_keys(
        spark, dst, None, ["doc_id"], keys_sdf, manifest=m
    )
    assert res is not None, "borrowed blooms must engage on a clone"
    cand, skipped = res
    assert len(skipped) >= 1, "clone probe must prune via borrowed index"
    assert len(cand) + len(skipped) == len(m["files"])
    # correctness: every file truly holding a probed key is a candidate
    live = SNAP._live_rows(spark, dst, m, m["files"], with_file=True)
    holding = {
        os.path.normpath(r["__f"])
        for r in live.where(F.col("doc_id") < 20)
        .select("__f")
        .distinct()
        .collect()
    }
    assert holding, "fixture must hold probed keys"
    assert holding <= {os.path.normpath(c) for c in cand}


def test_select_files_keys_last_index_wins(spark):
    """A file covered by TWO index datasets must take the verdict of
    the LATER one (the _load_bloom_entries last-wins rule): simulate a
    stale early index whose bitmap would wrongly prune by writing an
    all-zeros index first and the real one after."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = _table(spark)
    v = SNAP.main_versions(t)[-1]
    m = SNAP._load_manifest(t, v)
    real_rel = m["bloom_indexes"][-1]
    real = pq.read_table(os.path.join(t, real_rel))
    # stale twin: same files/col/m/k, all-zero bitmaps (prunes all)
    zero = pa.table(
        {
            "f": real["f"],
            "col": real["col"],
            "m": real["m"],
            "k": real["k"],
            "bits": pa.array(
                [b"\x00" * len(b.as_py()) for b in real["bits"]],
                pa.binary(),
            ),
        }
    )
    stale_rel = os.path.join("bloom", "stale0")
    os.makedirs(os.path.join(t, stale_rel), exist_ok=True)
    pq.write_table(zero, os.path.join(t, stale_rel, "part-0.parquet"))
    m2 = dict(m)
    m2["bloom_indexes"] = [stale_rel] + list(m["bloom_indexes"])
    keys_sdf = (
        spark.range(50)
        .select(
            F.col("id").cast("string").alias("_kv"),
            F.col("id").cast("long").alias("_rv"),
        )
    )
    res = SNAP.select_files_keys(
        spark, t, None, ["doc_id"], keys_sdf, manifest=m2
    )
    assert res is not None
    cand, _sk = res
    live = SNAP._live_rows(spark, t, m, m["files"], with_file=True)
    holding = {
        os.path.normpath(r["__f"])
        for r in live.where(F.col("doc_id") < 50)
        .select("__f")
        .distinct()
        .collect()
    }
    assert holding, "fixture must hold probed keys"
    assert holding <= {os.path.normpath(c) for c in cand}, (
        "stale earlier index must not override the later one"
    )


def test_zone_stage_boundary_inclusive_randomized(spark):
    """Zone pruning must keep keys exactly AT a file's min/max (the
    searchsorted left/right inclusivity): randomized range tables +
    key sets planted on exact file boundaries, asserting no pruned
    file ever holds a probed key, for both the driver path
    (select_files_point) and the distributed path (select_files_keys
    driven through merge_into's wide branch)."""
    import random

    rng = random.Random(1107)
    for trial in range(3):
        n = rng.choice([3_000, 7_000])
        nf = rng.choice([4, 6])
        t = tempfile.mkdtemp(prefix=f"lake_pin_zb{trial}_") + "/t"
        SNAP.write_version(
            _synth(spark, n_rows=n, n_files=nf),
            t,
            bloom_cols=["doc_id"],
            stats_cols=["doc_id"],
        )
        m = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])
        # exact per-file boundaries from the manifest stats
        bounds = [
            tuple(st["doc_id"]) for st in m["stats"].values() if "doc_id" in st
        ]
        edge_keys = sorted({b for lo, hi in bounds for b in (lo, hi)})
        probe = edge_keys + [rng.randrange(n) for _ in range(20)]
        cand, skipped = SNAP.select_files_point(t, None, "doc_id", probe)
        live = SNAP._live_rows(spark, t, m, m["files"], with_file=True)
        holding = {
            os.path.normpath(r["__f"])
            for r in live.where(F.col("doc_id").isin(probe))
            .select("__f")
            .distinct()
            .collect()
        }
        assert holding <= {os.path.normpath(c) for c in cand}, (
            f"trial {trial}: boundary key pruned from its own file"
        )
        # distributed path on the same probe set
        kdf = spark.createDataFrame(
            [(v,) for v in sorted(set(probe))], "_v BIGINT"
        ).select(
            F.col("_v").cast("string").alias("_kv"),
            F.col("_v").cast("long").alias("_rv"),
        )
        res = SNAP.select_files_keys(spark, t, None, ["doc_id"], kdf)
        assert res is not None
        assert holding <= {os.path.normpath(c) for c in res[0]}


def test_merge_paths_randomized_vs_model(spark, monkeypatch):
    """Randomized MERGE fuzz across all four probe paths (driver
    <=1024, distributed wide, composite, NULL fallback): every trial
    compares the post-merge table against a pure-Python dict model AND
    pins rewrote == ground-truth affected files. Catches interaction
    bugs a fixed fixture can't (keys straddling file boundaries, empty
    prune sets, insert-only sources)."""
    # KB-scale fixture: force the distributed probe past the
    # round-11 byte gate (perf-only; both paths value-identical)
    monkeypatch.setattr(SNAP, "_PROBE_MIN_BYTES", 0)
    import random

    rng = random.Random(42)
    for trial in range(4):
        n = rng.choice([4_000, 9_000])
        nf = rng.choice([4, 7])
        composite = trial == 2
        keys = ["doc_id", "lang"] if composite else ["doc_id"]
        t = tempfile.mkdtemp(prefix=f"lake_fuzz{trial}_") + "/t"
        base = _synth(spark, n_rows=n, n_files=nf)
        SNAP.write_version(
            base,
            t,
            bloom_cols=[tuple(keys) if composite else keys[0]],
            stats_cols=["doc_id"],
        )
        model = {
            (r["doc_id"], r["lang"]) if composite else r["doc_id"]: r[
                "n_chars"
            ]
            for r in base.collect()
        }
        # source: random updates (some contiguous, some scattered,
        # size straddles the 1024 driver cap) + inserts
        width = rng.choice([40, 1_600, 2_500])
        lo = rng.randrange(n)
        upd_ids = sorted(
            {(lo + i) % n for i in range(width // 2)}
            | {rng.randrange(n) for _ in range(width // 2)}
        )
        ins_ids = [n + 1_000_000 + i for i in range(rng.randrange(1, 4))]
        head = SNAP.read_version(spark, t)
        src = head.where(F.col("doc_id").isin(upd_ids)).withColumn(
            "n_chars", F.col("n_chars") + F.lit(10_000_000)
        )
        ins = spark.createDataFrame(
            [(i, "zz", -7) for i in ins_ids],
            "doc_id BIGINT, lang STRING, n_chars BIGINT",
        )
        src = src.unionByName(ins.select(*head.columns))
        src_rows = src.collect()
        m0 = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])
        live = SNAP._live_rows(spark, t, m0, m0["files"], with_file=True)
        if composite:
            kstruct = F.struct("doc_id", "lang")
            skeys = {(r["doc_id"], r["lang"]) for r in src_rows}
            hold = live.withColumn("_k", kstruct).where(
                F.col("doc_id").isin(upd_ids)
            )
            expected_files = {
                os.path.normpath(r["__f"])
                for r in hold.collect()
                if (r["doc_id"], r["lang"]) in skeys
            }
        else:
            expected_files = {
                os.path.normpath(r["__f"])
                for r in live.where(F.col("doc_id").isin(upd_ids))
                .select("__f")
                .distinct()
                .collect()
            }
        v = SNAP.merge_into(spark, t, src, keys)
        m = SNAP._load_manifest(t, v)
        assert m["rewrote"] == len(expected_files), (
            f"trial {trial}: rewrote {m['rewrote']} != "
            f"{len(expected_files)} ground-truth affected files"
        )
        for r in src_rows:
            k = (r["doc_id"], r["lang"]) if composite else r["doc_id"]
            model[k] = r["n_chars"]
        got = {
            (r["doc_id"], r["lang"]) if composite else r["doc_id"]: r[
                "n_chars"
            ]
            for r in SNAP.read_version(spark, t).collect()
        }
        assert got == model, f"trial {trial}: table != model"


def test_probe_byte_gate(spark):
    """_probe_worthwhile: file-count floor, byte floor, and the
    unknown-size-counts-as-big rule (round-11 gate — perf heuristic
    only, both answers correct)."""
    fm = {f"data/f{i}": {"rows": 10, "bytes": 1_000} for i in range(10)}
    small = {"files": list(fm), "file_meta": fm}
    assert not SNAP._probe_worthwhile(small), "KB-scale table must scan"
    assert not SNAP._probe_worthwhile(
        {"files": list(fm)[:4], "file_meta": fm}
    ), "file-count floor"
    big = {
        "files": list(fm),
        "file_meta": {
            r: {"rows": 10, "bytes": 50 << 20} for r in fm
        },
    }
    assert SNAP._probe_worthwhile(big), "GB-scale table must probe"
    unknown = {"files": list(fm), "file_meta": {}}
    assert SNAP._probe_worthwhile(unknown), "unknown sizes count as big"
