"""Incremental MinHash-LSH dedup index (plans/dedup_index.py).

The parity sweep exact-value-checks dedup_index_incremental against
its full-recompute DuckDB oracle; these tests pin the INCREMENTAL
facts the entry cannot show — refresh candidate generation touches
only delta-involving pairs, the batch_id replay token makes the apply
exactly-once, and a pure-insert refresh MERGE rewrites zero pairs
files (the composite (a_id, b_id) bloom probe at work).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_etl_spark.operators import snapshots as SNAP
from binance_etl_spark.plans.dedup_index import build_dedup_index


def _doc(i: int, text: str):
    return (i, text)


_BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
_NEAR = "quick brown fox jumps over the lazy dog near the river bank today"


def _docs_batch1(spark):
    # doc 1 ~ doc 2 (near-dup: first token dropped); docs 3-6 unrelated
    rows = [
        _doc(1, _BASE),
        _doc(2, _NEAR),
        _doc(3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        _doc(4, "one two three four five six seven eight nine ten eleven"),
        _doc(5, "red orange yellow green blue indigo violet colors of light"),
        _doc(6, "spark shuffles partitions across executors during wide joins"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _docs_batch2(spark):
    # doc 7 ~ doc 1/2 (another variant); doc 8 unrelated
    rows = [
        _doc(7, _BASE + " again"),
        _doc(8, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _served(spark, root):
    return sorted(
        (r.a_id, r.b_id, round(r.jacc, 12))
        for r in SNAP.read_version(spark, f"{root}/pairs").collect()
    )


def test_refresh_equals_full_recompute(spark, tmp_path):
    """Index-consistency: build+refresh == single-batch full build on
    the combined corpus, and refresh candidates stay O(delta)."""
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    b1, b2 = _docs_batch1(spark), _docs_batch2(spark)

    ev1 = build_dedup_index(b1, inc)
    ev2 = build_dedup_index(b2, inc)
    build_dedup_index(b1.unionByName(b2), full)

    assert _served(spark, inc) == _served(spark, full)
    # ground truth: 1~2 from build; 7~1 from refresh. (2, 7) is a true
    # near-dup (jacc 11/13) that the 6-hash/3-band LSH deterministically
    # misses on BOTH paths — the contract is band-candidate equality
    # with the inline op, not all-pairs recall.
    got = [(a, b) for a, b, _ in _served(spark, inc)]
    assert got == [(1, 2), (1, 7)]
    assert ev1["n_delta_docs"] == 6
    assert ev2["n_delta_docs"] == 2
    # incrementality: refresh candidates involve ONLY delta docs — the
    # old-old candidate (1, 2) must NOT be regenerated
    assert ev2["n_new_pairs"] == 1
    assert 1 <= ev2["n_candidates"] <= 4  # delta-involving pairs only
    assert all(a in (7, 8) or b in (7, 8) for a, b in got[1:])


def test_replay_token_exactly_once(spark, tmp_path):
    """A refresh re-applied with the same batch_id is a no-op replay:
    no new versions, served pairs unchanged."""
    root = str(tmp_path / "t")
    build_dedup_index(_docs_batch1(spark), root, batch_id=0)
    build_dedup_index(_docs_batch2(spark), root, batch_id=1)
    before = _served(spark, root)
    versions = [
        SNAP.main_versions(f"{root}/{t}") for t in ("shingles", "bands", "pairs")
    ]
    ev = build_dedup_index(_docs_batch2(spark), root, batch_id=1)
    assert ev.get("replayed") is True
    assert _served(spark, root) == before
    assert [
        SNAP.main_versions(f"{root}/{t}") for t in ("shingles", "bands", "pairs")
    ] == versions


def test_pure_insert_merge_rewrites_zero_files(spark, tmp_path):
    """Refresh pairs are all NEW (a_id, b_id) keys — the composite
    bloom probe proves no existing pairs file holds them, so the MERGE
    carries every file and rewrites none."""
    root = str(tmp_path / "t")
    build_dedup_index(_docs_batch1(spark), root)
    build_dedup_index(_docs_batch2(spark), root)
    pairs_t = f"{root}/pairs"
    m = SNAP._load_manifest(pairs_t, SNAP.main_versions(pairs_t)[-1])
    assert m["mode"] == "merge"
    assert m["rewrote"] == 0
    assert m["carried"] >= 1
    # the build committed a composite bloom spec for the merge key,
    # and the merge inherited it (comma-joined spec, snapshots.py:469)
    assert "a_id,b_id" in m["bloom_cols"]


def test_streaming_foreach_batch_keeps_index_current(spark, tmp_path):
    """foreach_batch_dedup_index driven by a REAL file-source stream
    (one micro-batch per file): served pairs equal the single-batch
    full build, one pairs version per batch, and a manually replayed
    batch is a no-op."""
    import os

    from binance_etl_spark.plans.dedup_index import foreach_batch_dedup_index

    src = str(tmp_path / "src")
    _docs_batch1(spark).coalesce(1).write.parquet(os.path.join(src, "f0"))
    _docs_batch2(spark).coalesce(1).write.parquet(os.path.join(src, "f1"))
    root = str(tmp_path / "idx")
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_dedup_index(root))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(SNAP.main_versions(f"{root}/pairs")) == 2  # one per batch
    full = str(tmp_path / "full")
    build_dedup_index(_docs_batch1(spark).unionByName(_docs_batch2(spark)), full)
    assert _served(spark, root) == _served(spark, full)
    # checkpoint-recovery replay: re-deliver the last batch by id
    ev = build_dedup_index(_docs_batch2(spark), root, batch_id=1)
    assert ev.get("replayed") is True
    assert len(SNAP.main_versions(f"{root}/pairs")) == 2


def test_no_near_dups_in_delta_is_cheap_and_correct(spark, tmp_path):
    """A delta with no shared bands generates zero candidates and zero
    new pairs; the served table is untouched."""
    root = str(tmp_path / "t")
    build_dedup_index(_docs_batch1(spark), root)
    before = _served(spark, root)
    lone = spark.createDataFrame(
        [(9, "completely disjoint vocabulary about quantum entanglement physics")],
        "doc_id long, text string",
    )
    ev = build_dedup_index(lone, root)
    assert ev["n_candidates"] == 0
    assert ev["n_new_pairs"] == 0
    assert _served(spark, root) == before
    # doc 9's postings DID commit (future refreshes can match it)
    sh = SNAP.read_version(spark, f"{root}/shingles")
    assert sh.where(F.col("doc_id") == 9).count() == 1


# ---------------------------------------------------------------------------
# Incremental cluster index (build_cluster_index)
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a_id long, b_id long")


def _labels(spark, root):
    return {
        r.node: r.cluster_id
        for r in SNAP.read_version(spark, f"{root}/labels").collect()
    }


def test_cluster_refresh_touches_affected_clusters_only(spark, tmp_path):
    """A delta edge into cluster {1,2} relabels {1,2,3} and NOTHING
    else — cluster {10,11} carries untouched."""
    from binance_etl_spark.plans.dedup_index import build_cluster_index

    root = str(tmp_path / "t")
    build_cluster_index(_edges(spark, [(1, 2), (10, 11)]), root)
    assert _labels(spark, root) == {1: 1, 2: 1, 10: 10, 11: 10}
    ev = build_cluster_index(_edges(spark, [(2, 3)]), root)
    assert ev["n_affected_nodes"] == 2  # the {1,2} star only
    # contracted refresh (round-12): only rows whose label CHANGES are
    # written — node 3 joins cluster 1; members 1, 2 keep label 1 and
    # carry by manifest name
    assert ev["n_relabeled"] == 1  # just 3
    assert _labels(spark, root) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cluster_merge_two_stored_clusters(spark, tmp_path):
    """A bridge edge merges BOTH stored clusters: the min label wins
    across the union, proving the star edges preserve connectivity."""
    from binance_etl_spark.plans.dedup_index import build_cluster_index

    root = str(tmp_path / "t")
    build_cluster_index(_edges(spark, [(5, 6), (10, 11)]), root)
    ev = build_cluster_index(_edges(spark, [(6, 10)]), root)
    assert ev["n_affected_nodes"] == 4
    # only the LOSING cluster's members ({10, 11} -> label 5) rewrite;
    # the winning cluster {5, 6} already carries the group min
    assert ev["n_relabeled"] == 2
    assert _labels(spark, root) == {5: 5, 6: 5, 10: 5, 11: 5}


def test_cluster_new_nodes_only_delta_inserts(spark, tmp_path):
    """A delta among entirely NEW nodes touches zero stored clusters:
    pure-insert MERGE, old labels byte-identical, rewrote == 0 (the
    node bloom proves no stored file holds the new keys)."""
    from binance_etl_spark.plans.dedup_index import build_cluster_index

    root = str(tmp_path / "t")
    build_cluster_index(_edges(spark, [(1, 2)]), root)
    ev = build_cluster_index(_edges(spark, [(20, 21), (21, 22)]), root)
    assert ev["n_affected_nodes"] == 0
    assert _labels(spark, root) == {1: 1, 2: 1, 20: 20, 21: 20, 22: 20}
    labels_t = f"{root}/labels"
    m = SNAP._load_manifest(labels_t, SNAP.main_versions(labels_t)[-1])
    assert m["mode"] == "merge"
    assert m["rewrote"] == 0
    assert m["carried"] >= 1
    assert "node" in m["bloom_cols"]


def test_cluster_chain_equals_full_cc(spark, tmp_path):
    """Three successive single-edge refreshes growing a chain equal
    one full connected-components run over all edges."""
    from binance_etl_spark.operators.dedup import connected_components
    from binance_etl_spark.plans.dedup_index import build_cluster_index

    batches = [[(1, 2)], [(2, 3)], [(3, 4), (40, 41)]]
    root = str(tmp_path / "t")
    for b in batches:
        build_cluster_index(_edges(spark, b), root)
    all_e = _edges(spark, [p for b in batches for p in b])
    full = {
        r.node: r.cluster_id
        for r in connected_components(all_e, src="a_id", dst="b_id").collect()
    }
    assert _labels(spark, root) == full == {1: 1, 2: 1, 3: 1, 4: 1, 40: 40, 41: 40}


def test_cluster_replay_token_exactly_once(spark, tmp_path):
    """A refresh re-applied with the same batch_id no-ops."""
    from binance_etl_spark.plans.dedup_index import build_cluster_index

    root = str(tmp_path / "t")
    build_cluster_index(_edges(spark, [(1, 2)]), root, batch_id=0)
    build_cluster_index(_edges(spark, [(2, 3)]), root, batch_id=1)
    before = _labels(spark, root)
    versions = SNAP.main_versions(f"{root}/labels")
    ev = build_cluster_index(_edges(spark, [(2, 3)]), root, batch_id=1)
    assert ev.get("replayed") is True
    assert _labels(spark, root) == before
    assert SNAP.main_versions(f"{root}/labels") == versions


def test_streaming_pipeline_pairs_to_clusters(spark, tmp_path):
    """foreach_batch_dedup_clusters: docs stream -> pairs refresh ->
    cluster-label refresh, exactly-once end-to-end. Served labels
    equal full CC over the served pairs table; a crash BETWEEN the
    pairs commit and the labels commit heals on redelivery; a second
    redelivery no-ops both tables."""
    import os

    from binance_etl_spark.operators.dedup import connected_components
    from binance_etl_spark.plans.dedup_index import (
        build_dedup_index,
        foreach_batch_dedup_clusters,
    )

    src = str(tmp_path / "src")
    _docs_batch1(spark).coalesce(1).write.parquet(os.path.join(src, "f0"))
    _docs_batch2(spark).coalesce(1).write.parquet(os.path.join(src, "f1"))
    root = str(tmp_path / "idx")
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(foreach_batch_dedup_clusters(root))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    pairs = SNAP.read_version(spark, f"{root}/pairs")
    full = {
        r.node: r.cluster_id
        for r in connected_components(pairs, src="a_id", dst="b_id").collect()
    }
    # ground truth: pairs (1,2) then (1,7) -> one cluster labeled 1
    assert full == {1: 1, 2: 1, 7: 1}
    assert _labels(spark, root) == full

    # crash-between simulation: a third batch commits its PAIRS only
    # (doc 9 is another variant of the 1/2/7 family)
    b3 = spark.createDataFrame(
        [(9, _BASE + " twice")], "doc_id long, text string"
    )
    ev = build_dedup_index(b3, root, batch_id=2)
    assert ev["n_new_pairs"] >= 1
    labels_before = _labels(spark, root)
    assert 9 not in labels_before  # labels commit "crashed"
    # redelivery of the composite heals: pairs replays (token), the
    # batch's edges are recovered from the pairs CDC, labels apply
    foreach_batch_dedup_clusters(root)(b3, 2)
    healed = _labels(spark, root)
    assert healed[9] == 1
    assert healed == connected_components(
        SNAP.read_version(spark, f"{root}/pairs"), src="a_id", dst="b_id"
    ).toPandas().set_index("node")["cluster_id"].to_dict()
    # second redelivery no-ops both tables
    pv = SNAP.main_versions(f"{root}/pairs")
    lv = SNAP.main_versions(f"{root}/labels")
    foreach_batch_dedup_clusters(root)(b3, 2)
    assert SNAP.main_versions(f"{root}/pairs") == pv
    assert SNAP.main_versions(f"{root}/labels") == lv
    assert _labels(spark, root) == healed


def test_cluster_randomized_batches_equal_full_cc(spark, tmp_path):
    """Seeded random edge batches (merges, growths, new clusters,
    repeats, the occasional empty batch) applied incrementally always
    equal one full CC over the union — the union-find analogue of the
    snapshot-log model fuzzer."""
    import random

    from binance_etl_spark.operators.dedup import connected_components
    from binance_etl_spark.plans.dedup_index import build_cluster_index

    for seed in (7, 11):
        rng = random.Random(seed)
        root = str(tmp_path / f"t{seed}")
        applied = []
        for _ in range(5):
            batch = [
                (rng.randrange(0, 60), rng.randrange(0, 60))
                for _ in range(rng.randrange(0, 8))
            ]
            batch = [(a, b) for a, b in batch if a != b]
            build_cluster_index(_edges(spark, batch or []), root)
            applied.extend(batch)
        if not applied:
            continue
        full = {
            r.node: r.cluster_id
            for r in connected_components(
                _edges(spark, applied), src="a_id", dst="b_id"
            ).collect()
        }
        assert _labels(spark, root) == full, f"seed {seed}"


def test_cluster_empty_and_duplicate_edge_batches(spark, tmp_path):
    """An empty delta and an already-known-edge delta both no-op the
    labels (affected relabels produce identical rows; merge keeps the
    values), never corrupt them."""
    from binance_etl_spark.plans.dedup_index import build_cluster_index

    root = str(tmp_path / "t")
    build_cluster_index(_edges(spark, [(1, 2), (3, 4)]), root)
    before = _labels(spark, root)
    build_cluster_index(_edges(spark, []), root)
    assert _labels(spark, root) == before
    ev = build_cluster_index(_edges(spark, [(1, 2)]), root)
    assert ev["n_affected_nodes"] == 2
    assert _labels(spark, root) == before


def test_first_batch_crash_between_bands_and_pairs_heals(spark, tmp_path):
    """Crash AFTER the bands commit but BEFORE the pairs commit on the
    FIRST batch: redelivery must re-take the build path (first-ness is
    judged on the pairs table, the batch's commit point) and complete
    the batch — not wedge on merge_into against an empty pairs table."""
    from binance_etl_spark.plans.dedup_index import foreach_batch_dedup_clusters

    root = str(tmp_path / "t")
    b1 = _docs_batch1(spark)
    # simulate the partial apply: commit shingles + bands only
    from binance_etl_spark.operators import dedup as D

    sh = b1.select("doc_id", D.shingles(F.col("text")).alias("sh")).localCheckpoint()
    sig = D.minhash_signature(sh, "doc_id", "sh")
    bands = D.lsh_bands(sig, "doc_id")
    SNAP.write_version(sh, f"{root}/shingles", batch_id=0)
    SNAP.write_version(bands, f"{root}/bands", batch_id=0)
    assert not SNAP.main_versions(f"{root}/pairs")
    # redelivery of the full composite heals: build path, token no-ops
    # on shingles/bands, pairs + labels commit
    foreach_batch_dedup_clusters(root)(b1, 0)
    assert _served(spark, root) == [(1, 2, round(12 / 14, 12))] or [
        (a, b) for a, b, _ in _served(spark, root)
    ] == [(1, 2)]
    assert len(SNAP.main_versions(f"{root}/shingles")) == 1  # no double-append
    assert _labels(spark, root) == {1: 1, 2: 1}


def test_crash_at_every_subcommit_boundary_heals(spark, tmp_path):
    """Exactly-once artillery for the 4-table composite (shingles ->
    bands -> pairs -> labels): for every crash point and for both a
    FIRST and a LATER batch, simulate the partial apply (commit the
    prefix with the batch's token), redeliver the composite, and
    assert the final pairs AND labels equal a clean two-batch run.
    Covers: crash after shingles (build path re-takes with token
    no-ops), after bands (later-batch redelivery sees its own bands
    in the stored side — extra self-candidates dedup away), after
    pairs (edges recovered from the pairs CDC), after labels (full
    no-op)."""
    from binance_etl_spark.operators import dedup as D
    from binance_etl_spark.plans.dedup_index import foreach_batch_dedup_clusters

    b = {0: _docs_batch1(spark), 1: _docs_batch2(spark)}

    def _partial_apply(root: str, batch_id: int, upto: int) -> None:
        # mirror build_dedup_index's commit sequence up to `upto`
        # sub-commits (1=shingles, 2=+bands; upto=3 "crashed before
        # labels" is driven via build_dedup_index in the loop below)
        docs = b[batch_id]
        sh = docs.select(
            "doc_id", D.shingles(F.col("text")).alias("sh")
        ).localCheckpoint()
        bands = D.lsh_bands(D.minhash_signature(sh, "doc_id", "sh"), "doc_id")
        if upto >= 1:
            SNAP.write_version(sh, f"{root}/shingles", batch_id=batch_id)
        if upto >= 2:
            SNAP.write_version(bands, f"{root}/bands", batch_id=batch_id)

    # clean twin
    clean = str(tmp_path / "clean")
    for i in (0, 1):
        foreach_batch_dedup_clusters(clean)(b[i], i)
    want_pairs = _served(spark, clean)
    want_labels = _labels(spark, clean)
    assert want_labels  # fixture sanity

    from binance_etl_spark.plans.dedup_index import build_dedup_index

    scenarios = [(0, 1), (0, 2), (1, 1), (1, 2), (1, 3)]
    for crash_batch, upto in scenarios:
        root = str(tmp_path / f"c{crash_batch}_{upto}")
        # healthy batches before the crash batch
        for i in range(crash_batch):
            foreach_batch_dedup_clusters(root)(b[i], i)
        if upto == 3:
            build_dedup_index(b[crash_batch], root, batch_id=crash_batch)
        else:
            _partial_apply(root, crash_batch, upto)
        # redeliver the crash batch, then any remaining batches
        for i in range(crash_batch, 2):
            foreach_batch_dedup_clusters(root)(b[i], i)
        assert _served(spark, root) == want_pairs, (crash_batch, upto)
        assert _labels(spark, root) == want_labels, (crash_batch, upto)
        # token discipline: exactly one committed version per batch on
        # shingles (no double-append through any crash point)
        assert len(SNAP.main_versions(f"{root}/shingles")) == 2, (
            crash_batch,
            upto,
        )


def test_concurrent_writer_race_detected_and_retry_heals(spark, tmp_path, monkeypatch):
    """Two appliers racing on one index root would each miss the
    cross-writer pairs (both generate candidates against the bands
    they read). The snapshot log serializes the commits, so the race
    is detectable: a bands version landing between our read and our
    commit raises. The failure is also the repair — redelivery reads
    the interloper's bands in its stored side, so the retry covers
    exactly the pairs the race lost."""
    import pytest

    root = str(tmp_path / "t")
    build_dedup_index(_docs_batch1(spark), root, batch_id=0)
    bands_t = f"{root}/bands"

    import binance_etl_spark.operators.snapshots as SNAP_mod

    real = SNAP_mod.write_version
    fired = {"done": False}

    def racy(df, table_dir, *a, **kw):
        if table_dir.endswith("/bands") and not fired["done"]:
            fired["done"] = True
            # the concurrent applier's commit, landing between our
            # bands read and our bands write: doc 9 is ANOTHER variant
            # of the 1/2 family, so the race genuinely loses 7~9
            interloper = SNAP_mod.read_version(spark, table_dir).where(
                F.col("doc_id") == 1
            ).withColumn("doc_id", F.lit(9).cast("long"))
            real(interloper, table_dir)
        return real(df, table_dir, *a, **kw)

    monkeypatch.setattr(SNAP_mod, "write_version", racy)
    with pytest.raises(RuntimeError, match="concurrent writers"):
        build_dedup_index(_docs_batch2(spark), root, batch_id=1)
    monkeypatch.setattr(SNAP_mod, "write_version", real)
    # redelivery heals: the interloper's bands are stored now, so the
    # delta-vs-stored join sees them; candidates include 7-vs-9
    ev = build_dedup_index(_docs_batch2(spark), root, batch_id=1)
    assert ev.get("replayed") is not True  # pairs never committed
    got = [(a, b) for a, b, _ in _served(spark, root)]
    assert (1, 2) in got and (1, 7) in got
    # the interloper doc shares doc 1's bands, so the healed retry
    # surfaced the cross-writer candidate; with no shingles row for 9
    # committed by the fake interloper, verification drops it — the
    # candidate-level coverage is what the guard protects
    assert ev["n_candidates"] >= 2


def test_cluster_concurrent_writer_detected_and_retry_heals(
    spark, tmp_path, monkeypatch
):
    """Same race, labels table: an interloper's merge between our
    labels read and our merge would be partially overwritten (lost
    relabels on shared affected nodes). Guard raises; redelivery
    recomputes the affected set from state including the interloper
    and converges to the true CC labels."""
    import pytest

    from binance_etl_spark.plans.dedup_index import build_cluster_index

    root = str(tmp_path / "t")
    build_cluster_index(_edges(spark, [(1, 2), (10, 11)]), root, batch_id=0)
    labels_t = f"{root}/labels"

    import binance_etl_spark.operators.snapshots as SNAP_mod

    real = SNAP_mod.merge_into
    fired = {"done": False}

    def racy(spark_, table_dir, source, keys, *a, **kw):
        if table_dir.endswith("/labels") and not fired["done"]:
            fired["done"] = True
            # concurrent applier merges edge (10, 12): cluster {10,11}
            # grows while WE are relabeling cluster {1,2} for (2, 3)
            interloper = spark.createDataFrame(
                [(12, 10)], "node long, cluster_id long"
            )
            real(spark, table_dir, interloper, ["node"])
        return real(spark_, table_dir, source, keys, *a, **kw)

    monkeypatch.setattr(SNAP_mod, "merge_into", racy)
    with pytest.raises(RuntimeError, match="concurrent writers"):
        build_cluster_index(_edges(spark, [(2, 3)]), root, batch_id=1)
    monkeypatch.setattr(SNAP_mod, "merge_into", real)
    # redelivery heals on state including the interloper's node 12
    build_cluster_index(_edges(spark, [(2, 3)]), root, batch_id=1)
    assert _labels(spark, root) == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10,
    }


def test_first_build_race_detected_and_retry_heals(spark, tmp_path, monkeypatch):
    """Two FIRST builders racing: the bands guard raises on the fresh
    commit (bands appends commute — nothing damaged), and the
    redelivery's candidate read-back covers the interloper's bands,
    so the healed pairs include the cross-builder near-dups."""
    import pytest

    from binance_etl_spark.operators import dedup as D

    root = str(tmp_path / "t")
    # the interloper's partial apply: doc 50 is a variant of doc 1/2,
    # its shingles + bands committed (its own pairs not yet)
    inter = spark.createDataFrame(
        [(50, _BASE + " anew")], "doc_id long, text string"
    )
    ish = inter.select("doc_id", D.shingles(F.col("text")).alias("sh"))
    ibands = D.lsh_bands(D.minhash_signature(ish, "doc_id", "sh"), "doc_id")

    import binance_etl_spark.operators.snapshots as SNAP_mod

    real = SNAP_mod.write_version
    fired = {"done": False}

    def racy(df, table_dir, *a, **kw):
        if table_dir.endswith("/bands") and not fired["done"]:
            fired["done"] = True
            real(ish, table_dir[: -len("/bands")] + "/shingles")
            real(ibands, table_dir)
        return real(df, table_dir, *a, **kw)

    monkeypatch.setattr(SNAP_mod, "write_version", racy)
    with pytest.raises(RuntimeError, match="concurrent writers"):
        build_dedup_index(_docs_batch1(spark), root, batch_id=0)
    monkeypatch.setattr(SNAP_mod, "write_version", real)
    assert not SNAP.main_versions(f"{root}/pairs")  # nothing damaged
    ev = build_dedup_index(_docs_batch1(spark), root, batch_id=0)
    assert ev.get("replayed") is not True
    got = [(a, b) for a, b, _ in _served(spark, root)]
    assert (1, 2) in got
    assert any(50 in p for p in got), got  # cross-builder pair healed


def test_cluster_precheck_race_heals_shared_cluster(spark, tmp_path, monkeypatch):
    """An interloper merging INTO a cluster we are also relabeling,
    caught by the PRE-commit check (nothing of ours committed):
    redelivery recomputes the affected set from state including the
    interloper, so the shared cluster ends fully merged."""
    import pytest

    from binance_etl_spark.plans.dedup_index import build_cluster_index

    root = str(tmp_path / "t")
    build_cluster_index(_edges(spark, [(1, 2), (10, 11)]), root, batch_id=0)
    labels_t = f"{root}/labels"

    import binance_etl_spark.operators.dedup as DED

    real_cc = DED.connected_components
    fired = {"done": False}

    def racy_cc(*a, **kw):
        if not fired["done"]:
            fired["done"] = True
            # the interloper's refresh lands while we are computing:
            # its edge (2, 20) joined node 20 into cluster 1
            from binance_etl_spark.operators import snapshots as SNAP_

            SNAP_.merge_into(
                spark,
                labels_t,
                spark.createDataFrame([(20, 1)], "node long, cluster_id long"),
                ["node"],
            )
        return real_cc(*a, **kw)

    monkeypatch.setattr(DED, "connected_components", racy_cc)
    with pytest.raises(RuntimeError, match="redeliver the batch"):
        build_cluster_index(_edges(spark, [(2, 3)]), root, batch_id=1)
    monkeypatch.setattr(DED, "connected_components", real_cc)
    # nothing of ours committed: the batch token is absent
    assert SNAP._find_batch_commit(labels_t, 1) is None
    build_cluster_index(_edges(spark, [(2, 3)]), root, batch_id=1)
    assert _labels(spark, root) == {
        1: 1, 2: 1, 3: 1, 20: 1, 10: 10, 11: 10,
    }


def test_index_tables_carry_pk_enforcement(spark, tmp_path):
    """The first builds commit unique_keys on every read-modify-write
    index table — the concurrent-first-build backstop."""
    from binance_etl_spark.plans.dedup_index import build_cluster_index
    from binance_etl_spark.plans.spans_index import build_spans_index

    root = str(tmp_path / "t")
    build_dedup_index(_docs_batch1(spark), root)
    build_cluster_index(_edges(spark, [(1, 2)]), root)
    build_spans_index(
        spark.createDataFrame(
            [(1, "a b c d e f g h")], "doc_id bigint, text string"
        ),
        root,
    )
    for table, keys in (
        ("pairs", ["a_id", "b_id"]),
        ("labels", ["node"]),
        ("counts", ["gram"]),
    ):
        t = f"{root}/{table}"
        m = SNAP._load_manifest(t, SNAP.main_versions(t)[-1])
        assert m["unique_keys"] == keys, (table, m.get("unique_keys"))


def test_composite_recovery_survives_vacuumed_pairs_version(spark, tmp_path):
    """Crash between the pairs commit and the labels commit, then
    retention maintenance (compact + vacuum) expires the batch's
    pairs version during the outage: the O(delta) CDC recovery is
    gone, so the redelivery re-offers the ENTIRE current pairs table
    — the stars-preserve-connectivity merge converges to exactly the
    full-CC labels, exactly-once."""
    from binance_etl_spark.operators.dedup import connected_components
    from binance_etl_spark.plans.dedup_index import foreach_batch_dedup_clusters

    root = str(tmp_path / "t")
    foreach_batch_dedup_clusters(root)(_docs_batch1(spark), 0)
    # crash: batch 1 commits pairs only
    build_dedup_index(_docs_batch2(spark), root, batch_id=1)
    pairs_t = f"{root}/pairs"
    before_labels = _labels(spark, root)
    assert 7 not in before_labels
    # outage maintenance: compact advances the head, vacuum expires
    # the batch-1 merge version's manifest
    SNAP.compact(spark, pairs_t)
    SNAP.vacuum(pairs_t, keep_last=1, retain_seconds=0.0)
    assert len(SNAP.main_versions(pairs_t)) == 1
    # redelivery: CDC recovery impossible -> full re-offer heals
    foreach_batch_dedup_clusters(root)(_docs_batch2(spark), 1)
    want = {
        r.node: r.cluster_id
        for r in connected_components(
            SNAP.read_version(spark, pairs_t), src="a_id", dst="b_id"
        ).collect()
    }
    assert _labels(spark, root) == want
    assert _labels(spark, root)[7] == 1
    # and the batch token committed: a second redelivery no-ops
    lv = SNAP.main_versions(f"{root}/labels")
    foreach_batch_dedup_clusters(root)(_docs_batch2(spark), 1)
    assert SNAP.main_versions(f"{root}/labels") == lv
