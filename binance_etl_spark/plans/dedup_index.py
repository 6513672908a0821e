"""Incremental MinHash-LSH near-dup index over the snapshot log —
dedup_minhash_lsh maintained through CDC appends the way
plans/spans_index.py maintains duplicated-substring spans and
plans/text_index.py maintains the inverted index.

The inline op (plans/llm_ops.py::dedup_minhash_lsh) re-shingles and
re-hashes the whole corpus per run. Under a growing corpus that is
O(corpus) per refresh; the incremental form pays O(delta + collisions):

- SHINGLES table: (doc_id, sh) distinct-shingle arrays, appended per
  batch — shingling is paid once per document ever. Verification
  reads it key-projected (semi-join on candidate ids only);
- BANDS table: (doc_id, band_no, band_val) LSH band rows, appended
  per batch — the index proper. Candidates for a refresh are
  (delta BANDS ⋈ stored BANDS) ∪ (delta self-join): appends only ADD
  documents, so every NEW near-dup pair involves >= 1 delta doc and
  old-old pairs are already in the pairs table — nothing else can
  change;
- PAIRS table: verified (a_id, b_id, jacc) rows, canonical
  a_id < b_id, maintained by MERGE on the COMPOSITE key (a_id, b_id)
  with a composite-key bloom sidecar (round-11
  `_bloom_value_expr` contract) — a refresh whose pairs are all new
  keys probes the blooms and rewrites ZERO files (pure insert), so
  the merge write cost is O(new pairs), never O(pairs table).

Consistency statement (the oracle): the served pairs table after
build + refresh equals the inline full-corpus self-join recompute
EXACTLY — same banding, same exact-Jaccard >= 0.5 verification.

100 TB shape: per refresh, shingle + signature extraction is O(delta
tokens); candidate generation is the banded equi-join (shuffle
O(delta bands + matching stored bands) — never all-pairs); exact
verification touches candidate rows only, via two key-projected
semi-joins into the stored shingles table (a doc_id bloom on that
table would file-prune those lookups for narrow deltas — the same
measured trade as the spans index's counts table, see
build_spans_index).

Reference parity note: the reference ETL (anselumana/binance-etl,
~539 LoC) has no index structures; north-star extension per
SURVEY.md §2.21.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.operators import dedup as D
from binance_etl_spark.operators.lazydict import LazyDict
from binance_etl_spark.plans.llm_ops import (
    CAP_JACCARD,
    _SQL_SHINGLES,
    _SQL_SIG,
    _variant_docs,
)
from binance_etl_spark.plans.registry import register

_JACC_MIN = 0.5


def _band_pairs(x: DataFrame, y: DataFrame) -> DataFrame:
    """Canonical (a_id < b_id) candidate ids from a banded equi-join.
    Passing x == y gives the self-join (each pair arrives in both
    orders; least/greatest + distinct canonicalizes)."""
    xa = x.select(F.col("doc_id").alias("x_id"), "band_no", "band_val")
    ya = y.select(F.col("doc_id").alias("y_id"), "band_no", "band_val")
    return (
        xa.join(ya, ["band_no", "band_val"])
        .where(F.col("x_id") != F.col("y_id"))
        .select(
            F.least("x_id", "y_id").alias("a_id"),
            F.greatest("x_id", "y_id").alias("b_id"),
        )
        .distinct()
    )


def _verified_pairs(cand_ids: DataFrame, all_sh: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of candidate id pairs against the
    shingles table — the shared core of build and refresh (identical
    arithmetic to the inline op, so serve == inline)."""
    a = all_sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = all_sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"))
    return (
        cand_ids.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id", "b_id", D.jaccard(F.col("a_sh"), F.col("b_sh")).alias("jacc")
        )
        .where(F.col("jacc") >= _JACC_MIN)
    )


def build_dedup_index(
    docs: DataFrame, root: str, batch_id: int | None = None
) -> dict:
    """Apply one batch of (doc_id, text) docs to the near-dup index at
    `root` (three snapshot tables: shingles/, bands/, pairs/). First
    call builds; later calls refresh incrementally. Returns evidence:
    {n_delta_docs, n_candidates, n_new_pairs}."""
    from binance_etl_spark.operators import snapshots as SNAP

    spark = docs.sparkSession
    shingles_t = f"{root}/shingles"
    bands_t = f"{root}/bands"
    pairs_t = f"{root}/pairs"

    # exactly-once replay token FIRST — before the shingle/minhash
    # pipeline: the pairs commit is the LAST action of the apply, so
    # its presence proves the whole batch ran, and a checkpoint-replay
    # pays one manifest lookup instead of the full O(batch) extraction
    if batch_id is not None and SNAP._find_batch_commit(
        pairs_t, batch_id
    ) is not None:
        return {"replayed": True}

    # delta shingles + bands — checkpointed: each feeds a table write
    # AND one-or-more joins below, and the HOF shingle pipeline must
    # not re-run per consumer
    sh = docs.select(
        "doc_id", D.shingles(F.col("text")).alias("sh")
    ).localCheckpoint(eager=False)
    sig = D.minhash_signature(sh, "doc_id", "sh")
    bands = D.lsh_bands(sig, "doc_id").localCheckpoint(eager=False)

    # first-ness is judged on the PAIRS table — the batch's commit
    # point (last sub-commit of every apply). Judging on bands wedges
    # a first batch that crashed between the bands and pairs commits:
    # redelivery would take the refresh path and merge_into refuses a
    # table with no committed snapshot. With pairs as the judge, that
    # redelivery re-takes the build path, where the shingles/bands
    # write_version calls no-op on their batch tokens and the pairs
    # commit completes the batch.
    first = not SNAP.main_versions(pairs_t)
    if first:
        SNAP.write_version(sh, shingles_t, batch_id=batch_id)
        bands_replay = batch_id is not None and SNAP._find_batch_commit(
            bands_t, batch_id
        ) is not None
        v1 = SNAP.write_version(bands, bands_t, batch_id=batch_id)
        if not bands_replay:
            # FRESH bands commit racing another first builder: raise
            # before the pairs write — bands appends commute, so
            # nothing is damaged and redelivery heals (it reads the
            # interloper's bands through the table read-back below)
            SNAP.assert_serial_apply(
                bands_t, -1, v1, "dedup-index first build"
            )
        # candidate partners come from the TABLE read-back, not the
        # in-memory delta: on a clean first build they are identical
        # (one version = our bands), and on a crash redelivery after
        # a raced build the read-back includes the interloper's bands
        # — so the retry covers exactly the cross-writer pairs the
        # race lost. Verification mirrors the choice.
        foreign = len(SNAP.main_versions(bands_t)) > 1
        ref_bands = SNAP.read_version(spark, bands_t) if foreign else bands
        ref_sh = SNAP.read_version(spark, shingles_t) if foreign else sh
        cand_ids = _band_pairs(bands, ref_bands).localCheckpoint(eager=False)
        # lazy checkpoint: the write below materializes it once, and a
        # downstream consumer (the cluster-label refresh) reuses the
        # cached rows instead of re-verifying
        pairs = _verified_pairs(cand_ids, ref_sh).localCheckpoint(eager=False)
        # composite (a_id, b_id) bloom sidecar: later MERGE refreshes
        # probe it and prove pure-insert batches rewrite zero files.
        # unique_keys is the concurrent-first-build backstop: if two
        # builders raced past the bands guard, overlapping pairs —
        # exactly the rows both computed — refuse the later append,
        # and its redelivery heals through the refresh-path MERGE.
        SNAP.write_version(
            pairs,
            pairs_t,
            batch_id=batch_id,
            bloom_cols=[("a_id", "b_id")],
            unique_keys=["a_id", "b_id"],
            # cand_ids is distinct and the shingle sides are unique
            # per doc_id, so pairs carries one row per (a_id, b_id)
            source_unique=True,
        )
        # evidence counters are deferred (operators/lazydict.py): each
        # is its own Spark action over an already-checkpointed frame —
        # tests that assert them still pay, the serve path doesn't
        return LazyDict(
            {"n_delta_docs": sh.count, "n_candidates": cand_ids.count},
            n_new_pairs=-1,
            pairs=pairs,
        )

    # candidates = delta-vs-stored ∪ delta-vs-delta (appends only add
    # docs, so every new pair involves a delta doc — old-old pairs are
    # already served)
    v0 = SNAP.main_versions(bands_t)[-1]
    old_bands = SNAP.read_version(spark, bands_t, version=v0)
    cand_ids = (
        _band_pairs(bands, old_bands)
        .unionByName(_band_pairs(bands, bands))
        .distinct()
        .localCheckpoint(eager=False)
    )

    # commit the delta postings, then verify against the FULL shingles
    # table (delta rows included) — two key-projected lookups
    SNAP.write_version(sh, shingles_t, batch_id=batch_id)
    v1 = SNAP.write_version(bands, bands_t, batch_id=batch_id)
    # single-writer guard: candidates were generated against bands@v0,
    # so a bands version landing in between belongs to a concurrent
    # applier whose docs never met this delta in any candidate join —
    # those cross-writer pairs would be silently missing forever. The
    # failure is the repair: a redelivery reads the interloper's bands
    # in its stored side (plus our own, whose extra self-candidates
    # dedup away), covering exactly the pairs the race lost.
    SNAP.assert_serial_apply(bands_t, v0, v1, "dedup-index refresh")
    new_pairs = _verified_pairs(
        cand_ids, SNAP.read_version(spark, shingles_t)
    ).localCheckpoint(eager=False)
    SNAP.merge_into(
        spark,
        pairs_t,
        new_pairs,
        ["a_id", "b_id"],
        batch_id=batch_id,
        source_unique=True,  # distinct cand_ids x unique-per-id shingles
    )
    return LazyDict(
        {
            "n_delta_docs": sh.count,
            "n_candidates": cand_ids.count,
            "n_new_pairs": new_pairs.count,
        },
        pairs=new_pairs,
    )


def build_cluster_index(
    pairs: DataFrame, root: str, batch_id: int | None = None
) -> dict:
    """Apply one batch of (a_id, b_id) near-dup pair edges to the
    cluster-labels table at `root` (one snapshot table: labels/ =
    (node, cluster_id), cluster_id = min member id). First call
    builds via full connected-components; later calls refresh
    incrementally: appends only ADD edges, so clusters can only
    MERGE — each stored cluster CONTRACTS to its cluster_id (= min
    member id), CC runs over the delta edges mapped to contracted
    ids (delta-sized input, not member-sized), and only members of
    LOSING clusters (group min dropped) plus brand-new nodes merge
    back; every other row — including the winning cluster's members
    — carries by manifest name, zero I/O. O(delta) per refresh — the
    union-find sibling of the spans index's flipped-gram rule.
    Returns evidence: {n_delta_edges, n_affected_nodes (members of
    every touched stored cluster), n_relabeled (rows written)}."""
    from binance_etl_spark.operators import snapshots as SNAP

    spark = pairs.sparkSession
    labels_t = f"{root}/labels"

    # replay token FIRST — before the edge checkpoint/count, a
    # checkpoint-replay pays one manifest lookup only
    if batch_id is not None and SNAP._find_batch_commit(
        labels_t, batch_id
    ) is not None:
        return {"replayed": True}

    e = pairs.select(
        F.col("a_id").cast("long").alias("a"),
        F.col("b_id").cast("long").alias("b"),
    ).localCheckpoint(eager=False)

    first = not SNAP.main_versions(labels_t)
    if first:
        labs = D.connected_components(e, src="a", dst="b")
        # node bloom + min/max stats: refresh MERGEs take the pruned
        # zone+bloom path, so a wide table rewrites only files holding
        # affected nodes — never O(labels). unique_keys is the
        # concurrent-first-build guard: two builders with DISJOINT
        # node sets are independent clusterings and both land; an
        # OVERLAPPING node — exactly the case whose cross-builder
        # connectivity would be lost — refuses the later append, and
        # its redelivery heals through the refresh path (which reads
        # the winner's labels).
        SNAP.write_version(
            labs, labels_t, batch_id=batch_id,
            stats_cols=["node"], bloom_cols=["node"],
            unique_keys=["node"],
            source_unique=True,  # CC labels are one row per node
        )
        return LazyDict(
            {"n_delta_edges": e.count, "n_relabeled": labs.count},
            n_affected_nodes=0,
        )

    v0 = SNAP.main_versions(labels_t)[-1]
    old = SNAP.read_version(spark, labels_t, version=v0)
    delta_nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    # CONTRACTED refresh (round-12, closing the r11 verdict's "second
    # CC" item): instead of running connected_components over every
    # MEMBER of every affected cluster (stars ∪ delta — O(affected
    # members) through an iterative op), contract each stored cluster
    # to its cluster_id and run CC over the DELTA EDGES alone, mapped
    # to contracted ids. Exactness: a stored cluster_id IS the min
    # member id of its cluster, and an unlabeled node is its own
    # (singleton) contraction, so the min over a merged GROUP of
    # contracted ids equals the min member id over the union of their
    # clusters — precisely what CC over the stars would converge to.
    # The CC input shrinks from affected-member-sized to delta-sized,
    # and the MERGE source shrinks to rows whose label actually
    # changes (losing clusters' members) plus brand-new nodes —
    # winning clusters' members no longer rewrite their files.
    nodemap = (
        old.join(delta_nodes, "node", "left_semi")
        .select("node", "cluster_id")
        .localCheckpoint(eager=False)
    )  # delta-sized: stored labels of delta endpoints only
    ce = (
        e.join(
            nodemap.select(F.col("node").alias("a"), F.col("cluster_id").alias("ca")),
            "a",
            "left",
        )
        .join(
            nodemap.select(F.col("node").alias("b"), F.col("cluster_id").alias("cb")),
            "b",
            "left",
        )
        .select(
            F.coalesce("ca", "a").alias("a"), F.coalesce("cb", "b").alias("b")
        )
    )
    # glabs: (contracted id -> merged-group min id). Domain = stored
    # cluster ids touched by a delta edge ∪ new node ids.
    glabs = D.connected_components(ce, src="a", dst="b")
    # losing contractions: groups whose min DROPPED — only their
    # members need relabeling (new-node ids in cmap match no stored
    # cluster_id and fall out of the join, as intended)
    cmap = glabs.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("cluster_id"), F.col("cluster_id").alias("_new")
    )
    changed = old.join(cmap, "cluster_id").select(
        "node", F.col("_new").alias("cluster_id")
    )
    new_rows = (
        delta_nodes.join(old, "node", "left_anti")
        .join(glabs.withColumnRenamed("cluster_id", "_new"), "node", "left")
        .select("node", F.coalesce("_new", F.col("node")).alias("cluster_id"))
    )
    new_labs = changed.unionByName(new_rows).localCheckpoint(eager=False)
    # lazy evidence twin of the pre-contraction affected set (members
    # of every touched stored cluster) — tests assert it, serve never
    # computes it
    affected = old.join(
        nodemap.select("cluster_id").distinct(), "cluster_id", "left_semi"
    )
    # PRE-commit serial-apply check: the relabels were derived from
    # labels@v0 — an interloper's merge since then would be partially
    # overwritten (lost relabels on shared affected nodes). Raising
    # HERE is self-healing: nothing of ours committed yet, and the
    # redelivery recomputes the affected set from state that includes
    # the interloper's labels.
    SNAP.assert_serial_apply(labels_t, v0, what="cluster-label refresh")
    v1 = SNAP.merge_into(
        spark,
        labels_t,
        new_labs,
        ["node"],
        batch_id=batch_id,
        source_unique=True,  # CC labels are one row per node
    )
    # POST-commit backstop for a racer landing inside the tiny
    # check-to-commit window: our merge may already have overwritten
    # its relabels, and the replay token would skip a redelivery — so
    # this reports possible corruption honestly (rebuild = full CC
    # over the pairs table) instead of promising a repair.
    SNAP.assert_serial_apply(
        labels_t, v0, v1, "cluster-label refresh", healable=False
    )
    return LazyDict(
        {
            "n_delta_edges": e.count,
            "n_affected_nodes": affected.count,
            "n_relabeled": new_labs.count,
        }
    )


def foreach_batch_dedup_index(root: str):
    """writeStream.foreachBatch body keeping the near-dup index CURRENT
    as documents arrive: each micro-batch is shingled/banded (O(batch),
    never O(corpus)), candidates are generated against the STORED band
    table, and new verified pairs MERGE in — exactly-once via the
    batch-id token (a checkpoint-replayed batch finds its id in the
    pairs table's committed manifests and no-ops; a partially-applied
    batch re-runs, with the per-table tokens making each sub-commit
    idempotent). The streaming sibling of
    streaming/dedup_stream.py::foreach_batch_minhash_dedup, but
    serving a PERSISTENT, time-travelable pairs table instead of a
    first-seen-wins accept set."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        build_dedup_index(batch_df, root, batch_id=batch_id)

    return apply


def foreach_batch_dedup_clusters(root: str):
    """foreachBatch body for the FULL streaming dedup pipeline:
    documents arrive -> near-dup pairs index refresh (O(batch)
    shingling, banded candidates vs stored bands) -> cluster-label
    refresh (affected-stars CC over the batch's new pair edges).
    Exactly-once END-TO-END via per-table batch tokens: a replay that
    finds the pairs commit recovers the batch's edges from the pairs
    table's own CDC (read_changes of that batch's version — O(delta)
    I/O) and re-offers them to the labels table, whose token then
    decides idempotently — so a crash BETWEEN the pairs commit and the
    labels commit heals on redelivery, and a fully-applied batch
    no-ops twice."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        from binance_etl_spark.operators import snapshots as SNAP

        spark = batch_df.sparkSession
        ev = build_dedup_index(batch_df, root, batch_id=batch_id)
        pairs = ev.get("pairs")
        if pairs is None:
            # pairs commit replayed — recover this batch's edges from
            # the pairs table CDC. Rewritten (updated-jacc) rows also
            # surface as inserts; they are existing edges, and re-
            # offering an existing edge cannot change any label.
            pairs_t = f"{root}/pairs"
            v = SNAP._find_batch_commit(pairs_t, batch_id)
            vs = SNAP.main_versions(pairs_t)
            try:
                i = vs.index(v)
                if i == 0:
                    pairs = SNAP.read_version(spark, pairs_t, version=v)
                else:
                    pairs = (
                        SNAP.read_changes(spark, pairs_t, vs[i - 1], v)
                        .where(F.col("change_type") == "insert")
                        .drop("change_type")
                    )
            except (ValueError, FileNotFoundError):
                # the batch's version (or its predecessor) was expired
                # by retention maintenance during the outage — the
                # O(delta) recovery is gone, but the UNIVERSAL repair
                # is not: re-offer the ENTIRE current pairs table as
                # the edge batch. build_cluster_index treats it as one
                # big delta (affected = every touched cluster; stars
                # preserve connectivity), so the merge converges to
                # exactly the full-CC labels, and the batch token
                # still commits exactly-once.
                pairs = SNAP.read_version(spark, pairs_t)
        build_cluster_index(
            pairs.select("a_id", "b_id"), root, batch_id=batch_id
        )

    return apply


def _dedup_index_oracle() -> str:
    sigs = ", ".join(
        f"{_SQL_SIG.format(sh='sh', i=i)} AS mh{i}" for i in range(1, 7)
    )
    bands = ", ".join(
        f"md5(concat(mh{2 * b + 1}, mh{2 * b + 2})) AS band{b}" for b in range(3)
    )
    band_joins = "\n        UNION ALL\n".join(
        f"""        SELECT x.id AS a_id, y.id AS b_id
        FROM cband x JOIN cband y
          ON x.band{b} = y.band{b} AND x.id < y.id"""
        for b in range(3)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id AS id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < {CAP_JACCARD}
      UNION ALL
      SELECT doc_id + 1000000 AS id,
             string_split(substr(text, instr(text, ' ') + 1), ' ') AS toks
      FROM documents WHERE doc_id < {CAP_JACCARD}
    ), c AS (
      SELECT id, {_SQL_SHINGLES} AS sh FROM corpus
    ), csig AS (
      SELECT id, sh, {sigs} FROM c
    ), cband AS (
      SELECT id, {bands} FROM csig
    ), cand AS (
      SELECT DISTINCT a_id, b_id FROM (
{band_joins}
      )
    ), verified AS (
      SELECT a_id, b_id,
             len(list_filter(ca.sh, x -> list_contains(cb.sh, x))) AS n_common,
             len(ca.sh) AS n_a, len(cb.sh) AS n_b
      FROM cand JOIN c ca ON ca.id = cand.a_id JOIN c cb ON cb.id = cand.b_id
    )
    SELECT a_id, b_id,
           CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jacc,
           CAST(2 AS INT) AS n_versions,
           (SELECT CAST(2 * COUNT(*) AS BIGINT) FROM documents
            WHERE doc_id < {CAP_JACCARD}) AS n_docs
    FROM verified
    WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= {_JACC_MIN}
    """


@register(
    "dedup_index_incremental",
    oracle=_dedup_index_oracle(),
    doc="Incremental MinHash-LSH near-dup index over the snapshot log: "
    "BUILD (shingles + LSH-band + verified-pairs tables for the "
    "original doc_id < 1000 corpus), REFRESH (the perturbed variants: "
    "O(delta) shingling, candidates = delta-bands vs stored-bands "
    "equi-join plus delta self-join — appends only add docs, so every "
    "new pair involves a delta doc and old-old pairs carry untouched), "
    "SERVE (read the pairs table). Pairs MERGE on the composite "
    "(a_id, b_id) key with a composite bloom sidecar — pure-insert "
    "refreshes probe it and rewrite zero files. The oracle is the "
    "inline full-corpus self-join MinHash-LSH recompute (band-join "
    "candidates, exact Jaccard >= 0.5) — served must equal recomputed, "
    "the index-consistency statement. Incrementality + replay-token "
    "evidence pinned in tests/test_dedup_index.py.",
    tags=("dedup", "lsh", "llm", "sink"),
)
def dedup_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import snapshots as SNAP

    originals = fanout(
        load(spark, sf_dir, "documents").where(F.col("doc_id") < CAP_JACCARD)
    ).select("doc_id", "text")
    variants = _variant_docs(spark, sf_dir, CAP_JACCARD).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="besk_dedupidx_") + "/t"
    build_dedup_index(originals, root)
    build_dedup_index(variants, root)
    n_versions = len(SNAP.main_versions(f"{root}/pairs"))
    n_docs = originals.count() + variants.count()
    return SNAP.read_version(spark, f"{root}/pairs").select(
        "a_id",
        "b_id",
        "jacc",
        F.lit(n_versions).cast("int").alias("n_versions"),
        F.lit(n_docs).cast("long").alias("n_docs"),
    )


def _cluster_index_oracle() -> str:
    from binance_etl_spark.plans.llm_ops3 import _SQL_CC_BODY

    return (
        _SQL_CC_BODY
        + """
    SELECT node, MIN(lbl) AS cluster_id, CAST(2 AS INT) AS n_versions
    FROM comp WHERE node IN (SELECT src FROM edges)
    GROUP BY node
    """
    )


@register(
    "dedup_cluster_index_incremental",
    oracle=_cluster_index_oracle(),
    doc="Incremental dedup-CLUSTER index: connected-component labels "
    "maintained through pair-edge appends instead of recomputed per "
    "run — the union-find closer of the index chain (inverted index, "
    "spans, near-dup pairs, now clusters). BUILD applies the a~b "
    "near-dup edges of the dedup_cluster_cc fixture (full CC, labels "
    "snapshot); REFRESH applies the b~c edge batch incrementally: "
    "appends only ADD edges, so clusters only MERGE, the affected set "
    "is exactly the stored clusters touched by a delta-edge node, and "
    "each affected cluster CONTRACTS to its cluster_id (= min member "
    "id) — CC over the contracted delta edges relabels the affected "
    "subgraph exactly (group min over contracted ids = min member id "
    "over the merged clusters) while every other cluster's label rows "
    "— and the winning cluster's members — carry by manifest name, "
    "zero I/O. SERVE "
    "reads the labels table. Oracle: the dedup_cluster_cc recursive-"
    "CTE recompute over ALL edges, restricted to edged nodes (the "
    "index learns nodes from edges; singletons have no pair rows). "
    "Affected-only evidence pinned in tests/test_dedup_index.py.",
    tags=("dedup", "iterative", "sink"),
)
def dedup_cluster_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.plans.llm_ops3 import cc_edge_batches

    e_ab, e_bc, _nodes = cc_edge_batches(spark, sf_dir)

    def as_pairs(e: DataFrame) -> DataFrame:
        return e.select(F.col("src").alias("a_id"), F.col("dst").alias("b_id"))

    root = tempfile.mkdtemp(prefix="besk_ccidx_") + "/t"
    build_cluster_index(as_pairs(e_ab), root)
    build_cluster_index(as_pairs(e_bc), root)
    n_versions = len(SNAP.main_versions(f"{root}/labels"))
    return SNAP.read_version(spark, f"{root}/labels").select(
        "node",
        "cluster_id",
        F.lit(n_versions).cast("int").alias("n_versions"),
    )


def _keep_list_oracle() -> str:
    from binance_etl_spark.plans.llm_ops3 import _SQL_CC_BODY

    return (
        _SQL_CC_BODY
        + """
    , clusters AS (SELECT node, MIN(lbl) AS cluster_id FROM comp GROUP BY node)
    SELECT node, cluster_id, CAST(node = cluster_id AS BOOLEAN) AS kept
    FROM clusters
    """
    )


@register(
    "dedup_cluster_keep_list",
    oracle=_keep_list_oracle(),
    doc="The dedup DECISION served from the incremental cluster "
    "index — the user-facing end of the chain (docs -> pairs index "
    "-> cluster labels -> keep list): every corpus doc with its "
    "cluster id and kept = (doc is its cluster's canonical, i.e. the "
    "min member id). Singletons have no pair rows, so they are "
    "absent from the labels table and kept by definition — the serve "
    "is one LEFT join of the corpus node list against the stored "
    "labels with coalesce(cluster_id, node), no recompute. Oracle: "
    "the recursive-CTE CC over all edges (comp seeds from ALL nodes, "
    "so singletons label themselves). 100 TB shape: the labels table "
    "is the only state read; the join broadcasts when the cluster "
    "population is sparse relative to the corpus.",
    tags=("dedup", "sink"),
)
def dedup_cluster_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.plans.llm_ops3 import cc_edge_batches

    e_ab, e_bc, nodes = cc_edge_batches(spark, sf_dir)

    def as_pairs(e: DataFrame) -> DataFrame:
        return e.select(F.col("src").alias("a_id"), F.col("dst").alias("b_id"))

    root = tempfile.mkdtemp(prefix="besk_cckeep_") + "/t"
    build_cluster_index(as_pairs(e_ab), root)
    build_cluster_index(as_pairs(e_bc), root)
    labs = SNAP.read_version(spark, f"{root}/labels")
    return nodes.join(labs, "node", "left").select(
        "node",
        F.coalesce(F.col("cluster_id"), F.col("node")).alias("cluster_id"),
        (F.coalesce(F.col("cluster_id"), F.col("node")) == F.col("node")).alias(
            "kept"
        ),
    )
