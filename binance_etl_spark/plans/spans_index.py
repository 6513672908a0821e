"""Incremental duplicated-substring spans over the snapshot log —
text_substring_spans maintained through CDC appends the way
plans/text_index.py maintains the inverted index (r10 verdict
optional op B).

The inline op (plans/analytics7.py::text_substring_spans) re-extracts
every document's k-grams per run. Under a growing corpus that is
O(corpus) tokenize per refresh; the incremental form pays O(delta +
affected) instead:

- POSTINGS table: (doc_id, pos, gram) rows, appended per batch —
  gram extraction is paid once per document ever;
- COUNTS table: (gram, nd) distinct-doc counts maintained by MERGE
  — the refresh reads old counts for the DELTA's grams only
  (key-projected semi-join) and upserts nd_old + nd_delta
  (deliberately NO bloom index: measured cost/benefit in
  build_spans_index);
- SPANS table: the per-doc results, maintained by MERGE over ONLY
  the AFFECTED docs. The delta-maintenance insight: appending docs
  can only GROW a gram's nd, so an existing doc's spans change iff
  it holds a gram whose duplicated-status FLIPPED (nd crossed 2) in
  this batch. affected = (docs holding flipped grams) + (delta
  docs); everything else carries by manifest name, zero I/O.

Consistency statement (the oracle): the served spans table after
build + refresh equals the inline full-corpus recompute EXACTLY —
same WITH-chain oracle as text_substring_spans.

100 TB shape: per refresh, gram extraction is O(delta tokens); the
counts lookup and MERGE are key-joins (percent-scale deltas rewrite
most counts files, so the MERGE full-scan is the right plan; narrow
deltas can re-enable gram blooms — see build_spans_index);
the only full-width reads are two column-pruned scans of the postings
table (find holders of flipped grams; re-read affected docs'
positions) — both shuffle O(matching postings) after the semi-joins,
and a gram-bucketed layout would file-prune them too. Span windows
run per-doc over duplicated positions of AFFECTED docs only.

Reference parity note: the reference ETL (anselumana/binance-etl,
~539 LoC) has no index structures; north-star extension per
SURVEY.md §2.21.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.operators.lazydict import LazyDict
from binance_etl_spark.plans.llm_ops10 import _K, _SQL_GRAMS, _gram_stream
from binance_etl_spark.plans.registry import register


def _spans_from_positions(dpos: DataFrame) -> DataFrame:
    """Gaps-and-islands merge of duplicated gram START positions into
    maximal spans — the shared core of the inline op and the
    incremental recompute (identical arithmetic, so serve == inline)."""
    w = W.partitionBy("doc_id").orderBy("pos")
    flagged = dpos.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos") - F.coalesce(F.lag("pos").over(w), F.lit(-10 * _K))
            > _K - 1,
            1,
        )
        .otherwise(0)
        .alias("new_span"),
    )
    spans = flagged.select(
        "doc_id",
        "pos",
        F.sum("new_span")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("span_no"),
    )
    agg = spans.groupBy("doc_id", "span_no").agg(
        (F.max("pos") - F.min("pos") + _K).alias("covered")
    )
    return agg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("covered").cast("bigint").alias("dup_tokens"),
        F.max("covered").cast("bigint").alias("longest_span"),
    )


def build_spans_index(
    docs: DataFrame, root: str, batch_id: int | None = None
) -> dict:
    """Apply one batch of (doc_id, text) docs to the spans index at
    `root` (three snapshot tables: postings/, counts/, spans/). First
    call builds; later calls refresh incrementally. Returns evidence:
    {n_delta_docs, n_flipped_grams, n_affected_docs}."""
    from binance_etl_spark.operators import snapshots as SNAP

    spark = docs.sparkSession
    postings_t = f"{root}/postings"
    counts_t = f"{root}/counts"
    spans_t = f"{root}/spans"
    # (doc_id, pos, gram) of the DELTA only — checkpointed: three
    # downstream consumers (postings write, counts agg, dup/holder
    # joins) would each re-run the HOF gram extraction otherwise.
    # Lazy (round-12): the first consumer's job materializes the
    # blocks; the eager form was one extra dedicated action per batch.
    g = _gram_stream(docs).localCheckpoint(eager=False)
    delta_docs = docs.select("doc_id").distinct()
    # deferred evidence count (operators/lazydict.py): its own Spark
    # action, paid only by callers that read it
    n_delta = delta_docs.count
    dnd = g.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("nd_delta")
    )

    # first-ness is judged on the SPANS table — the batch's commit
    # point (last sub-commit of the apply). Judging on postings would
    # wedge a first batch that crashed mid-apply: redelivery would
    # take the refresh path against a counts table that may not even
    # exist yet. With spans as the judge, that redelivery re-takes the
    # build path, where the postings/counts writes no-op on their
    # batch tokens (the dedup-index first-ness rule, dedup_index.py).
    first = not SNAP.main_versions(spans_t)
    if first:
        SNAP.write_version(g, postings_t, batch_id=batch_id)
        counts = dnd.select("gram", F.col("nd_delta").alias("nd"))
        # MEASURED: no bloom index on the counts table. Building one
        # costs a ~4.5s executor md5 pass over every distinct gram at
        # sf0.1 AND re-runs on every MERGE's new files, while the
        # probe prunes nothing for this table's shape — md5-scattered
        # string keys defeat the zone stage, and a percent-scale delta
        # carries >>10^3 keys, where accumulated per-key FPR reads
        # every file MAYBE (see select_files_keys). A deployment with
        # NARROW deltas (<=1024 grams) should pass bloom_cols=["gram"]
        # here and get the driver-path prune back.
        # unique_keys is the concurrent-first-build guard: builders
        # with DISJOINT gram sets have no cross-corpus duplication and
        # both land; an OVERLAPPING gram — exactly the cross-builder
        # duplication the split nd counts would miss — refuses the
        # later append, and its redelivery heals through the refresh
        # path (counts MERGE against the winner's table).
        # source_unique: counts is a groupBy("gram") output — the
        # in-batch dup scan of the PK gate is structurally redundant
        SNAP.write_version(
            counts,
            counts_t,
            batch_id=batch_id,
            unique_keys=["gram"],
            source_unique=True,
        )
        dup = g.join(
            SNAP.read_version(spark, counts_t).where(F.col("nd") >= 2),
            "gram",
            "left_semi",
        ).select("doc_id", "pos")
        SNAP.write_version(
            _spans_from_positions(dup), spans_t, batch_id=batch_id
        )
        return LazyDict(
            {"n_delta_docs": n_delta, "n_affected_docs": n_delta},
            n_flipped_grams=-1,
        )

    # exactly-once replay token: if this batch already committed to
    # the spans table (the LAST commit of the apply), the whole apply
    # ran — skip (postings/counts carry their own tokens too)
    if batch_id is not None and SNAP._find_batch_commit(
        spans_t, batch_id
    ) is not None:
        return LazyDict({"n_delta_docs": n_delta}, replayed=True)

    # 1. old counts for the DELTA's grams only (key-projected lookup).
    # The PRE-BATCH counts state is load-bearing: a redelivery after a
    # crash between the counts merge and the spans merge finds this
    # batch's nd increments already applied — reading them as-is would
    # double the merged nd AND see no threshold flips, silently losing
    # the affected docs' spans forever. If our batch token is already
    # on the counts table, REWIND ALGEBRAICALLY: under the
    # single-writer contract nothing else touched these grams since
    # our merge, so pre-batch nd = current nd - our delta. (An
    # algebraic rewind instead of reading the predecessor VERSION
    # keeps redelivery working even after vacuum expired it.)
    v0 = SNAP.main_versions(counts_t)[-1]
    cw = (
        SNAP._find_batch_commit(counts_t, batch_id)
        if batch_id is not None
        else None
    )
    cur_hit = SNAP.read_version(spark, counts_t, version=v0).join(
        dnd.select("gram", "nd_delta"), "gram", "inner"
    )
    if cw is None:
        old_hit = cur_hit.select("gram", F.col("nd").alias("nd_old"))
    else:
        old_hit = cur_hit.select(
            "gram", (F.col("nd") - F.col("nd_delta")).alias("nd_old")
        ).where(F.col("nd_old") > 0)
    # ONE materialization serves both consumers (round-11 job fold):
    # `flipped` and `new_counts` are projections of the same join —
    # checkpointing each separately ran the dnd ⋈ old-counts join
    # twice (two full passes; measured ~2.5s apiece at sf0.1). The
    # checkpoint carries nd_old so both derive by scan-only filters.
    merged_counts = (
        dnd.join(old_hit, "gram", "left")
        .select(
            "gram",
            (
                F.col("nd_delta") + F.coalesce(F.col("nd_old"), F.lit(0))
            ).alias("nd"),
            "nd_old",
        )
        # lazy (round-12): the postings write / counts merge's first
        # action materializes the join; both later consumers (flipped,
        # new_counts) then scan the persisted blocks — the eager form
        # paid one dedicated job per refresh for the same effect
        .localCheckpoint(eager=False)
    )
    # appends only GROW nd -> an existing doc's spans change iff one
    # of its grams crossed the nd>=2 threshold THIS batch
    flipped = merged_counts.where(
        (F.col("nd") >= 2)
        & (F.coalesce(F.col("nd_old"), F.lit(0)) < 2)
    ).select("gram")

    # 2. commit postings append + counts MERGE. merge_into runs
    # several actions on its source (dup gate, key semi-join, the
    # write) — they all read the checkpoint above, so nothing
    # re-evaluates the delta gram extraction or the counts-table read
    SNAP.write_version(g, postings_t, batch_id=batch_id)
    new_counts = merged_counts.drop("nd_old")
    # PRE-commit serial-apply check: the merged nd values were derived
    # from counts@v0 — an interloper's merge since then would lose its
    # increments on shared grams (and the flip detection with them).
    # Raising HERE is self-healing: our counts merge hasn't run, so
    # the redelivery re-reads counts that include the interloper.
    SNAP.assert_serial_apply(counts_t, v0, what="spans-index counts refresh")
    v1 = SNAP.merge_into(
        spark,
        counts_t,
        new_counts,
        ["gram"],
        batch_id=batch_id,
        source_unique=True,  # merged_counts groups by gram
    )
    # POST-commit backstop for a racer inside the check-to-commit
    # window: our merge may already have overwritten its increments,
    # and the algebraic redelivery rewind would reproduce the loss —
    # report possible corruption honestly (rebuild = re-count from the
    # postings table) instead of promising a repair.
    SNAP.assert_serial_apply(
        counts_t, v0, v1, "spans-index counts refresh", healable=False
    )

    # 3. affected docs = holders of flipped grams (stored postings,
    # column-pruned semi-join) + the delta docs. NO checkpoint here
    # (round-12): the only execution consumer is the new_spans subtree
    # right below, which checkpoints ONCE for the spans merge — an
    # eager checkpoint of `affected` was a whole extra materialization
    # action per refresh for a frame computed exactly once anyway (the
    # lazy n_affected evidence recomputes on access, tests-only cost).
    post = SNAP.read_version(spark, postings_t)
    holders = (
        post.join(flipped, "gram", "left_semi").select("doc_id").distinct()
    )
    affected = holders.unionByName(delta_docs).distinct()

    # 4. recompute spans for affected docs only, against the UPDATED
    # full-corpus counts, and MERGE (unaffected docs carry by name).
    # Lazy checkpoint (round-12, the r11 graph-loop pattern): the
    # spans merge's first action materializes the blocks — an eager
    # checkpoint was one extra dedicated job per refresh.
    aff_post = post.join(affected, "doc_id", "left_semi")
    dup = aff_post.join(
        SNAP.read_version(spark, counts_t).where(F.col("nd") >= 2),
        "gram",
        "left_semi",
    ).select("doc_id", "pos")
    new_spans = _spans_from_positions(dup).localCheckpoint(eager=False)
    # a recomputed doc may have ZERO spans (not possible on append —
    # spans never shrink — but merge semantics want exactly the docs
    # with spans): new_spans only contains span-bearing docs, and an
    # affected doc that HAD a row keeps gaining, so upsert suffices
    SNAP.merge_into(
        spark,
        spans_t,
        new_spans,
        ["doc_id"],
        batch_id=batch_id,
        source_unique=True,  # _spans_from_positions groups by doc_id
    )
    return LazyDict(
        {
            "n_delta_docs": n_delta,
            "n_flipped_grams": flipped.count,
            "n_affected_docs": affected.count,
        }
    )


def _spans_lifecycle_oracle() -> str:
    return f"""
    WITH {_SQL_GRAMS},
    dpos AS (
      SELECT g.doc_id, g.pos FROM g JOIN pg USING (gram) WHERE pg.nd >= 2
    ), flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos - COALESCE(LAG(pos) OVER (PARTITION BY doc_id
                  ORDER BY pos), -{10 * _K}) > {_K - 1}
                  THEN 1 ELSE 0 END AS new_span
      FROM dpos
    ), spans AS (
      SELECT doc_id, pos,
             SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_no
      FROM flagged
    ), agg AS (
      SELECT doc_id, span_no,
             MAX(pos) - MIN(pos) + {_K} AS covered
      FROM spans GROUP BY doc_id, span_no
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(covered) AS BIGINT) AS dup_tokens,
           CAST(MAX(covered) AS BIGINT) AS longest_span,
           CAST(2 AS INT) AS n_versions,
           (SELECT COUNT(*) FROM documents) AS n_docs
    FROM agg GROUP BY doc_id
    """


@register(
    "text_spans_incremental",
    oracle=_spans_lifecycle_oracle(),
    doc="Incremental duplicated-substring spans over the snapshot log: "
    "BUILD (gram postings + gram-count + per-doc span tables for the "
    "doc_id % 10 != 7 corpus; counts deliberately un-bloomed — "
    "measured trade in build_spans_index), REFRESH (the late % 10 == 7 "
    "slice: O(delta) gram extraction, counts MERGE, spans recomputed "
    "ONLY for docs holding a gram whose duplicated-status flipped "
    "this batch plus the delta docs — appends only grow nd, so "
    "nothing else can change), SERVE (read the spans table). The "
    "oracle is the inline text_substring_spans oracle over the full "
    "corpus — served must equal recomputed, the index-consistency "
    "statement. Incrementality evidence (affected << corpus on a "
    "crafted fixture) pinned in tests/test_round11_ops.py.",
    tags=("text", "llm", "dedup", "sink"),
)
def text_spans_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import snapshots as SNAP

    d = fanout(load(spark, sf_dir, "documents")).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="besk_spansidx_") + "/t"
    build_spans_index(d.where(F.col("doc_id") % 10 != 7), root)
    build_spans_index(d.where(F.col("doc_id") % 10 == 7), root)
    n_versions = len(SNAP.main_versions(f"{root}/spans"))
    n_docs = d.count()
    return SNAP.read_version(spark, f"{root}/spans").select(
        "doc_id",
        "n_spans",
        "dup_tokens",
        "longest_span",
        F.lit(n_versions).cast("int").alias("n_versions"),
        F.lit(n_docs).cast("long").alias("n_docs"),
    )
