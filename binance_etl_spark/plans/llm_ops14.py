"""Distributed BPE vocabulary induction — the trainer whose inner loop
`text_bpe_pair_counts` (llm_ops5.py) benchmarks, completed into the
full Sennrich-style algorithm: learn N merges from the corpus, then
segment the corpus with the learned vocabulary.

Algorithm (classic word-level BPE):
1. ONE corpus-sized shuffle: whitespace words -> (word, freq). Every
   later step runs on the distinct-word frequency table, which Zipf
   compresses ~1000x below the corpus (the trick that makes BPE
   trainable at 100 TB: the tape is touched once).
2. Each word becomes its character sequence + an end-of-word marker.
3. N rounds: weighted adjacent-pair count (map-side combinable agg on
   the word table) -> argmax pair with a deterministic (count desc,
   pair asc) tie-break via TakeOrderedAndProject (a 1-row collect) ->
   greedy left-to-right merge applied with a JVM-side higher-order
   aggregate fold (no Python UDF; narrow map, no shuffle).
4. Output: the segmented corpus vocabulary — every surviving symbol
   with its weighted corpus count and the merge rank that created it
   (null for base characters), i.e. the learned tokenizer state
   applied end-to-end.

Scale notes: per round = one map-side-combinable aggregation over the
word table + a bounded 1-row collect; merge application is a narrow
projection. The word table is localCheckpoint'd each round (like the
k-means Lloyd loop, operators/kmeans.py) so round k never replays
rounds 1..k-1's interpreted HOF lambdas from the parquet scan. No
oracle: the merge loop is iterative/data-dependent (the driver runs
its rows-only check); exactness is pinned by a pure-Python textbook
implementation compared merge-for-merge and count-for-count in
tests/test_bpe_learn.py.

Reference provenance: the reference repo has no tokenizer; this is
LLM-pipeline surface (SURVEY.md §2.12/§2.16) following Sennrich et
al. 2016 (ACL) / the GPT-2 BPE formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

_EOW = "</w>"
N_MERGES = 16


def _word_seqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    chars = F.filter(F.split(F.col("w"), ""), lambda c: c != "")
    return wf.select(
        F.concat(chars, F.array(F.lit(_EOW))).alias("seq"), "freq"
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    # Adjacent pairs via a zip of the two shifted slices; slice handles
    # the length-1 edge (empty result) without sequence()'s descending
    # pitfall. seq is bound once per row — cheap under interpreted HOFs.
    s = F.col("seq")
    pairs = F.arrays_zip(
        F.slice(s, 1, F.size(s) - 1).alias("a"),
        F.slice(s, 2, F.size(s) - 1).alias("b"),
    )
    return (
        seqs.select("freq", F.explode(pairs).alias("p"))
        .select("freq", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("n"))
    )


def _apply_merge(seqs: DataFrame, a: str, b: str) -> DataFrame:
    # Greedy left-to-right merge of adjacent (a, b) -> a||b, as a pure
    # JVM fold: a freshly merged symbol never re-merges with the next
    # element in the same round (textbook BPE semantics — the fold's
    # accumulator tail is the merged symbol, which can't equal `a`).
    s = F.col("seq")
    merged = F.aggregate(
        F.slice(s, 2, F.size(s) - 1),
        F.array(F.element_at(s, 1)),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return seqs.select(merged.alias("seq"), "freq")


def bpe_learn(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn `n_merges` BPE merges; return (merge table, final word
    seqs). Merge table rows: (rank, left, right, pair weight)."""
    seqs = _word_seqs(spark, sf_dir).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(seqs)
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((rank, a, b, int(n)))
        # LAZY checkpoint (round-11): the next round's pair-count
        # collect computes the merged seqs anyway and persists the
        # checkpoint blocks as a side effect — one Spark action per
        # round instead of two (collect + eager materialization),
        # while round k's plan still never replays rounds 1..k-1's
        # interpreted HOF folds (the blocks are stored on first use).
        seqs = _apply_merge(seqs, a, b).localCheckpoint(eager=False)
    return merges, seqs


@register(
    "text_bpe_learn",
    doc="Full distributed BPE trainer: 16 merges learned from the "
    "documents corpus (deterministic count-desc/pair-asc tie-break), "
    "then the corpus segmented with the learned vocabulary. Output = "
    "one row per surviving symbol: its weighted corpus count and the "
    "merge rank that created it (null for base characters). Rows-only "
    "by design (iterative, data-dependent merge choices are not "
    "SQL-expressible); exact-equivalence vs a pure-Python textbook "
    "implementation is pinned in tests/test_bpe_learn.py. Per round: "
    "one map-side-combinable pair count over the Zipf-compressed "
    "word-frequency table + a 1-row TakeOrdered collect; merge "
    "application is a narrow JVM fold (no Python UDF, no shuffle).",
    tags=("text", "llm", "vocab", "iterative"),
)
def text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, seqs = bpe_learn(spark, sf_dir)
    # first-creation rank per symbol: two merges CAN produce the same
    # string (("a","bc") and ("ab","c") -> "abc"); keeping only the
    # earliest keeps the join 1:1 with the vocab.
    created: dict[str, int] = {}
    for r, a, b, _ in merges:
        created.setdefault(a + b, r)
    merge_rows = list(created.items()) or [("", -1)]
    ranks = spark.createDataFrame(
        merge_rows, "symbol string, created_rank int"
    ).where(F.col("created_rank") >= 0)
    vocab = (
        seqs.select(F.explode("seq").alias("symbol"), "freq")
        .groupBy("symbol")
        .agg(F.sum("freq").alias("n_tokens"))
    )
    return (
        vocab.join(F.broadcast(ranks), "symbol", "left")
        .select("symbol", "n_tokens", "created_rank")
        .orderBy("symbol")
    )
