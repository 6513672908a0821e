"""Sixth LLM-pipeline batch: benchmark decontamination and batched
multi-query similarity search.

- dedup_decontaminate: the train/eval n-gram overlap check every
  serious pretraining pipeline runs before training (eval answers
  leaking into the corpus inflate benchmarks). Eval set = a
  deterministic 1% slice of documents; the train side additionally
  carries injected near-verbatim leaks (first token dropped, ids
  offset by 1,000,000) so the check has known positives at every SF.
- sim_topk_batch: top-k neighbors for a BATCH of query vectors in one
  plan — the shape embedding-dedup and retrieval-eval jobs actually
  run (per-query single scans would re-read the corpus Q times).

Both stay within the engine determinism rules (md5 blocking keys,
floor-e12 vector arithmetic) so the DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.operators import similarity as S
from binance_etl_spark.plans.registry import register

_NGRAM = 5

_SQL_GRAM = " || ' ' || ".join(f"t[i+{j}]" for j in range(_NGRAM))
_SQL_SHINGLE5 = (
    f"list_distinct(list_transform(generate_series(1, len(t) - {_NGRAM - 1}), "
    f"i -> md5({_SQL_GRAM})))"
)


@register(
    "dedup_decontaminate",
    oracle=f"""
    WITH train AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id % 100 <> 7
      UNION ALL
      SELECT doc_id + 1000000, source, substr(text, instr(text, ' ') + 1)
      FROM documents WHERE doc_id % 100 = 7
    ), eval_set AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 100 = 7
    ), tsh AS (
      SELECT doc_id, source, UNNEST({_SQL_SHINGLE5}) AS g
      FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM train)
    ), esh AS (
      SELECT DISTINCT UNNEST({_SQL_SHINGLE5}) AS g
      FROM (SELECT string_split(text, ' ') AS t FROM eval_set)
    ), contaminated AS (
      SELECT DISTINCT t.doc_id FROM tsh t JOIN esh e ON t.g = e.g
    )
    SELECT tr.source,
           COUNT(DISTINCT tr.doc_id) AS n_train,
           COUNT(DISTINCT c.doc_id) AS n_contaminated,
           MIN(c.doc_id) AS min_contaminated_id
    FROM train tr LEFT JOIN contaminated c ON c.doc_id = tr.doc_id
    GROUP BY tr.source
    """,
    doc="Benchmark DECONTAMINATION: flag train docs sharing any "
    f"{_NGRAM}-token shingle with the eval slice (doc_id %% 100 = 7). "
    "Train side includes injected first-token-dropped leaks of every "
    "eval doc (ids +1e6) as known positives. Candidates come from an "
    "equi-join on md5(shingle) — O(docs x shingles) shuffle, the same "
    "banding shape as MinHash-LSH, never all-pairs; eval-side shingles "
    "are distinct'd (a benchmark suite is corpus-tiny, so at 100 TB "
    "that side broadcasts). Per-source counts + a witness id.",
    tags=("dedup", "llm", "decontamination"),
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.dedup import tokenize

    d = fanout(load(spark, sf_dir, "documents"))
    is_eval = F.col("doc_id") % 100 == 7
    train = d.where(~is_eval).select("doc_id", "source", "text").unionByName(
        d.where(is_eval).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "source",
            F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    eval_set = d.where(is_eval).select("doc_id", "text")

    def gram5(text_col):
        # bind-once token array (operators/dedup.py::shingles) + md5
        from binance_etl_spark.operators.dedup import shingles

        return F.transform(shingles(text_col, k=_NGRAM), lambda s: F.md5(s))

    tsh = train.select("doc_id", F.explode(gram5(F.col("text"))).alias("g"))
    esh = eval_set.select(F.explode(gram5(F.col("text"))).alias("g")).distinct()
    # doc_id is unique within `train` (original ids and +1e6 leak ids
    # are disjoint), so the flag join needs only the id.
    contaminated = (
        tsh.join(esh, "g").select(F.col("doc_id").alias("c_doc_id")).distinct()
    )
    joined = train.join(
        contaminated, train["doc_id"] == contaminated["c_doc_id"], "left"
    ).select("doc_id", "source", "c_doc_id")
    return joined.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_train"),
        F.countDistinct("c_doc_id").alias("n_contaminated"),
        F.min("c_doc_id").alias("min_contaminated_id"),
    )


_SQL_DOT_AB = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1000000000000)"
    " AS BIGINT))) AS BIGINT)"
)


@register(
    "sim_topk_batch",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_emb,
             {_SQL_DOT_AB.format(a="embedding", b="embedding")} AS q_n
      FROM embeddings WHERE vec_id < 8
    ), corpus AS (
      SELECT vec_id, embedding,
             {_SQL_DOT_AB.format(a="embedding", b="embedding")} AS v_n
      FROM embeddings WHERE vec_id >= 8
    ), scored AS (
      SELECT q.q_id, c.vec_id,
             CAST({_SQL_DOT_AB.format(a="c.embedding", b="q.q_emb")} AS DOUBLE)
               / sqrt(CAST(c.v_n AS DOUBLE) * CAST(q.q_n AS DOUBLE)) AS sim,
             ROW_NUMBER() OVER (PARTITION BY q.q_id
                                ORDER BY CAST({_SQL_DOT_AB.format(a="c.embedding", b="q.q_emb")} AS DOUBLE)
                                         / sqrt(CAST(c.v_n AS DOUBLE) * CAST(q.q_n AS DOUBLE)) DESC,
                                         c.vec_id) AS rn
      FROM corpus c CROSS JOIN q
    )
    SELECT q_id, vec_id, sim, CAST(rn AS INT) AS rank
    FROM scored WHERE rn <= 3
    """,
    doc="BATCHED similarity search: top-3 cosine neighbors for 8 query "
    "vectors in ONE corpus scan. The query batch broadcasts (bounded "
    "by design — it is the small side even when the corpus is 100 TB); "
    "per-query ranking is a window over (query, sim desc, vec_id "
    "tie-break). One scan + one shuffle of corpus x |Q| scored rows "
    "pre-pruned per partition by WindowGroupLimit; contrast with "
    "sim_topk_cosine's single-query TakeOrderedAndProject.",
    tags=("similarity", "llm"),
)
def sim_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    q = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        S.sq_norm_e12("embedding").alias("q_n"),
    )
    corpus = e.where(F.col("vec_id") >= 8).withColumn(
        "v_n", S.sq_norm_e12("embedding")
    )
    scored = corpus.join(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        S.cosine_from_e12(S.dot_e12("embedding", "q_emb"), F.col("v_n"), F.col("q_n")).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("q_id", "vec_id", "sim", "rank")
    )


@register(
    "text_vocab_topk",
    oracle="""
    WITH tok AS (
      SELECT UNNEST(string_split(text, ' ')) AS term FROM documents
    )
    SELECT term, COUNT(*) AS freq
    FROM tok GROUP BY term
    ORDER BY freq DESC, term
    LIMIT 50
    """,
    doc="Corpus vocabulary top-50 by exact term frequency — the "
    "tokenizer-training / vocabulary-coverage statistic. Explode -> "
    "map-side-combinable count -> TakeOrderedAndProject (per-partition "
    "top-k + merge, no global sort); term tie-break makes the cut "
    "deterministic. At 100 TB the exact count shuffle is O(distinct "
    "terms) after partial aggregation — vocabulary, not corpus, sized.",
    tags=("llm", "text", "topn"),
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    tok = d.select(F.explode(F.split("text", " ")).alias("term"))
    return (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "term")
        .limit(50)
    )


@register(
    "split_grouped_leakproof",
    oracle="""
    WITH assigned AS (
      SELECT doc_id, source,
             CASE WHEN instr('0123456789abcdef', substr(md5(source), 1, 1)) - 1 < 13
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
           MIN(doc_id) AS min_id
    FROM assigned GROUP BY split
    """,
    doc="GROUP-AWARE train/val split: the hash key is the SOURCE, not "
    "the row — every doc of a domain lands in the same split, so "
    "near-duplicate documents within one domain can never straddle the "
    "boundary (the leakage mode a row-hash split like split_train_val "
    "cannot prevent). Same deterministic md5-nibble assignment, "
    "reproducible at any scale; 13/16 nibbles -> train.",
    tags=("llm", "split"),
)
def split_grouped_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    nibble = F.expr("instr('0123456789abcdef', substr(md5(source), 1, 1)) - 1")
    assigned = d.select(
        "doc_id",
        "source",
        F.when(nibble < 13, "train").otherwise("val").alias("split"),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("doc_id").alias("min_id"),
    )


@register(
    "text_lm_unigram_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), vocab AS (
      SELECT tok, COUNT(*) AS n_tok FROM tok GROUP BY tok
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(v.n_tok) AS DOUBLE) / COUNT(*) AS avg_tok_freq,
           CAST(SUM(CASE WHEN v.n_tok <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS rare_ratio
    FROM tok t JOIN vocab v USING (tok)
    GROUP BY t.doc_id
    """,
    doc="Unigram language-model document scoring — the corpus-level "
    "quality signal LLM pipelines use beside per-doc heuristics "
    "(text_quality_score): a doc whose tokens are corpus-rare is "
    "either novel or noise, and the rare-token ratio separates the "
    "two regimes. Two map-side-combinable shuffles: token counts "
    "(vocab is zipf-small, so AQE broadcasts the join-back), then a "
    "per-doc aggregate. avg corpus frequency is an exact integer sum "
    "divided once as double — no log(), whose libm rounding differs "
    "across engines; frequency order equals log-prob order for "
    "ranking/filtering purposes.",
    tags=("text", "llm", "quality"),
)
def text_lm_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.dedup import tokenize

    d = fanout(load(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    joined = tok.join(vocab, "tok")
    n = F.count(F.lit(1))
    return joined.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        (F.sum("n_tok").cast("double") / n).alias("avg_tok_freq"),
        (
            F.sum(F.when(F.col("n_tok") <= 2, 1).otherwise(0)).cast("double") / n
        ).alias("rare_ratio"),
    )


@register(
    "text_bpe_pair_counts",
    oracle="""
    WITH pairs AS (
      SELECT UNNEST(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1])) AS pair
      FROM (SELECT string_split(text, ' ') AS t FROM documents)
    )
    SELECT pair, COUNT(*) AS n_pairs
    FROM pairs
    GROUP BY pair
    ORDER BY n_pairs DESC, pair
    LIMIT 50
    """,
    doc="BPE-style adjacent-pair counting — the inner loop of byte-pair/"
    "wordpiece vocabulary induction (find the most frequent adjacent "
    "symbol pair to merge). One explode of per-doc adjacent pairs, one "
    "map-side-combinable count, TakeOrderedAndProject for the top-50 "
    "with a pair tie-break. A full BPE trainer iterates this with a "
    "merge table; the heavy distributed step (the global pair count "
    "over the corpus) is exactly this plan each round.",
    tags=("text", "llm", "vocab"),
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.dedup import tokenize

    d = fanout(load(spark, sf_dir, "documents"))
    toks = tokenize(F.col("text"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    return (
        d.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "pair")
        .limit(50)
    )
