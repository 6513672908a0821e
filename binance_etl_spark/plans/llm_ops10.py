"""Tenth LLM-pipeline batch: substring-level dedup, semantic dedup,
perplexity-bucketed mixing, and model-based quality scoring.

- text_substring_dedup / text_substring_scrub: the Lee-et-al-style
  "Deduplicating Training Data" exact-substring pass — find k-token
  spans repeated ACROSS documents, then actually remove the covered
  tokens and reconstruct the cleaned corpus. This is the op document-
  level MinHash misses: boilerplate/licence blocks repeated inside
  otherwise-unique pages.
- dedup_semdedup: SemDeDup-style semantic dedup — restrict exact
  cosine scoring to WITHIN-CLUSTER pairs so the pair count is
  sum(cluster_size^2), never corpus^2; the cluster id plays the role
  of the k-means assignment (the assignment step itself is
  demonstrated by sim_kmeans_lloyd / emb_centroid_label).
- sample_perplexity_buckets: corpus-frequency ("unigram perplexity")
  decile bucketing with a deterministic per-bucket keep rule — the
  quality-aware mixture step between scoring and training.
- text_quality_classifier: fastText-shaped linear quality model over
  hashed token features — the model-based filter (e.g. a CCNet/
  fastText quality head) run as pure codegen'd expressions.
- text_bpe_train: the BPE merge LOOP (two unrolled rounds, exact
  greedy overlap resolution via run-parity windows).
- scan_file_provenance: parquet _metadata per-file audit.
- udf_arrow_grouped / udtf_dynamic_cols: the grouped-Arrow UDF and
  polymorphic (analyze()) UDTF corners of the extension surface.
- sink_snapshot_timetravel: manifest commit log with time travel
  (operators/snapshots.py).
- scan_warc_corpus: WARC crawl-archive round trip (sources/warc.py).
- curate_scrub_pipeline: the round-3 flagship composite — quality
  gate -> substring scrub over survivors -> per-source audit, ONE
  Catalyst plan.

Parity: all scores are integer fixed-point (e6) with truncating
integer division, identical in Spark (`div`) and DuckDB (`//`) —
verified to truncate toward zero for signed values in both engines;
md5 hex is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.operators import similarity as S
from binance_etl_spark.plans.registry import register

# --- text_substring_dedup -------------------------------------------

_K = 5  # tokens per gram (the dedup span unit)

# (doc_id, gram-md5) stream: one row per k-gram start position.  Docs
# in the fixture always have >= 10 tokens, but the guard keeps the
# expression total (sequence(1, n) with n < 1 would COUNT DOWN in
# Spark, unlike DuckDB's empty generate_series).
def _gram_stream(d: DataFrame) -> DataFrame:
    # Bind the token array once per row (outer 1-element transform) so
    # the per-position lambda never re-evaluates split(text) — see
    # operators/dedup.py::shingles for the measured 4x rationale.
    def over(toks):
        starts = F.when(
            F.size(toks) >= _K, F.sequence(F.lit(1), F.size(toks) - (_K - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, _K)))
        )

    grams = F.element_at(F.transform(F.array(F.split(F.col("text"), " ")), over), 1)
    return d.select("doc_id", F.posexplode(grams).alias("pos0", "gram")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "gram"
    )


_SQL_GRAMS = f"""
    g AS (
      SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+{_K - 1}], ' ')) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(generate_series(1, len(t) - {_K - 1})) AS u(i)
    ), pg AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram
    )"""


@register(
    "text_substring_dedup",
    oracle=f"""
    WITH {_SQL_GRAMS}
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             // COUNT(*) AS dup_ratio_e6
    FROM g JOIN pg USING (gram)
    GROUP BY g.doc_id
    """,
    doc="Exact-substring duplication detection (the Lee et al. "
    "'Deduplicating Training Data' pass, k-gram approximation of the "
    "suffix-array scan): every k=5-token span is hashed; a span is "
    "duplicated when it occurs in >= 2 DISTINCT documents; per doc we "
    "report the duplicated-span ratio. Two shuffles, both O(total "
    "tokens) and map-side combinable: gram -> distinct-doc count, then "
    "the gram-stream join-back + per-doc aggregate. Gram keys are md5 "
    "so the shuffle is hash-uniform except for genuinely repeated "
    "spans, which is exactly the skew AQE's skew-join split handles. "
    "At 100 TB this is the canonical MapReduce shape of substring "
    "dedup; nothing is ever all-pairs.",
    tags=("text", "llm", "dedup"),
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    g = _gram_stream(d)
    pg = g.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    dup = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).cast("bigint")
    return (
        g.join(pg, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), dup.alias("n_dup_grams"))
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            F.expr("n_dup_grams * 1000000 div n_grams").alias("dup_ratio_e6"),
        )
    )


@register(
    "text_substring_scrub",
    oracle=f"""
    WITH {_SQL_GRAMS},
    cov AS (
      SELECT DISTINCT g.doc_id, g.pos + o AS cpos
      FROM g JOIN pg USING (gram), UNNEST(generate_series(0, {_K - 1})) AS s(o)
      WHERE pg.nd >= 2
    ), tok AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(generate_series(1, len(t))) AS u(i)
    )
    SELECT tok.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN cov.cpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           md5(COALESCE(array_to_string(
             list(tok ORDER BY pos) FILTER (WHERE cov.cpos IS NULL),
             ' '), '')) AS clean_md5
    FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.cpos
    GROUP BY tok.doc_id
    """,
    doc="Exact-substring REMOVAL (the second half of the Lee et al. "
    "pass): every token covered by any cross-document duplicated "
    "k-gram occurrence is dropped, and the cleaned document is "
    "reconstructed in token order (returned as an md5 so the full "
    "cleaned corpus is value-checked without shipping text through "
    "the hash gate). Covered positions come from exploding k offsets "
    "per duplicated gram start (O(dup spans x k) rows, dedup'd), then "
    "a positional left anti-mark join against the token stream and an "
    "ordered array_sort(collect_list(struct(pos, tok))) rebuild per "
    "doc — the collect is per-document (bounded by doc length), never "
    "corpus-wide. Shuffles: gram count, coverage distinct, positional "
    "join, per-doc rebuild — all keyed on doc_id or gram, all linear "
    "in corpus tokens.",
    tags=("text", "llm", "dedup"),
)
def text_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    g = _gram_stream(d)
    pg = g.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    cov = (
        g.join(pg.where(F.col("nd") >= 2), "gram")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (_K - 1))).alias(
                "cpos"
            ),
        )
        .distinct()
    )
    # cov derives from the same scan as tok — rename its join keys so
    # the positional left join is never self-join-ambiguous.
    cov = cov.select(F.col("doc_id").alias("cdoc"), "cpos")
    toks = F.split(F.col("text"), " ")
    tok = d.select(
        "doc_id", F.posexplode(toks).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    marked = tok.join(
        cov,
        (F.col("doc_id") == F.col("cdoc")) & (F.col("pos") == F.col("cpos")),
        "left",
    ).select("doc_id", "pos", "tok", F.col("cpos").isNotNull().alias("is_cov"))
    kept_sorted = F.array_sort(
        F.collect_list(F.struct("pos", "tok", "is_cov"))
    )
    clean = F.md5(
        F.concat_ws(
            " ",
            F.transform(
                F.filter(kept_sorted, lambda s: ~s["is_cov"]),
                lambda s: s["tok"],
            ),
        )
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("is_cov").cast("int")).cast("bigint").alias("n_removed"),
        clean.alias("clean_md5"),
    )


# --- dedup_semdedup --------------------------------------------------

_SEM_CAP = 400
_SEM_TAU = 0.25

_SQL_SEM_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
    "* 1000000000000) AS BIGINT))) AS BIGINT)"
)


@register(
    "dedup_semdedup",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, embedding,
             {_SQL_SEM_DOT.format(a="embedding", b="embedding")} AS n2
      FROM embeddings WHERE vec_id < {_SEM_CAP}
    ), p AS (
      SELECT a.label AS cluster, a.vec_id AS kept_cand, b.vec_id AS pruned_id,
             CAST({_SQL_SEM_DOT.format(a="a.embedding", b="b.embedding")} AS DOUBLE)
               / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cosine
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT cluster, pruned_id, MIN(kept_cand) AS kept_id,
           COUNT(*) AS n_pruners, MAX(cosine) AS max_cosine
    FROM p WHERE cosine >= {_SEM_TAU}
    GROUP BY cluster, pruned_id
    """,
    doc="SemDeDup-style semantic deduplication: exact e-12 fixed-point "
    "cosine is computed ONLY within a cluster (here the stored label, "
    "standing in for the k-means assignment that sim_kmeans_lloyd / "
    "emb_centroid_label demonstrate); a vector is pruned when any "
    "lower-id cluster-mate scores >= tau, keeping the lowest such id "
    "as its survivor. Pair count is sum(cluster_size^2) — the knob at "
    "100 TB is k (more clusters => smaller blocks), never corpus^2; "
    "the join is a plain equi-join on the cluster key with an id range "
    "predicate, so it shuffles once on cluster and AQE splits any "
    "oversized cluster. Synthetic embeddings have no true near-dups, "
    "so tau sits at the upper tail of the observed cosine "
    "distribution (p99 ~= 0.29) to exercise the prune path.",
    tags=("dedup", "embedding", "llm"),
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(
        load(spark, sf_dir, "embeddings").where(F.col("vec_id") < _SEM_CAP)
    ).select(
        "vec_id", "label", "embedding", S.sq_norm_e12("embedding").alias("n2")
    )
    a = e.select(
        F.col("label").alias("cluster"),
        F.col("vec_id").alias("kept_cand"),
        F.col("embedding").alias("a_emb"),
        F.col("n2").alias("a_n2"),
    )
    b = e.select(
        F.col("label").alias("cluster"),
        F.col("vec_id").alias("pruned_id"),
        F.col("embedding").alias("b_emb"),
        F.col("n2").alias("b_n2"),
    )
    pairs = a.join(b, "cluster").where(F.col("kept_cand") < F.col("pruned_id"))
    scored = pairs.select(
        "cluster",
        "kept_cand",
        "pruned_id",
        S.cosine_from_e12(
            S.dot_e12("a_emb", "b_emb"), F.col("a_n2"), F.col("b_n2")
        ).alias("cosine"),
    )
    return (
        scored.where(F.col("cosine") >= _SEM_TAU)
        .groupBy("cluster", "pruned_id")
        .agg(
            F.min("kept_cand").alias("kept_id"),
            F.count(F.lit(1)).alias("n_pruners"),
            F.max("cosine").alias("max_cosine"),
        )
    )


# --- sample_perplexity_buckets ---------------------------------------


@register(
    "sample_perplexity_buckets",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), vocab AS (
      SELECT tok, COUNT(*) AS n_tok FROM tok GROUP BY tok
    ), scored AS (
      SELECT t.doc_id,
             CAST(SUM(v.n_tok) AS BIGINT) * 1000000 // COUNT(*) AS score_e6
      FROM tok t JOIN vocab v USING (tok) GROUP BY t.doc_id
    ), bucketed AS (
      SELECT doc_id, score_e6,
             NTILE(10) OVER (ORDER BY score_e6, doc_id) AS bucket
      FROM scored
    )
    SELECT bucket, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 10 < bucket THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           MIN(score_e6) AS min_score_e6, MAX(score_e6) AS max_score_e6
    FROM bucketed GROUP BY bucket
    """,
    doc="Perplexity-bucketed corpus mixing: docs are scored by mean "
    "corpus token frequency (the monotone stand-in for unigram "
    "perplexity — see text_lm_unigram_score for why no log()), cut "
    "into exact deciles, and a deterministic per-bucket keep rule "
    "(doc_id % 10 < bucket => common-language buckets keep more) "
    "models the quality-vs-diversity mixture knob. The NTILE here is "
    "a single-reducer global sort — exact and oracle-able at test "
    "scale; the documented 100 TB swap is range-bucketing against "
    "broadcast approxQuantile(score, 10) boundaries, which turns the "
    "decile cut into a narrow map (same trade profile_columns -> "
    "profile_columns_hll makes for distinct counts).",
    tags=("llm", "sampling", "quality"),
)
def sample_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    scored = (
        tok.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.expr("sum(n_tok) * 1000000 div count(1)").alias("score_e6")
        )
    )
    bucketed = scored.select(
        "doc_id",
        "score_e6",
        F.ntile(10).over(W.orderBy("score_e6", "doc_id")).alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("doc_id") % 10 < F.col("bucket"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.min("score_e6").alias("min_score_e6"),
        F.max("score_e6").alias("max_score_e6"),
    )


# --- text_quality_classifier -----------------------------------------

_QC_DIM = 64  # hashed feature buckets


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), feat AS (
      SELECT doc_id,
             ((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
              + instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
               % {_QC_DIM} AS idx
      FROM tok
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM((idx + 1) * 2654435761 % 4001 - 2000) AS BIGINT) AS score,
           CAST(SUM((idx + 1) * 2654435761 % 4001 - 2000) AS BIGINT) * 1000000
             // COUNT(*) AS margin_e6,
           CASE WHEN CAST(SUM((idx + 1) * 2654435761 % 4001 - 2000) AS BIGINT) > 0
                THEN 1 ELSE 0 END AS keep
    FROM feat GROUP BY doc_id
    """,
    doc="fastText-shaped linear quality classifier: tokens hash to "
    f"{_QC_DIM} feature buckets (first md5 byte — the hashing trick), "
    "each bucket carries a fixed pseudo-random integer weight "
    "(Knuth-multiplicative (idx+1)*2654435761 % 4001 - 2000, standing "
    "in for trained fastText weights, which would ship as a broadcast "
    "weight array); the doc score is the plain sum of its token "
    "weights and keep = sign. The entire model is codegen'd integer "
    "expressions — one explode and ONE map-side-combinable per-doc "
    "aggregate, zero joins, zero Python. margin_e6 uses truncating "
    "integer division toward zero, engine-identical for the signed "
    "numerator (Spark `div` and DuckDB `//` both truncate). At 100 TB "
    "a real trained weight vector replaces the expression via a "
    "broadcast map lookup; the plan shape is unchanged.",
    tags=("text", "llm", "quality"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    first_byte = (
        (F.expr("instr('0123456789abcdef', substr(md5(tok), 1, 1))") - 1) * 16
        + F.expr("instr('0123456789abcdef', substr(md5(tok), 2, 1))")
        - 1
    )
    w = ((first_byte % _QC_DIM + 1) * 2654435761) % 4001 - 2000
    return (
        tok.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(w).cast("bigint").alias("score"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score",
            F.expr("score * 1000000 div n_tokens").alias("margin_e6"),
            F.when(F.col("score") > 0, 1).otherwise(0).alias("keep"),
        )
    )


# --- text_bpe_train --------------------------------------------------

_BPE_ROUND_SQL = """
, p{r} AS (
  SELECT doc_id, pos, sym,
         lead(sym) OVER w AS nxt,
         CASE WHEN sym = lag(sym) OVER w THEN 0 ELSE 1 END AS runflag
  FROM t{p}
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), r{r} AS (
  SELECT *, SUM(runflag) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id FROM p{r}
), o{r} AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, run_id ORDER BY pos) - 1 AS off
  FROM r{r}
), top{r} AS (
  SELECT sym || ' ' || nxt AS pair FROM o{r} WHERE nxt IS NOT NULL
  GROUP BY 1 ORDER BY COUNT(*) DESC, pair LIMIT 1
), m{r} AS (
  SELECT o{r}.*, top{r}.pair AS top_pair,
         (nxt IS NOT NULL AND sym || ' ' || nxt = top{r}.pair
          AND (sym <> nxt OR off % 2 = 0)) AS ms
  FROM o{r}, top{r}
), s{r} AS (
  SELECT doc_id, pos,
         CASE WHEN ms THEN sym || '+' || nxt ELSE sym END AS sym
  FROM (SELECT *, COALESCE(lag(ms) OVER (PARTITION BY doc_id ORDER BY pos),
                           false) AS cons
        FROM m{r})
  WHERE NOT cons
), t{r} AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos, sym
  FROM s{r}
)"""


def _bpe_round(x: DataFrame, rnd: int):
    """One BPE merge round over (doc_id, pos, sym): find the globally
    most frequent adjacent pair, merge its non-overlapping occurrences
    greedily left-to-right, re-number positions.  Returns (new symbol
    table, 1-row stats DF)."""
    w = W.partitionBy("doc_id").orderBy("pos")
    y = (
        x.withColumn("nxt", F.lead("sym").over(w))
        .withColumn(
            "runflag",
            F.when(F.col("sym") == F.lag("sym").over(w), 0).otherwise(1),
        )
        .withColumn("run_id", F.sum("runflag").over(w))
    )
    y = y.withColumn(
        "off",
        F.row_number().over(W.partitionBy("doc_id", "run_id").orderBy("pos")) - 1,
    )
    top = (
        y.where(F.col("nxt").isNotNull())
        .select(F.concat_ws(" ", "sym", "nxt").alias("top_pair"))
        .groupBy("top_pair")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "top_pair")
        .limit(1)
        .select("top_pair")
    )
    y = y.crossJoin(F.broadcast(top)).withColumn(
        "ms",
        F.col("nxt").isNotNull()
        & (F.concat_ws(" ", "sym", "nxt") == F.col("top_pair"))
        & ((F.col("sym") != F.col("nxt")) | (F.col("off") % 2 == 0)),
    )
    y = y.withColumn("cons", F.coalesce(F.lag("ms").over(w), F.lit(False)))
    # Materialize the marked frame ONCE: three consumers (merge stats,
    # post-merge symbol count, next round's input) would otherwise each
    # re-run the 4-window chain + the top-pair subplan.
    y = y.localCheckpoint(eager=True)
    new = (
        y.where(~F.col("cons"))
        .select(
            "doc_id",
            "pos",
            F.when(F.col("ms"), F.concat_ws("+", "sym", "nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        .select("doc_id", F.row_number().over(w).alias("pos"), "sym")
    )
    stats = (
        y.groupBy("top_pair")
        .agg(F.sum(F.col("ms").cast("int")).cast("bigint").alias("n_merges"))
        .crossJoin(F.broadcast(new.agg(F.count(F.lit(1)).alias("n_symbols_after"))))
        .select(
            F.lit(rnd).alias("round"),
            F.col("top_pair").alias("merged_pair"),
            "n_merges",
            "n_symbols_after",
        )
    )
    return new, stats


@register(
    "text_bpe_train",
    oracle="""
    WITH t0 AS (
      SELECT doc_id, i AS pos, t[i] AS sym
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
           UNNEST(generate_series(1, len(t))) AS u(i)
    )"""
    + _BPE_ROUND_SQL.format(r=1, p=0)
    + _BPE_ROUND_SQL.format(r=2, p=1)
    + """
    SELECT 1 AS round, (SELECT pair FROM top1) AS merged_pair,
           (SELECT CAST(SUM(CASE WHEN ms THEN 1 ELSE 0 END) AS BIGINT) FROM m1)
             AS n_merges,
           (SELECT COUNT(*) FROM t1) AS n_symbols_after
    UNION ALL
    SELECT 2, (SELECT pair FROM top2),
           (SELECT CAST(SUM(CASE WHEN ms THEN 1 ELSE 0 END) AS BIGINT) FROM m2),
           (SELECT COUNT(*) FROM t2)
    """,
    doc="BPE/wordpiece TRAINING loop, two unrolled merge rounds (the "
    "induction half; text_bpe_pair_counts is one round's counting "
    "step, text_encode_ids the apply half): per round, the globally "
    "most frequent adjacent symbol pair (count desc, pair asc "
    "tie-break) is merged greedily left-to-right — overlap can only "
    "occur for same-symbol pairs, resolved exactly by run-position "
    "parity (a run of L identical symbols merges floor(L/2) pairs at "
    "even run offsets), so the sequential greedy scan becomes "
    "per-doc window expressions. Every window is keyed by doc_id "
    "(bounded partitions), the winning pair travels as a broadcast "
    "1-row join, and the pair count is a map-side-combinable "
    "aggregate: each round costs one corpus-keyed shuffle + one "
    "pair-count shuffle — the distributed-BPE shape at 100 TB, where "
    "real trainers run exactly this loop for 30-50k rounds with the "
    "merge table broadcast. Merged symbols join with '+' (absent "
    "from the token alphabet), keeping round-2 pair strings "
    "unambiguous.",
    tags=("text", "llm", "vocab", "iterative"),
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    t0 = d.select(
        "doc_id", F.posexplode(toks).alias("p0", "sym")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "sym")
    t1, s1 = _bpe_round(t0, 1)
    # Truncate lineage between rounds: round 2's windows re-plan round
    # 1's whole pipeline otherwise (same policy as the CC/PageRank
    # iterations).
    t1 = t1.localCheckpoint(eager=True)
    _, s2 = _bpe_round(t1, 2)
    return s1.unionByName(s2)


# --- scan_file_provenance --------------------------------------------


@register(
    "scan_file_provenance",
    oracle="""
    SELECT 'region' AS tbl, 'region.parquet' AS file_name, COUNT(*) AS n_rows,
           CAST(MIN(r_regionkey) AS BIGINT) AS min_key,
           CAST(MAX(r_regionkey) AS BIGINT) AS max_key
    FROM region
    UNION ALL
    SELECT 'nation', 'nation.parquet', COUNT(*),
           CAST(MIN(n_nationkey) AS BIGINT), CAST(MAX(n_nationkey) AS BIGINT)
    FROM nation
    UNION ALL
    SELECT 'customer', 'customer.parquet', COUNT(*),
           CAST(MIN(c_custkey) AS BIGINT), CAST(MAX(c_custkey) AS BIGINT)
    FROM customer
    """,
    doc="File-level provenance audit via the parquet _metadata column "
    "(Spark's hidden per-file metadata: file_name, file_path, size) — "
    "the primitive behind incremental ingestion ledgers, per-file "
    "quarantine, and audit trails at lake scale: group by source file, "
    "count rows, min/max key per file, all computed in the same scan "
    "as the data (no extra listing job). The oracle pins the expected "
    "single-file-per-table layout as literals while row counts and "
    "key ranges are value-checked, so the metadata read itself is "
    "proven against the real layout. At 100 TB the same plan yields "
    "the per-file manifest used for skipping and backfill diffing.",
    tags=("scan", "provenance"),
)
def scan_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tbl, key in (
        ("region", "r_regionkey"),
        ("nation", "n_nationkey"),
        ("customer", "c_custkey"),
    ):
        df = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
        part = (
            df.select(
                F.lit(tbl).alias("tbl"),
                F.col("_metadata.file_name").alias("file_name"),
                F.col(key).cast("bigint").alias("k"),
            )
            .groupBy("tbl", "file_name")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("k").alias("min_key"),
                F.max("k").alias("max_key"),
            )
        )
        out = part if out is None else out.unionByName(part)
    return out


# --- udf_arrow_grouped -----------------------------------------------


@register(
    "udf_arrow_grouped",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT) AS sum_value_e6
    FROM events GROUP BY event_type
    """,
    doc="groupBy().applyInArrow surface (Spark 4): grouped Arrow "
    "Tables in, Arrow Table out, aggregated with vectorized "
    "pyarrow.compute kernels — no pandas materialization anywhere. "
    "Completes the Arrow half of the UDF matrix (mapInArrow covers "
    "the ungrouped path). Fixed-point floor-e6 units keep the Python "
    "sum bit-identical to the SQL oracle. Grouped-UDF scale caveat "
    "applies as with applyInPandas: one group must fit an executor's "
    "Arrow batch — fine for keyed aggregates, and the reason "
    "map-side-combinable built-ins remain the default for plain "
    "grouped sums.",
    tags=("udf", "arrow", "agg"),
)
def udf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    e = fanout(load(spark, sf_dir, "events"))

    # NOTE: deliberately un-annotated — pyspark's group-arrow eval-type
    # inference raises on unresolvable string hints and (bug) leaves
    # eval_type unbound instead of falling through to the default.
    def agg(key, table):
        units = pc.floor(
            pc.multiply(pc.cast(table.column("value"), pa.float64()), 1_000_000.0)
        )
        s = pc.sum(pc.cast(units, pa.int64())).as_py()
        return pa.table(
            {
                "event_type": [key[0]],
                "n": pa.array([table.num_rows], pa.int64()),
                "sum_value_e6": pa.array([int(s or 0)], pa.int64()),
            }
        )

    return (
        e.select("event_type", "value")
        .groupBy("event_type")
        .applyInArrow(agg, "event_type string, n bigint, sum_value_e6 bigint")
    )


# --- udtf_dynamic_cols -----------------------------------------------

_UDTF_K = 3


@register(
    "udtf_dynamic_cols",
    oracle=f"""
    SELECT doc_id,
           t[1] AS tok1, t[2] AS tok2, t[3] AS tok3
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    """,
    doc="POLYMORPHIC Python UDTF (Spark 4 analyze()): the output "
    f"schema (tok1..tok{_UDTF_K}) is computed at PLAN TIME from the "
    "constant k argument by the UDTF's static analyze() method — the "
    "dynamic-schema table-function surface (udtf_explode_frames "
    "covers the static-schema one). Catalyst sees real per-column "
    "schema, so downstream pruning/filters work on UDTF output like "
    "any table. Runs as a lateral join against the documents scan.",
    tags=("udf", "udtf"),
)
def udtf_dynamic_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    @udtf
    class SplitCols:
        @staticmethod
        def analyze(text, k) -> AnalyzeResult:
            schema = StructType()
            for i in range(k.value):
                schema = schema.add(f"tok{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, k: int):
            toks = (text or "").split(" ")
            yield tuple(toks[i] if i < len(toks) else None for i in range(k))

    d = fanout(load(spark, sf_dir, "documents"))
    return d.lateralJoin(
        SplitCols(F.col("text").outer(), F.lit(_UDTF_K))
    ).select("doc_id", *[f"tok{i + 1}" for i in range(_UDTF_K)])


# --- sink_snapshot_timetravel ----------------------------------------


@register(
    "sink_snapshot_timetravel",
    oracle="""
    SELECT 1 AS version, COUNT(*) AS n,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id,
           CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT) AS sum_value_e6
    FROM events WHERE event_id < 1000
    UNION ALL
    SELECT 2, COUNT(*), MIN(event_id), MAX(event_id),
           CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT)
    FROM events WHERE event_id < 2000
    """,
    doc="Snapshot versioning + TIME TRAVEL (operators/snapshots.py, a "
    "minimal Delta-style manifest commit log over plain parquet): "
    "events <1000 commits as v1, events 1000..1999 APPENDS as v2; the "
    "query then reads snapshot v1 BY VERSION (after v2 exists — the "
    "time-travel read) and v2 as latest, proving snapshot isolation: "
    "a pinned training run re-reads exactly the files its manifest "
    "names while ingestion keeps appending. Writes are data-first "
    "with a single atomic manifest replace as the commit point; "
    "readers hand the manifest's file list to one parquet scan, so "
    "pushdown/pruning apply unchanged. Crash-invisibility and "
    "overwrite history are pinned in tests/test_snapshots.py.",
    tags=("sink", "layout", "versioning"),
)
def sink_snapshot_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    table = tempfile.mkdtemp(prefix="besk_snap_") + "/events_versioned"
    SNAP.write_version(e.where(F.col("event_id") < 1000), table, mode="append")
    SNAP.write_version(
        e.where((F.col("event_id") >= 1000) & (F.col("event_id") < 2000)),
        table,
        mode="append",
    )
    units = lambda c: F.floor(F.col(c).cast("double") * 1_000_000).cast("bigint")  # noqa: E731

    def stats(df: DataFrame, v: int) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            F.sum(units("value")).alias("sum_value_e6"),
        ).select(F.lit(v).alias("version"), "n", "min_id", "max_id", "sum_value_e6")

    v1 = stats(SNAP.read_version(spark, table, version=1), 1)
    v2 = stats(SNAP.read_version(spark, table), 2)  # latest
    return v1.unionByName(v2)



@register(
    "sink_delete_propagation",
    oracle="""
    SELECT 1 AS version, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 2, lang, COUNT(*),
           CAST(SUM(n_chars) AS BIGINT)
    FROM documents WHERE doc_id % 7 <> 3 GROUP BY lang
    """,
    doc="Right-to-be-forgotten DELETE propagation over the snapshot "
    "commit log (operators/snapshots.py::delete_where): the corpus "
    "commits as v1, then every doc with doc_id %% 7 = 3 is deleted — "
    "the new snapshot rewrites ONLY the data files that contained "
    "matching rows (one distributed input_file_name() scan finds "
    "them), carries every untouched file by name with zero I/O, and "
    "publishes with the same single atomic manifest replace. v1 still "
    "time-travels to the pre-delete corpus (retention/VACUUM decides "
    "physical erasure separately) — exactly the Delta/Iceberg DELETE "
    "plan a 100 TB GDPR pipeline runs, where rewriting the whole "
    "table per deletion request is a non-starter. The query value-"
    "checks BOTH versions per language; minimal-rewrite (untouched "
    "file paths carried verbatim) is pinned in tests/test_snapshots.py.",
    tags=("sink", "layout", "versioning", "llm"),
)
def sink_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_del_") + "/docs_versioned"
    # range-layout so the delete predicate touches a subset of files
    SNAP.write_version(d.repartitionByRange(4, "doc_id"), table, mode="append")
    SNAP.delete_where(spark, table, "doc_id % 7 = 3")

    def stats(df: DataFrame, v: int) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        ).select(F.lit(v).alias("version"), "lang", "n_docs", "sum_chars")

    v1 = stats(SNAP.read_version(spark, table, version=1), 1)  # time travel
    v2 = stats(SNAP.read_version(spark, table), 2)  # post-delete latest
    return v1.unionByName(v2)


# --- scan_warc_corpus ------------------------------------------------


@register(
    "scan_warc_corpus",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS content_length,
           md5(text) AS payload_md5
    FROM documents
    """,
    doc="WARC crawl-archive round trip (sources/warc.py): the FULL "
    "documents table is serialized as genuine WARC/1.0 response "
    "records by the SHARDED DataSource writer — one shard per task, "
    "task-temp + driver-rename commit (refsink protocol), no driver "
    "collect anywhere — then read back through the byte-offset-"
    "partitioned Python Data Source (each executor seeks straight to "
    "its record slice; real crawls ship the same index as cdx). The "
    "query extracts the doc id from the WARC-Target-URI and value-"
    "checks length + md5 of every payload against the source table — "
    "proving the writer/reader round-trip byte-exact, the front door "
    "a Common-Crawl-shaped 100 TB corpus walks through in AND out.",
    tags=("scan", "source", "multimodal"),
)
def scan_warc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.sources.warc import read_warc, write_warc_sharded

    docs = load(spark, sf_dir, "documents").select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("record_id"),
        F.concat(F.lit("http://corpus.local/doc/"), F.col("doc_id")).alias(
            "target_uri"
        ),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = tempfile.mkdtemp(prefix="besk_warc_") + "/corpus"
    write_warc_sharded(docs, out)
    w = read_warc(spark, out, records_per_partition=256)
    return w.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("bigint").alias("doc_id"),
        F.col("content_length"),
        F.md5("payload").alias("payload_md5"),
    )


# --- curate_scrub_pipeline -------------------------------------------


@register(
    "curate_scrub_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, text,
             CAST(SUM(((((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16
                         + instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)
                        % {_QC_DIM} + 1) * 2654435761 % 4001 - 2000))
                  AS BIGINT) AS score
      FROM (SELECT doc_id, source, text, UNNEST(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, source, text
    ), kept AS (
      SELECT doc_id, source, text FROM scored WHERE score > 0
    ), g AS (
      SELECT doc_id, i AS pos, md5(array_to_string(t[i:i+{_K - 1}], ' ')) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM kept),
           UNNEST(generate_series(1, len(t) - {_K - 1})) AS u(i)
    ), pg AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY gram
    ), cov AS (
      SELECT DISTINCT g.doc_id, g.pos + o AS cpos
      FROM g JOIN pg USING (gram), UNNEST(generate_series(0, {_K - 1})) AS s(o)
      WHERE pg.nd >= 2
    ), tok AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM kept),
           UNNEST(generate_series(1, len(t))) AS u(i)
    ), per_doc AS (
      SELECT tok.doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(CASE WHEN cov.cpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed
      FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.cpos
      GROUP BY tok.doc_id
    )
    SELECT s.source,
           COUNT(*) AS n_docs_in,
           CAST(SUM(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_kept,
           CAST(COALESCE(SUM(p.n_tokens), 0) AS BIGINT) AS n_tokens_kept_docs,
           CAST(COALESCE(SUM(p.n_removed), 0) AS BIGINT) AS n_tokens_scrubbed
    FROM documents s LEFT JOIN per_doc p ON s.doc_id = p.doc_id
    GROUP BY s.source
    """,
    doc="Round-3 curation FLAGSHIP — the model-gated substring-scrub "
    "pipeline as ONE Catalyst plan: (1) every doc scored by the "
    "hashed-feature linear quality model (text_quality_classifier's "
    "exact math), (2) docs with positive margin survive, (3) the "
    "Lee-et-al k-gram pass runs OVER THE SURVIVORS ONLY (dup spans "
    "re-derived post-filter — scrubbing before filtering wastes the "
    "work on docs the gate drops), (4) per-source audit: docs in/kept, "
    "surviving tokens, scrubbed tokens. Every stage is the already-"
    "verified operator's plan shape; composition adds zero new "
    "shuffle classes (token explode -> per-doc agg -> gram equi-join "
    "-> positional join -> per-source rollup, all linear in corpus "
    "tokens, broadcast-free, cartesian-free).",
    tags=("llm", "pipeline", "dedup", "quality"),
)
def curate_scrub_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", "source", "text", F.explode(F.split("text", " ")).alias("tok")
    )
    first_byte = (
        (F.expr("instr('0123456789abcdef', substr(md5(tok), 1, 1))") - 1) * 16
        + F.expr("instr('0123456789abcdef', substr(md5(tok), 2, 1))")
        - 1
    )
    w = ((first_byte % _QC_DIM + 1) * 2654435761) % 4001 - 2000
    kept = (
        tok.groupBy("doc_id", "source", "text")
        .agg(F.sum(w).cast("bigint").alias("score"))
        .where(F.col("score") > 0)
        .select("doc_id", "source", "text")
    )
    g = _gram_stream(kept)
    pg = g.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    cov = (
        g.join(pg.where(F.col("nd") >= 2), "gram")
        .select(
            F.col("doc_id").alias("cdoc"),
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (_K - 1))).alias(
                "cpos"
            ),
        )
        .distinct()
    )
    ktok = kept.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"))
    per_doc = (
        ktok.join(
            cov,
            (F.col("doc_id") == F.col("cdoc")) & (F.col("pos") == F.col("cpos")),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("cpos").isNotNull().cast("int")).cast("bigint").alias(
                "n_removed"
            ),
        )
    )
    pd2 = per_doc.select(
        F.col("doc_id").alias("p_doc_id"), "n_tokens", "n_removed"
    )
    return (
        d.select("doc_id", "source")
        .join(pd2, F.col("doc_id") == F.col("p_doc_id"), "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_in"),
            F.sum(F.col("p_doc_id").isNotNull().cast("int")).cast("bigint").alias(
                "n_docs_kept"
            ),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias(
                "n_tokens_kept_docs"
            ),
            F.coalesce(F.sum("n_removed"), F.lit(0)).cast("bigint").alias(
                "n_tokens_scrubbed"
            ),
        )
    )


# --- sample_bottom_k -------------------------------------------------

_BK = 50


@register(
    "sample_bottom_k",
    oracle=f"""
    SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hk
    FROM documents
    ORDER BY hk, doc_id
    LIMIT {_BK}
    """,
    doc="Bottom-k-by-hash sampling: the k records with the smallest "
    "md5(id) form a UNIFORM sample that is deterministic, mergeable "
    "(bottom-k of a union = bottom-k of the per-partition bottom-ks — "
    "the property reservoir sampling lacks), and stable under "
    "reprocessing (the same ids are always chosen, so samples from "
    "different pipeline stages are joinable). Executes as "
    "TakeOrderedAndProject: per-partition top-k + driver k-way merge, "
    "O(k) memory per partition, no global sort — the distributed "
    "uniform-sampling shape at any corpus size (k-minimum-values is "
    "also the classic distinct-count sketch).",
    tags=("sampling", "llm"),
)
def sample_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("hk"))
        .orderBy("hk", "doc_id")
        .limit(_BK)
    )


# --- sink_incremental_manifest_agg -----------------------------------


@register(
    "sink_incremental_manifest_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT) AS sum_value_e6
    FROM events WHERE event_id < 2000
    GROUP BY event_type
    """,
    doc="INCREMENTAL aggregation from manifest diffs — the 100 TB "
    "incremental-ETL pattern: after snapshot v2 appends to v1, the "
    "delta is exactly set(files(v2)) - set(files(v1)) read straight "
    "from the two manifests (zero listing, zero data reads to plan); "
    "the maintained aggregate is old_agg MERGE agg(delta files only). "
    "The query materializes v1's aggregate, appends v2, scans ONLY "
    "the delta files, merges — and the oracle is the FULL recompute "
    "over both snapshots, proving merge == recompute. Works because "
    "count/sum are mergeable; the same shape maintains HLL/minhash "
    "sketch aggregates (agg_hll_rollup) without ever rescanning "
    "history.",
    tags=("sink", "versioning", "incremental"),
)
def sink_incremental_manifest_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    table = tempfile.mkdtemp(prefix="besk_ivm_") + "/events_versioned"
    units = F.floor(F.col("value").cast("double") * 1_000_000).cast("bigint")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum(units).alias("sum_value_e6")
        )

    v1 = SNAP.write_version(e.where(F.col("event_id") < 1000), table)
    # the maintained aggregate state (tiny; stored rows, not a rescan)
    state = agg(SNAP.read_version(spark, table, v1)).localCheckpoint(eager=True)
    v2 = SNAP.write_version(
        e.where((F.col("event_id") >= 1000) & (F.col("event_id") < 2000)), table
    )
    old_files = set(SNAP._load_manifest(table, v1)["files"])
    delta = [
        os.path.join(table, f)
        for f in SNAP._load_manifest(table, v2)["files"]
        if f not in old_files
    ]
    assert delta, "append must add files"
    delta_agg = agg(spark.read.parquet(*delta))
    return (
        state.unionByName(delta_agg)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sum_value_e6").cast("bigint").alias("sum_value_e6"),
        )
    )


# --- stats_ks_drift --------------------------------------------------


@register(
    "stats_ks_drift",
    oracle="""
    WITH tagged AS (
      SELECT event_type, value,
             CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a
      FROM events
    ), sized AS (
      SELECT event_type,
             CAST(SUM(a) AS BIGINT) AS n1,
             CAST(SUM(1 - a) AS BIGINT) AS n2
      FROM tagged GROUP BY event_type
    ), walked AS (
      SELECT t.event_type, s.n1, s.n2,
             CAST(SUM(a) OVER w AS BIGINT) AS c1,
             CAST(SUM(1 - a) OVER w AS BIGINT) AS c2
      FROM tagged t JOIN sized s USING (event_type)
      WINDOW w AS (PARTITION BY t.event_type ORDER BY value
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, n1, n2,
           MAX(abs(c1 * n2 - c2 * n1)) * 1000000 // (n1 * n2) AS d_e6
    FROM walked
    GROUP BY event_type, n1, n2
    """,
    doc="EXACT two-sample Kolmogorov-Smirnov drift per event type — "
    "the continuous-distribution companion to stats_chi2_drift's "
    "categorical gate (is the `value` distribution of even-id events "
    "drifting from odd-id events?). The ECDF walk needs no sort-merge "
    "trickery: a ties-INCLUSIVE running count per sample comes from "
    "the default RANGE UNBOUNDED PRECEDING frame (identical ties "
    "semantics in Spark and DuckDB — at duplicate values both engines "
    "count the whole value group, which is exactly the correct ECDF "
    "evaluation point), and D = max |c1*n2 - c2*n1| / (n1*n2) in "
    "integer cross-multiplied e6 units. One keyed shuffle; each "
    "partition sorts only its own type's rows — the per-series drift "
    "monitor shape at any number of series.",
    tags=("stats", "drift", "window"),
)
def stats_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "events"))
    tagged = e.select(
        "event_type",
        "value",
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("a"),
    )
    sized = tagged.groupBy("event_type").agg(
        F.sum("a").cast("bigint").alias("n1"),
        F.sum(1 - F.col("a")).cast("bigint").alias("n2"),
    )
    w = W.partitionBy("event_type").orderBy("value")  # default RANGE frame
    walked = tagged.join(sized, "event_type").select(
        "event_type",
        "n1",
        "n2",
        F.sum("a").over(w).cast("bigint").alias("c1"),
        F.sum(1 - F.col("a")).over(w).cast("bigint").alias("c2"),
    )
    return walked.groupBy("event_type", "n1", "n2").agg(
        F.expr(
            "max(abs(c1 * n2 - c2 * n1)) * 1000000 div (n1 * n2)"
        ).alias("d_e6")
    )


# --- win_retention_cohorts -------------------------------------------


@register(
    "win_retention_cohorts",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week_idx
      FROM events
    ), cohorted AS (
      SELECT user_id, week_idx,
             MIN(week_idx) OVER (PARTITION BY user_id) AS cohort_week
      FROM wk
    )
    SELECT cohort_week, week_idx - cohort_week AS offset_weeks,
           COUNT(DISTINCT user_id) AS n_users
    FROM cohorted
    GROUP BY cohort_week, week_idx - cohort_week
    """,
    doc="Cohort RETENTION matrix (the product-analytics staple): users "
    "bucketed by first-active week, counted at each week offset they "
    "return. Self-join-free — the naive first-event⋈later-events "
    "join is replaced by distinct (user, week) pairs + a per-user MIN "
    "window + one grouped distinct count, all keyed on user_id then "
    "(cohort, offset): two shuffles total, each linear in active "
    "(user, week) pairs, at any history length. Weeks are integer "
    "epoch-day divisions (engine-identical), no calendar functions "
    "with locale/week-start drift.",
    tags=("window", "analytics", "agg"),
)
def win_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "events"))
    wk = e.select(
        "user_id",
        F.expr(
            "datediff(CAST(ts AS DATE), DATE '1970-01-01') div 7"
        ).alias("week_idx"),
    ).distinct()
    cohorted = wk.select(
        "user_id",
        "week_idx",
        F.min("week_idx").over(W.partitionBy("user_id")).alias("cohort_week"),
    )
    return (
        cohorted.groupBy(
            "cohort_week", (F.col("week_idx") - F.col("cohort_week")).alias("offset_weeks")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --- sink_snapshot_compact --------------------------------------------


@register(
    "sink_snapshot_compact",
    oracle="""
    SELECT 2 AS version, CAST(32 AS BIGINT) AS n_files,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(CAST(l_quantity AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT) AS sum_qty_e6
    FROM lineitem WHERE l_orderkey < 20000
    UNION ALL
    SELECT 3, CAST(4 AS BIGINT), COUNT(*),
           CAST(SUM(CAST(floor(CAST(l_quantity AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT)
    FROM lineitem WHERE l_orderkey < 20000
    """,
    doc="OPTIMIZE-style small-file compaction over the snapshot log "
    "(operators/snapshots.compact): two appends land 24 + 8 files "
    "(the shape a per-micro-batch streaming sink accumulates), "
    "compact bin-packs them into 4 as a NEW version — the query "
    "returns (version, n_files, n, sum) for the pre- and post-"
    "compaction snapshots, proving the rewrite is row-preserving "
    "while the manifest shrinks 32 -> 4 files. Scale: one distributed "
    "read + round-robin repartition + write, no driver collect; prior "
    "versions still time-travel and vacuum reclaims the expired small "
    "files (tests/test_snapshots.py). Claims its version first so a "
    "concurrent vacuum treats the staging as in-flight; aborts and "
    "retries on a mid-rewrite commit (optimistic conflict).",
    tags=("sink", "layout", "versioning", "maintenance"),
)
def sink_snapshot_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    table = tempfile.mkdtemp(prefix="besk_compact_") + "/li_versioned"
    # coalesce_small=False: the 24+8 small-file fragmentation IS the
    # fixture (the shape a per-micro-batch sink accumulates) — the
    # staging auto-coalesce would otherwise pre-empt the maintenance
    # op this query demonstrates (and change its declared n_files)
    SNAP.write_version(
        li.where(F.col("l_orderkey") < 10000).repartition(24),
        table,
        mode="append",
        coalesce_small=False,
    )
    SNAP.write_version(
        li.where((F.col("l_orderkey") >= 10000) & (F.col("l_orderkey") < 20000))
        .repartition(8),
        table,
        mode="append",
        coalesce_small=False,
    )
    v3 = SNAP.compact(spark, table, target_files=4)
    units = F.floor(F.col("l_quantity").cast("double") * 1_000_000).cast("bigint")

    def stats(v: int) -> DataFrame:
        n_files = len(SNAP._load_manifest(table, v)["files"])
        return (
            SNAP.read_version(spark, table, version=v)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(units).alias("sum_qty_e6"),
            )
            .select(
                F.lit(v).cast("int").alias("version"),
                F.lit(n_files).cast("bigint").alias("n_files"),
                "n",
                "sum_qty_e6",
            )
        )

    return stats(2).unionByName(stats(v3))
