"""North-star LLM-data-pipeline operators (SURVEY.md §2.12): dedup
(exact / n-gram-Jaccard / MinHash-LSH / SimHash / embedding-cosine),
similarity search (brute-force top-k, IVF probing), text analysis
(lang-ID, quality, token counting, fingerprinting), multimodal columns.

Near-dup queries run on a constructed corpus: the documents table
UNION'd with deterministic perturbed variants (first token dropped /
one embedding dimension negated, ids offset by 1,000,000) — real
near-duplicates with known structure, since the synthetic corpus has
none. Caps (doc_id < N) bound candidate generation; the operators
in operators/dedup.py are uncapped and scale via LSH banding.

All hashing is md5-based and all float reductions go through
floor-to-e12-integer units so the DuckDB oracle matches bit-for-bit
(see operators/similarity.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.operators import dedup as D
from binance_etl_spark.operators import similarity as S
from binance_etl_spark.operators import text as T
from binance_etl_spark.operators.multimodal import decode_avi_frames, with_media_meta
from binance_etl_spark.plans.registry import register

CAP_JACCARD = 1000
CAP_SIMHASH = 300
CAP_EMB = 300

# ---------------------------------------------------------------------------
# SQL fragments shared by the DuckDB oracles
# ---------------------------------------------------------------------------

_SQL_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, len(toks) - 2), "
    "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"
)

_SQL_A = f"""
  a AS (
    SELECT doc_id AS a_id, {_SQL_SHINGLES} AS a_sh
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < {{cap}})
  )"""

_SQL_B = f"""
  b AS (
    SELECT doc_id + 1000000 AS b_id, {_SQL_SHINGLES} AS b_sh
    FROM (SELECT doc_id, string_split(substr(text, instr(text, ' ') + 1), ' ') AS toks
          FROM documents WHERE doc_id < {{cap}})
  )"""


def _variant_docs(spark: SparkSession, sf_dir: str, cap: int) -> DataFrame:
    """Perturbed copies: drop the first token, offset ids by 1e6."""
    d = fanout(load(spark, sf_dir, "documents").where(F.col("doc_id") < cap))
    return d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
        "lang",
        "source",
        "n_chars",
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents
    )
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM corpus GROUP BY sha256(text)
    """,
    doc="Exact dedup by content hash over a corpus with known exact "
    "duplicates (every doc twice). One shuffle on sha256(text); "
    "map-side combinable; this is how exact dedup runs at 100 TB.",
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents")).select("doc_id", "text")
    corpus = d.unionByName(d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    return corpus.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


@register(
    "dedup_near_jaccard",
    oracle=f"""
    WITH {_SQL_A.format(cap=CAP_JACCARD)}, {_SQL_B.format(cap=CAP_JACCARD)},
    am AS (SELECT a_id, a_sh,
                  list_aggregate(list_transform(a_sh, s -> md5(s)), 'min') AS msh FROM a),
    bm AS (SELECT b_id, b_sh,
                  list_aggregate(list_transform(b_sh, s -> md5(s)), 'min') AS msh FROM b),
    scored AS (
      SELECT a_id, b_id,
             len(list_filter(a_sh, x -> list_contains(b_sh, x))) AS n_common,
             len(a_sh) AS n_a, len(b_sh) AS n_b
      FROM am JOIN bm USING (msh)
    )
    SELECT a_id, b_id, n_common,
           CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jacc
    FROM scored
    WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.6
    """,
    doc="n-gram Jaccard near-dup: 3-token shingles, min-md5-shingle "
    "blocking (MinHash with one hash — candidate probability equals "
    "Jaccard), exact Jaccard verification at >= 0.6. Candidates join "
    "on the blocking key: no O(n^2) pair generation.",
    tags=("dedup",),
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(load(spark, sf_dir, "documents").where(F.col("doc_id") < CAP_JACCARD))
    a = docs.select(F.col("doc_id").alias("a_id"), D.shingles(F.col("text")).alias("a_sh"))
    b = _variant_docs(spark, sf_dir, CAP_JACCARD).select(
        F.col("doc_id").alias("b_id"), D.shingles(F.col("text")).alias("b_sh")
    )
    # cache: the shingle arrays feed the join key, the join payload and
    # the verification expression — without it Catalyst re-derives the
    # (HOF-interpreted, non-codegen) shingle pipeline per consumer.
    am = a.withColumn("msh", F.array_min(F.transform("a_sh", F.md5))).cache()
    bm = b.withColumn("msh", F.array_min(F.transform("b_sh", F.md5))).cache()
    jacc = D.jaccard(F.col("a_sh"), F.col("b_sh"))
    return (
        am.join(bm, "msh")
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("a_sh", "b_sh")).alias("n_common"),
            jacc.alias("jacc"),
        )
        .where(F.col("jacc") >= 0.6)
    )


_SQL_SIG = (
    "list_aggregate(list_transform({sh}, s -> md5(concat('{i}:', s))), 'min')"
)


def _sql_minhash_cte(side: str, cap: int) -> str:
    sh = f"{side}_sh"
    sigs = ", ".join(f"{_SQL_SIG.format(sh=sh, i=i)} AS mh{i}" for i in range(1, 7))
    bands = ", ".join(
        f"md5(concat(mh{2 * b + 1}, mh{2 * b + 2})) AS band{b}" for b in range(3)
    )
    return f"""
    {side}sig AS (SELECT {side}_id, {sh}, {sigs} FROM {side}),
    {side}band AS (SELECT {side}_id, {sh}, {bands} FROM {side}sig)"""


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SQL_A.format(cap=CAP_JACCARD)}, {_SQL_B.format(cap=CAP_JACCARD)},
    {_sql_minhash_cte("a", CAP_JACCARD)},
    {_sql_minhash_cte("b", CAP_JACCARD)},
    cand AS (
      SELECT DISTINCT a_id, b_id, a_sh, b_sh FROM (
        SELECT a_id, b_id, a_sh, b_sh FROM aband JOIN bband ON aband.band0 = bband.band0
        UNION ALL
        SELECT a_id, b_id, a_sh, b_sh FROM aband JOIN bband ON aband.band1 = bband.band1
        UNION ALL
        SELECT a_id, b_id, a_sh, b_sh FROM aband JOIN bband ON aband.band2 = bband.band2
      )
    ), verified AS (
      SELECT a_id, b_id,
             len(list_filter(a_sh, x -> list_contains(b_sh, x))) AS n_common,
             len(a_sh) AS n_a, len(b_sh) AS n_b
      FROM cand
    )
    SELECT a_id, b_id,
           CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) AS jacc
    FROM verified
    WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= 0.5
    """,
    doc="MinHash (k=6, md5-seeded) + LSH banding (3 bands x 2 rows): "
    "docs sharing any band are candidates; candidates are verified "
    "with exact Jaccard >= 0.5. The banded equi-join keeps shuffle at "
    "O(docs x bands) — the 100 TB-scale near-dup pipeline.",
    tags=("dedup", "lsh"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(load(spark, sf_dir, "documents").where(F.col("doc_id") < CAP_JACCARD))
    a = docs.select(
        F.col("doc_id").alias("a_id"), D.shingles(F.col("text")).alias("a_sh")
    ).cache()
    b = _variant_docs(spark, sf_dir, CAP_JACCARD).select(
        F.col("doc_id").alias("b_id"), D.shingles(F.col("text")).alias("b_sh")
    ).cache()
    asig = D.minhash_signature(a.select("a_id", F.col("a_sh").alias("sh")), "a_id", "sh")
    bsig = D.minhash_signature(b.select("b_id", F.col("b_sh").alias("sh")), "b_id", "sh")
    abands = D.lsh_bands(asig, "a_id")
    bbands = D.lsh_bands(bsig, "b_id")
    cand_ids = (
        abands.join(bbands, ["band_no", "band_val"]).select("a_id", "b_id").distinct()
    )
    cand = cand_ids.join(a, "a_id").join(b, "b_id")
    jacc = D.jaccard(F.col("a_sh"), F.col("b_sh"))
    return cand.select("a_id", "b_id", jacc.alias("jacc")).where(F.col("jacc") >= 0.5)


@register(
    "dedup_simhash",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id AS id, text FROM documents WHERE doc_id < {CAP_SIMHASH}
      UNION ALL
      SELECT doc_id + 1000000 AS id, substr(text, instr(text, ' ') + 1) AS text
      FROM documents WHERE doc_id < {CAP_SIMHASH}
    ), tc AS (
      SELECT id, tok, COUNT(*) AS cnt
      FROM (SELECT id, UNNEST(string_split(text, ' ')) AS tok FROM corpus)
      GROUP BY id, tok
    ), bits AS (
      SELECT id, cnt, substr(md5(tok), 1, 4) AS h4,
             UNNEST(generate_series(0, 15)) AS bp
      FROM tc
    ), votes AS (
      SELECT id, bp,
             CASE WHEN ((instr('0123456789abcdef', substr(h4, (bp // 4) + 1, 1)) - 1)
                        >> (bp % 4)) % 2 = 1
                  THEN cnt ELSE -cnt END AS vote
      FROM bits
    ), hashes AS (
      SELECT id, CAST(SUM(bitval << bp) AS INT) AS simhash FROM (
        SELECT id, bp, CASE WHEN SUM(vote) > 0 THEN 1 ELSE 0 END AS bitval
        FROM votes GROUP BY id, bp
      ) GROUP BY id
    )
    SELECT a.id AS a_id, b.id AS b_id,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM hashes a JOIN hashes b
      ON a.id < 1000000 AND b.id >= 1000000
     AND bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash (16-bit, count-weighted md5-nibble votes) near-dup: "
    "pairs at hamming distance <= 3. Candidates come from banding the "
    "sketch into four 4-bit bands and equi-joining on (band_no, "
    "band_val): hamming <= 3 pairs differ in at most 3 bands, so by "
    "pigeonhole they share >= 1 band — the result set is IDENTICAL to "
    "an all-pairs comparison (the oracle) while the shuffle stays "
    "O(docs x 4). The 100 TB plan; no cross join anywhere.",
    tags=("dedup",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(load(spark, sf_dir, "documents").where(F.col("doc_id") < CAP_SIMHASH))
    corpus = docs.select(F.col("doc_id").alias("id"), "text").unionByName(
        _variant_docs(spark, sf_dir, CAP_SIMHASH).select(F.col("doc_id").alias("id"), "text")
    )
    tc = T.token_counts(corpus, id_col="id", text_col="text")
    hashes = D.simhash16(tc, "id")
    a = hashes.where(F.col("id") < 1000000).select(
        F.col("id").alias("a_id"), F.col("simhash").alias("a_h")
    )
    b = hashes.where(F.col("id") >= 1000000).select(
        F.col("id").alias("b_id"), F.col("simhash").alias("b_h")
    )
    abands = D.simhash_bands(a, "a_id", "a_h")
    bbands = D.simhash_bands(b, "b_id", "b_h")
    cand = abands.join(bbands, ["band_no", "band_val"]).select("a_id", "b_id").distinct()
    pairs = cand.join(a, "a_id").join(b, "b_id")
    ham = D.hamming16(F.col("a_h"), F.col("b_h"))
    return pairs.where(ham <= 3).select("a_id", "b_id", ham.cast("int").alias("hamming"))


_SQL_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1000000000000) AS BIGINT)))"
    " AS BIGINT)"
)


_N_EMB_BANDS = 4
_EMB_PLANES_PER_BAND = 4

# Per-plane e-12 sign-vote contribution for a list column (shared with
# operators/similarity.py::hyperplane_bucket, which is its Spark twin).
_SQL_BANDS = f"""
    contrib AS (
      SELECT c.id, p.plane,
             CAST(floor((instr('0123456789abcdef',
                    substr(md5(p.plane || '_' || i.i), 1, 1)) - 8.5)
                  * CAST(c.emb[i.i] AS DOUBLE) * 1000000000000) AS BIGINT) AS v
      FROM corpus c
      CROSS JOIN (SELECT UNNEST(generate_series(0, {_N_EMB_BANDS * _EMB_PLANES_PER_BAND - 1})) AS plane) p
      CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i) i
    ), pbits AS (
      SELECT id, plane, CASE WHEN SUM(v) > 0 THEN 1 ELSE 0 END AS bit
      FROM contrib GROUP BY id, plane
    ), buckets AS (
      SELECT id, plane // {_EMB_PLANES_PER_BAND} AS band_no,
             CAST(SUM(bit << (plane % {_EMB_PLANES_PER_BAND})) AS INT) AS bucket
      FROM pbits GROUP BY id, plane // {_EMB_PLANES_PER_BAND}
    )"""


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH a AS (
      SELECT vec_id AS a_id, embedding AS a_emb,
             {_SQL_DOT.format(a="embedding", b="embedding")} AS a_n
      FROM embeddings WHERE vec_id < {CAP_EMB}
    ), b AS (
      SELECT vec_id + 1000000 AS b_id,
             list_concat([-embedding[1]], embedding[2:]) AS b_emb,
             {_SQL_DOT.format(a="embedding", b="embedding")} AS b_n
      FROM embeddings WHERE vec_id < {CAP_EMB}
    ), corpus AS (
      SELECT a_id AS id, a_emb AS emb FROM a
      UNION ALL
      SELECT b_id AS id, b_emb AS emb FROM b
    ), {_SQL_BANDS},
    cand AS (
      SELECT DISTINCT x.id AS a_id, y.id AS b_id
      FROM buckets x JOIN buckets y
        ON x.band_no = y.band_no AND x.bucket = y.bucket
      WHERE x.id < 1000000 AND y.id >= 1000000
    ), scored AS (
      SELECT c.a_id, c.b_id,
             CAST({_SQL_DOT.format(a="a_emb", b="b_emb")} AS DOUBLE)
               / sqrt(CAST(a_n AS DOUBLE) * CAST(b_n AS DOUBLE)) AS cosine
      FROM cand c JOIN a ON a.a_id = c.a_id JOIN b ON b.b_id = c.b_id
    )
    SELECT a_id, b_id, cosine FROM scored WHERE cosine >= 0.9
    """,
    doc="Embedding-cosine near-dup with hyperplane-LSH blocking: corpus "
    "+ one-dimension-negated variants; candidate pairs share >= 1 of 4 "
    "independent 4-plane sign-pattern band buckets (operators/"
    "similarity.py::band_buckets, a pure per-row expression), then "
    "exact e-12 cosine >= 0.9 verifies candidates only. The oracle "
    "implements the SAME blocking, so both engines agree exactly. "
    "Shuffle is O(vectors x bands) — never O(n^2); no cross join. "
    "|b_emb| == |a_emb| by construction so the variant's norm reuses "
    "the original's.",
    tags=("dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings").where(F.col("vec_id") < CAP_EMB))
    a = e.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        S.sq_norm_e12("embedding").alias("a_n"),
    )
    b = e.select(
        (F.col("vec_id") + 1000000).alias("b_id"),
        F.concat(
            F.array(-F.element_at("embedding", 1)),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).alias("b_emb"),
        S.sq_norm_e12("embedding").alias("b_n"),
    )
    abands = S.band_buckets(
        a.select("a_id", F.col("a_emb").alias("emb")),
        "a_id",
        "emb",
        _N_EMB_BANDS,
        _EMB_PLANES_PER_BAND,
    )
    bbands = S.band_buckets(
        b.select("b_id", F.col("b_emb").alias("emb")),
        "b_id",
        "emb",
        _N_EMB_BANDS,
        _EMB_PLANES_PER_BAND,
    )
    cand = abands.join(bbands, ["band_no", "bucket"]).select("a_id", "b_id").distinct()
    pairs = cand.join(a, "a_id").join(b, "b_id")
    scored = pairs.select(
        "a_id",
        "b_id",
        S.cosine_from_e12(S.dot_e12("a_emb", "b_emb"), F.col("a_n"), F.col("b_n")).alias(
            "cosine"
        ),
    )
    return scored.where(F.col("cosine") >= 0.9)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "sim_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id,
             CAST({_SQL_DOT.format(a="embedding", b="q_emb")} AS DOUBLE)
               / sqrt(CAST({_SQL_DOT.format(a="embedding", b="embedding")} AS DOUBLE)
                      * CAST({_SQL_DOT.format(a="q_emb", b="q_emb")} AS DOUBLE)) AS sim
      FROM embeddings, q
    )
    SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 20
    """,
    doc="Brute-force cosine top-k (k=20) against vec 0 — the exact "
    "baseline every ANN variant is measured against. One scan, "
    "broadcast query, TakeOrderedAndProject top-k: no shuffle of the "
    "vector data at any scale.",
    tags=("similarity",),
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_embedding"))
    return S.cosine_topk(e, q, k=20)


@register(
    "sim_ann_ivf",
    oracle=f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    qv AS (
      SELECT UNNEST(generate_series(1, len(q_emb))) AS pos, q_emb FROM q
    ), qvals AS (SELECT pos, q_emb[pos] AS qval FROM qv),
    centroids AS (
      SELECT label, pos, SUM(v_e12) AS c_e12, COUNT(*) AS n FROM (
        SELECT label, i AS pos,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000000) AS BIGINT) AS v_e12
        FROM (SELECT label, embedding,
                     UNNEST(generate_series(1, len(embedding))) AS i
              FROM embeddings)
      ) GROUP BY label, pos
    ), scores AS (
      SELECT label,
             CAST(SUM(CAST(floor(CAST(qval AS DOUBLE) * CAST(c_e12 AS DOUBLE)) AS BIGINT))
                  AS DOUBLE) / MAX(n) AS list_score
      FROM centroids JOIN qvals USING (pos) GROUP BY label
    ), top_lists AS (
      SELECT label FROM scores ORDER BY list_score DESC, label LIMIT 2
    ), cand AS (
      SELECT e.vec_id, e.label, e.embedding FROM embeddings e JOIN top_lists USING (label)
    ), scored AS (
      SELECT vec_id, label,
             CAST({_SQL_DOT.format(a="embedding", b="q_emb")} AS DOUBLE)
               / sqrt(CAST({_SQL_DOT.format(a="embedding", b="embedding")} AS DOUBLE)
                      * CAST({_SQL_DOT.format(a="q_emb", b="q_emb")} AS DOUBLE)) AS sim
      FROM cand, q
    )
    SELECT vec_id, label, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10
    """,
    doc="IVF-style ANN: per-label centroids (exact e-12 integer sums), "
    "probe the 2 best lists, exact-rank only those lists' vectors. "
    "Search cost drops by n_lists/nprobe vs brute force — the scale "
    "path when vectors are clustered (fixture labels are random, so "
    "recall here only demonstrates mechanics).",
    tags=("similarity", "ann"),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_embedding"))
    centroids = S.ivf_centroids_e12(e, "label")
    return S.ivf_probe(e, centroids, q, list_col="label", nprobe=2, k=10)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    oracle="""
    WITH d AS (SELECT lang, text, string_split(text, ' ') AS toks FROM documents)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
           CAST(SUM(len(list_distinct(toks))) AS BIGINT) AS sum_distinct_tokens,
           CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc,
           CAST(SUM(length(text) - len(toks) + 1) AS DOUBLE) / SUM(len(toks)) AS avg_token_len
    FROM d GROUP BY lang
    """,
    doc="Corpus token statistics per language: doc/token/type counts, "
    "mean doc length, mean token length — single scan, two shuffle-free "
    "array exprs + one grouped agg.",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    per_doc = d.select(
        "lang",
        F.size(toks).alias("nt"),
        F.size(F.array_distinct(toks)).alias("nd"),
        (F.length("text") - F.size(toks) + 1).alias("tok_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
        F.sum("nd").cast("bigint").alias("sum_distinct_tokens"),
        (F.sum("nt").cast("double") / F.count(F.lit(1))).alias("avg_tokens_per_doc"),
        (F.sum("tok_chars").cast("double") / F.sum("nt")).alias("avg_token_len"),
    )


@register(
    "text_lang_id",
    oracle="""
    WITH tc AS (
      SELECT lang, tok, COUNT(*) AS c
      FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY lang, tok
    ), profiles AS (
      SELECT lang, tok FROM (
        SELECT lang, tok, row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rn
        FROM tc
      ) WHERE rn <= 5
    ), terms AS (
      SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
      FROM documents WHERE doc_id < 500
    ), hits AS (
      SELECT doc_id, p.lang AS cand_lang, COUNT(*) AS overlap
      FROM terms t JOIN profiles p USING (tok) GROUP BY doc_id, p.lang
    )
    SELECT doc_id, cand_lang AS pred_lang, overlap FROM (
      SELECT doc_id, cand_lang, overlap,
             row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, cand_lang) AS rn
      FROM hits
    ) WHERE rn = 1
    """,
    doc="Language-ID via token-profile overlap (Cavnar-Trenkle n-gram "
    "profiles at token granularity): top-5 profile per language from "
    "the corpus, classify by weighted overlap, deterministic "
    "tie-break. Profiles broadcast; classification is one scan.",
    tags=("text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(load(spark, sf_dir, "documents"))
    profiles = T.lang_profiles(docs, top_n=5).select("lang", "tok")
    return T.classify_lang(docs.where(F.col("doc_id") < 500), profiles)


@register(
    "text_quality_score",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 500
    )
    SELECT doc_id, lang,
           len(toks) AS n_tokens,
           CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks) AS mean_tok_len,
           CAST(len(list_filter(toks, t -> list_contains(['the','a','and','of'], t)))
                AS DOUBLE) / len(toks) AS stopword_ratio,
           1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS repetition
    FROM d
    """,
    doc="Quality-scoring features per doc: length, mean token length, "
    "stopword ratio, repetition (1 - type/token ratio) — the standard "
    "pre-training filter signals, all codegen'd expressions.",
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(load(spark, sf_dir, "documents").where(F.col("doc_id") < 500))
    return T.quality_features(docs)


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens,
           length(text) AS n_chars
    FROM documents WHERE doc_id < 500
    """,
    doc="Token counting two ways: whitespace and a BPE-ish pre-tokenizer "
    "regex (word pieces | numbers | single marks) — the cheap "
    "token-budget estimator for training-data accounting.",
    tags=("text",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{T.BPE_REGEX}', 0)")).alias("bpe_tokens"),
        F.length("text").alias("n_chars"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 500)
    )
    SELECT doc_id,
           list_aggregate(list_transform(sh, s -> md5(s)), 'min') AS fp_min,
           list_aggregate(list_transform(sh, s -> md5(s)), 'max') AS fp_max,
           CAST(len(sh) AS BIGINT) AS n_shingles
    FROM d
    """,
    doc="Document fingerprinting: min/max md5 over 3-token shingles + "
    "shingle count (winnowing-style content-defined signature, "
    "order-invariant, usable as a cheap near-dup prefilter).",
    tags=("text",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(load(spark, sf_dir, "documents").where(F.col("doc_id") < 500))
    shingled = docs.select("doc_id", D.shingles(F.col("text")).alias("sh"))
    return T.fingerprint(shingled, F.col("sh"))


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------

_MM_ROWS = [
    (1, "fake-jpeg-bytes-aaaaaaaaaaaaaaaa", "image/jpeg", 64, 64),
    (2, "fake-png-bytes-bbbbbbbbbbbbbbbbbbbbbbbb", "image/png", 128, 96),
    (3, "fake-wav-bytes-cccccccccccc", "audio/wav", 0, 0),
    (4, "fake-mp4-bytes-dddddddddddddddddddddddddddddddd", "video/mp4", 320, 240),
]


def _mm_assets(spark: SparkSession) -> DataFrame:
    df = spark.createDataFrame(
        _MM_ROWS, "asset_id BIGINT, payload_str STRING, mime STRING, width INT, height INT"
    )
    return df.withColumn("payload", F.encode("payload_str", "UTF-8"))


@register(
    "mm_binary_meta",
    oracle="""
    WITH assets(asset_id, payload_str, mime) AS (
      VALUES (1, 'fake-jpeg-bytes-aaaaaaaaaaaaaaaa', 'image/jpeg'),
             (2, 'fake-png-bytes-bbbbbbbbbbbbbbbbbbbbbbbb', 'image/png'),
             (3, 'fake-wav-bytes-cccccccccccc', 'audio/wav'),
             (4, 'fake-mp4-bytes-dddddddddddddddddddddddddddddddd', 'video/mp4')
    )
    SELECT asset_id, mime,
           octet_length(encode(payload_str)) AS byte_len,
           sha256(payload_str) AS content_hash
    FROM assets
    """,
    doc="Multimodal metadata over opaque binary columns: byte length + "
    "content hash computed JVM-side; the binary payload never crosses "
    "into Python (operators/multimodal.py).",
    tags=("multimodal",),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = with_media_meta(_mm_assets(spark))
    return assets.select("asset_id", "mime", "byte_len", "content_hash")


_AVI_W, _AVI_H, _AVI_VIDS, _AVI_STRIDE = 16, 8, 12, 2
_AVI_FLEN = _AVI_W * _AVI_H  # 8-bit packed greyscale, no row padding
# File layout (fixed by construction, asserted by the decoder's walk):
# RIFF hdr 12 + LIST hdrl 200 (avih 64 + strl 124 + 12) = 212 -> movi
# LIST at 212, first '00db' data at 224 + 8; frame f data offset:
_AVI_OFF0, _AVI_FSTEP = 232, 8 + _AVI_FLEN


def _make_avi(v: int, pixel=None) -> bytearray:
    """Synthesize a GENUINE minimal AVI: RIFF/'AVI ' -> LIST hdrl
    (avih main header + LIST strl with strh 'vids' + strf
    BITMAPINFOHEADER) -> LIST movi with one '00db' chunk per frame ->
    idx1 index. Default pixel formula: frame f pixel j of video v =
    (v*31+f*7+j*13)%256 — so the DuckDB oracle recomputes every stat
    from the formula; any byte-layout error in synthesis or the
    container walk breaks the hash. `pixel(f, j)` overrides the
    formula (mm_scene_cut uses a scene-structured one)."""
    import struct

    if pixel is None:
        pixel = lambda f, j: (v * 31 + f * 7 + j * 13) % 256  # noqa: E731
    w, h, nf = _AVI_W, _AVI_H, 6 + (v % 5)

    def chunk(cc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cc + struct.pack("<I", len(payload)) + payload + pad

    frames = b""
    for f in range(nf):
        frames += chunk(b"00db", bytes(pixel(f, j) for j in range(_AVI_FLEN)))
    movi = b"LIST" + struct.pack("<I", 4 + len(frames)) + b"movi" + frames
    avih = struct.pack("<14I", 33333, 0, 0, 0, nf, 0, 1, _AVI_FLEN, w, h, 0, 0, 0, 0)
    strh = (
        b"vidsRAW8"
        + struct.pack("<IHH", 0, 0, 0)
        + struct.pack("<8I", 0, 1, 30, 0, nf, _AVI_FLEN, 0, _AVI_FLEN)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, _AVI_FLEN, 0, 0, 0, 0)
    strl_kids = chunk(b"strh", strh) + chunk(b"strf", strf)
    strl = b"LIST" + struct.pack("<I", 4 + len(strl_kids)) + b"strl" + strl_kids
    hdrl_kids = chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_kids)) + b"hdrl" + hdrl_kids
    idx = b"".join(
        b"00db" + struct.pack("<III", 16, 12 + f * _AVI_FSTEP, _AVI_FLEN)
        for f in range(nf)
    )
    body = hdrl + movi + chunk(b"idx1", idx)
    return bytearray(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body)


@register(
    "mm_frame_sample",
    # Full value oracle from the generative pixel formula + the closed
    # form of the fixed container layout (byte_offset = 232 + 136*f).
    oracle=f"""
    WITH vids AS (SELECT UNNEST(generate_series(0, {_AVI_VIDS - 1})) AS video_id),
    frames AS (
      SELECT video_id, 6 + (video_id % 5) AS n_frames, f.f AS frame_no
      FROM vids, UNNEST(generate_series(0, 10)) f(f)
      WHERE f.f < 6 + (video_id % 5) AND f.f % {_AVI_STRIDE} = 0
    ),
    px AS (
      SELECT video_id, n_frames, frame_no,
             (video_id*31 + frame_no*7 + j.j*13) % 256 AS b
      FROM frames, UNNEST(generate_series(0, {_AVI_FLEN - 1})) j(j)
    )
    SELECT CAST(video_id AS BIGINT) AS video_id,
           CAST(n_frames AS INT) AS n_frames,
           CAST({_AVI_W} AS INT) AS width, CAST({_AVI_H} AS INT) AS height,
           CAST(frame_no AS INT) AS frame_no,
           CAST({_AVI_OFF0} + {_AVI_FSTEP} * frame_no AS BIGINT) AS byte_offset,
           CAST({_AVI_FLEN} AS INT) AS frame_len,
           CAST(SUM(b) AS BIGINT) AS sum_px
    FROM px GROUP BY video_id, n_frames, frame_no
    """,
    doc="REAL video container decode over a binary column: 12 genuine "
    "minimal AVI files (RIFF signature, hdrl/avih main header, strl "
    "stream headers, movi '00db' frame chunks, idx1 index — synthesized "
    "with stdlib struct) are parsed BACK by walking the RIFF chunk tree "
    "(operators/multimodal.py::decode_avi_frames): header-declared "
    "frame count validated against the movi chunk count, every "
    f"{_AVI_STRIDE}nd frame sampled, pixel bytes reduced to stats. "
    "Completes the real-decode triad with mm_image_decode (BMP) and "
    "mm_audio_decode (WAV). The oracle recomputes everything from the "
    "generative pixel formula and the container's closed-form layout.",
    tags=("multimodal", "udf"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    vids = spark.createDataFrame(
        [(v, _make_avi(v)) for v in range(_AVI_VIDS)], "video_id BIGINT, payload BINARY"
    )
    return decode_avi_frames(vids, stride=_AVI_STRIDE)


_SCENE_LEN, _SCENE_THRESHOLD = 3, 1000


def _make_avi_scenes(v: int) -> bytearray:
    """AVI variant with SCENE structure: pixel formula depends on
    f // _SCENE_LEN, so frames within a scene are identical (diff 0)
    and scene boundaries jump — the known-answer input for cut
    detection."""
    return _make_avi(
        v, pixel=lambda f, j: (v * 31 + (f // _SCENE_LEN) * 97 + j * 13) % 256
    )


@register(
    "mm_scene_cut",
    # diff of consecutive frames from the generative formula; integer
    # exact, so full value oracle. DuckDB's % on negatives matches
    # Python here because every operand is non-negative.
    oracle=f"""
    WITH vids AS (SELECT UNNEST(generate_series(0, {_AVI_VIDS - 1})) AS video_id),
    frames AS (
      SELECT video_id, f.f AS frame_no
      FROM vids, UNNEST(generate_series(1, 10)) f(f)
      WHERE f.f < 6 + (video_id % 5)
    ),
    px AS (
      SELECT video_id, frame_no,
             abs( ((video_id*31 + (frame_no // {_SCENE_LEN})*97 + j.j*13) % 256)
                - ((video_id*31 + ((frame_no-1) // {_SCENE_LEN})*97 + j.j*13) % 256) ) AS d
      FROM frames, UNNEST(generate_series(0, {_AVI_FLEN - 1})) j(j)
    )
    SELECT CAST(video_id AS BIGINT) AS video_id, CAST(frame_no AS INT) AS frame_no,
           CAST(SUM(d) AS BIGINT) AS diff_sum,
           SUM(d) > {_SCENE_THRESHOLD} AS is_cut
    FROM px GROUP BY video_id, frame_no
    """,
    doc="Keyframe selection / scene-change detection over REAL AVI "
    "decode (operators/multimodal.py::avi_scene_cuts): consecutive "
    "decoded frames are compared by summed absolute pixel difference; "
    f"a jump past {_SCENE_THRESHOLD} marks a cut. Inputs are genuine "
    f"AVI containers whose pixel formula changes every {_SCENE_LEN} "
    "frames, so within-scene diffs are exactly 0 and the oracle "
    "recomputes every diff from the formula. This is the step that "
    "keeps near-identical frames from flooding a multimodal training "
    "corpus — sample one keyframe per scene, not every Nth frame.",
    tags=("multimodal", "udf"),
)
def mm_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.multimodal import avi_scene_cuts

    vids = spark.createDataFrame(
        [(v, _make_avi_scenes(v)) for v in range(_AVI_VIDS)],
        "video_id BIGINT, payload BINARY",
    )
    return avi_scene_cuts(vids, threshold=_SCENE_THRESHOLD)
