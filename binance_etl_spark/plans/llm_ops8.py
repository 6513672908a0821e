"""Ninth LLM-pipeline batch: spectral embedding analysis and
asymmetric containment dedup.

- emb_pca_power: top principal direction of the embedding corpus via
  MATRIX-FREE power iteration — the whitening/compression/drift-
  detection primitive. Never materializes the d x d Gram matrix:
  each unrolled iteration is one corpus scan computing s = <x, v>
  per row (narrow) and accumulating s * x per dimension (one
  map-side-combinable groupBy of d keys); the iterate v travels as a
  broadcast d-vector. That is the shape distributed PCA actually
  runs at 100 TB (cost per iteration = one scan + a d-row shuffle).
- dedup_containment: directional near-dup detection — docs mostly
  CONTAINED in a longer doc (snippets, quotes, clipped re-crawls)
  that symmetric Jaccard under-scores because the union is dominated
  by the longer side. Exact-recall blocking: a truly contained doc's
  min-hash shingle IS one of the container's shingles, so candidates
  come from an equi-join of A's min-md5 shingle against B's exploded
  shingle stream — O(corpus tokens) shuffle, never all-pairs.

Determinism: e6 fixed-point bigint arithmetic; integer div truncates
toward zero in BOTH engines (verified: -7 div 2 = -3 in Spark and
DuckDB), so signed rescaling agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.operators import dedup as D
from binance_etl_spark.plans.registry import register

# --- emb_pca_power ---------------------------------------------------

_E6 = 1_000_000


@register(
    "emb_pca_power",
    oracle=f"""
    WITH xu AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * {_E6}) AS BIGINT)) AS xu
      FROM embeddings
    ), s0 AS (
      SELECT vec_id, xu, CAST(list_sum(xu) AS BIGINT) AS s FROM xu
    ), w1 AS (
      SELECT pos, SUM(s * xu[pos]) AS w
      FROM (SELECT xu, s, UNNEST(generate_series(1, len(xu))) AS pos FROM s0)
      GROUP BY pos
    ), m1 AS (SELECT MAX(abs(w)) AS m FROM w1),
    w1s AS (SELECT pos, w // greatest(m // {_E6}, 1) AS ws FROM w1, m1),
    warr AS (SELECT list(ws ORDER BY pos) AS wa FROM w1s),
    s1 AS (
      SELECT vec_id, xu,
             CAST(list_sum(list_transform(generate_series(1, len(xu)),
                                          i -> xu[i] * wa[i])) AS BIGINT) // {_E6} AS s6
      FROM xu, warr
    ), w2 AS (
      SELECT pos, SUM(s6 * xu[pos]) AS w
      FROM (SELECT xu, s6, UNNEST(generate_series(1, len(xu))) AS pos FROM s1)
      GROUP BY pos
    ), m2 AS (SELECT MAX(abs(w)) AS m FROM w2),
    w2s AS (SELECT pos, w // greatest(m // {_E6}, 1) AS ws FROM w2, m2)
    SELECT CAST(w1s.pos AS BIGINT) AS dim,
           CAST(w1s.ws AS BIGINT) AS v1_e6,
           CAST(w2s.ws AS BIGINT) AS v2_e6
    FROM w1s JOIN w2s USING (pos)
    """,
    doc="Top principal direction via 2 unrolled MATRIX-FREE power "
    "iterations (v0 = ones): per iteration one corpus scan computes "
    "the scalar projection <x, v> per row and folds s*x into d "
    "dimension-keyed partial sums — the Gram matrix is never built. "
    "The iterate is rescaled to ~e6 by dividing by its max component "
    "down-scaled to e6 units (keeps the rescale multiply-free, so "
    "bigint never overflows; integer truncating div is "
    "engine-identical for signed values) and travels "
    "as a broadcast d-vector. At 100 TB each iteration is one scan + "
    "a d-row shuffle; bigint headroom covers ~1e9 rows before the "
    "partial sums need a decimal widening.",
    tags=("llm", "embedding", "iterative"),
)
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings"))
    xu = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _E6).cast("bigint"),
        ).alias("xu"),
    ).cache()  # consumed by both unrolled iterations (HOF exprs are interpreted)

    def iterate(scored: DataFrame) -> DataFrame:
        """(xu, s6) rows -> e6-rescaled iterate, one row per 1-based dim."""
        w = (
            scored.select(F.posexplode("xu").alias("pos0", "xv"), "s6")
            .groupBy("pos0")
            .agg(F.sum(F.col("s6") * F.col("xv")).alias("w"))
            # d rows; checkpoint so the corpus-wide aggregation runs
            # ONCE per iteration even though w feeds both the max-abs
            # scalar and the rescaled iterate (and, for iteration 1,
            # the broadcast array + the final join).
            .localCheckpoint(eager=True)
        )
        m = w.agg(F.max(F.abs("w")).alias("m"))
        return w.crossJoin(F.broadcast(m)).select(
            (F.col("pos0") + 1).alias("pos"),
            F.expr(f"w div greatest(m div {_E6}, 1)").alias("ws"),
        )

    s0 = xu.select(
        "xu", F.expr("aggregate(xu, CAST(0 AS BIGINT), (a, v) -> a + v)").alias("s6")
    )
    w1s = iterate(s0)
    warr = w1s.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "ws"))), lambda s: s["ws"]
        ).alias("wa")
    )
    s1 = xu.crossJoin(F.broadcast(warr)).select(
        "xu",
        F.expr(
            f"aggregate(zip_with(xu, wa, (x, w) -> x * w),"
            f" CAST(0 AS BIGINT), (a, v) -> a + v) div {_E6}"
        ).alias("s6"),
    )
    w2s = iterate(s1)
    return (
        w1s.withColumnRenamed("ws", "v1_e6")
        .join(w2s.withColumnRenamed("ws", "v2_e6"), "pos")
        .select(
            F.col("pos").cast("bigint").alias("dim"),
            F.col("v1_e6").cast("bigint"),
            F.col("v2_e6").cast("bigint"),
        )
    )


# --- dedup_containment -----------------------------------------------

_CONT_CAP = 400  # doc_id cap: keeps the sf0.01 oracle fast; blocking is scale-free
_CONT_THRESH_E6 = 800_000  # containment >= 0.8

# Snippet injection: every doc_id % 50 == 3 contributes its first
# half (token-wise) as a synthetic snippet doc at id + 2_000_000 —
# known positives whose containment in the original is ~1.0.
_SQL_CONT_DOCS = f"""
      SELECT doc_id, text FROM documents WHERE doc_id < {_CONT_CAP}
      UNION ALL
      SELECT doc_id + 2000000,
             array_to_string(t[1 : CAST(greatest(len(t) // 2, 1) AS INT)], ' ')
      FROM (SELECT doc_id, string_split(text, ' ') AS t
            FROM documents WHERE doc_id < {_CONT_CAP})
      WHERE doc_id % 50 = 3
"""

_SQL_SH3 = (
    "list_distinct(list_transform(generate_series(1, len(t) - 2), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)


@register(
    "dedup_containment",
    oracle=f"""
    WITH docs AS ({_SQL_CONT_DOCS}),
    sh AS (
      SELECT doc_id, {_SQL_SH3} AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM docs)
      WHERE len(t) >= 3
    ), a AS (
      SELECT doc_id AS a_id, sh AS a_sh,
             list_aggregate(list_transform(sh, s -> md5(s)), 'min') AS amin
      FROM sh
    ), b AS (
      SELECT doc_id AS b_id, sh AS b_sh, UNNEST(list_transform(sh, s -> md5(s))) AS g
      FROM sh
    ), cand AS (
      -- no DISTINCT needed: B's exploded shingle hashes are unique per
      -- doc (shingle sets are distinct), so A.amin matches each B at
      -- most once -> (a_id, b_id) pairs are already unique
      SELECT a_id, b_id, a_sh, b_sh
      FROM a JOIN b ON a.amin = b.g AND a.a_id <> b.b_id
    )
    SELECT a_id, b_id,
           CAST(len(list_filter(a_sh, x -> list_contains(b_sh, x))) AS BIGINT) AS n_common,
           CAST(len(a_sh) AS BIGINT) AS n_a,
           len(list_filter(a_sh, x -> list_contains(b_sh, x))) * {_E6} // len(a_sh)
             AS containment_e6
    FROM cand
    WHERE len(list_filter(a_sh, x -> list_contains(b_sh, x))) * {_E6} // len(a_sh)
          >= {_CONT_THRESH_E6}
    """,
    doc="DIRECTIONAL containment dedup (snippet/quote/clipped-recrawl "
    "detection): flag docs whose 3-token shingle set is >= 80% inside "
    "another doc's — the case symmetric Jaccard under-scores when the "
    "container is long. Exact-recall blocking: if A is truly contained "
    "in B, A's minimum-md5 shingle IS one of B's shingles, so "
    "candidates are an equi-join of A's min-shingle against B's "
    "exploded shingle stream (O(corpus tokens) shuffle, zero recall "
    "loss for full containment, never all-pairs). Injected snippet "
    "docs (first half of every doc_id %% 50 == 3, id + 2e6) are known "
    "positives. Verification is exact set arithmetic on the candidate "
    "pairs only.",
    tags=("dedup", "llm"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(
        load(spark, sf_dir, "documents").where(F.col("doc_id") < _CONT_CAP)
    ).select("doc_id", "text")
    toks = F.split("text", " ")
    snippets = d.where(F.col("doc_id") % 50 == 3).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(toks, 1, F.greatest(F.floor(F.size(toks) / 2), F.lit(1)).cast("int")),
        ).alias("text"),
    )
    docs = d.unionByName(snippets)
    sh = (
        docs.where(F.size(F.split("text", " ")) >= 3)
        .select("doc_id", D.shingles(F.col("text")).alias("sh"))
        .cache()  # feeds the A side, the B explode, and verification
    )
    a = sh.select(
        F.col("doc_id").alias("a_id"),
        F.col("sh").alias("a_sh"),
        F.array_min(F.transform("sh", F.md5)).alias("amin"),
    )
    b = sh.select(
        F.col("doc_id").alias("b_id"),
        F.col("sh").alias("b_sh"),
        F.explode(F.transform("sh", F.md5)).alias("g"),
    )
    # No distinct: B's exploded hashes are unique per doc, so each
    # (a_id, b_id) pair joins at most once — skipping the dedup avoids
    # shuffling the shingle arrays as grouping keys. Neither join side
    # carries a broadcast hint: locally Catalyst broadcasts the small
    # side, at corpus scale stats exceed the threshold and the same
    # plan degrades gracefully to a shuffle equi-join on the hash.
    cand = a.join(
        b, (F.col("amin") == F.col("g")) & (F.col("a_id") != F.col("b_id"))
    ).select("a_id", "b_id", "a_sh", "b_sh")
    n_common = F.size(F.array_intersect("a_sh", "b_sh")).cast("bigint")
    cont = F.expr(f"CAST(size(array_intersect(a_sh, b_sh)) AS BIGINT) * {_E6}"
                  f" div size(a_sh)")
    return (
        cand.select(
            "a_id",
            "b_id",
            n_common.alias("n_common"),
            F.size("a_sh").cast("bigint").alias("n_a"),
            cont.alias("containment_e6"),
        )
        .where(F.col("containment_e6") >= _CONT_THRESH_E6)
    )


# --- text_encode_ids -------------------------------------------------

_VOCAB_V = 32  # top-V terms become ids 1..V; everything else is UNK=0


@register(
    "text_encode_ids",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, pos, t[pos] AS term
      FROM (SELECT doc_id, t, UNNEST(generate_series(1, len(t))) AS pos
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
    ), vocab AS (
      SELECT term,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS id
      FROM tok GROUP BY term
      QUALIFY id <= {_VOCAB_V}
    ), enc AS (
      SELECT doc_id, pos, COALESCE(v.id, 0) AS id
      FROM tok LEFT JOIN vocab v USING (term)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
           string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS enc_csv
    FROM enc GROUP BY doc_id
    """,
    doc="Tokenizer APPLY step: frequency-ranked top-"
    f"{_VOCAB_V} vocabulary (ties broken by term — deterministic), "
    "every doc re-emitted as its id sequence (OOV -> UNK=0) plus "
    "token/unk counts. The vocabulary is corpus-derived then "
    "BROADCAST back onto the exploded token stream (ids are "
    "vocabulary-sized, never corpus-sized); sequence re-assembly is "
    "a per-doc sort-free collect ordered by recorded position. The "
    "encode step every pretraining corpus runs after vocab "
    "induction (text_bpe_pair_counts is the induction half).",
    tags=("llm", "text", "tokenization"),
)
def text_encode_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    from pyspark.sql.window import Window as W

    vocab = (
        tok.groupBy("term")
        .agg(F.count("*").alias("cf"))
        .withColumn(
            "id",
            F.row_number().over(W.orderBy(F.col("cf").desc(), F.col("term"))),
        )
        .where(F.col("id") <= _VOCAB_V)
        .select("term", "id")
    )
    enc = tok.join(F.broadcast(vocab), "term", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(0)).alias("id")
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum((F.col("id") == 0).cast("bigint")).cast("bigint").alias("n_unk"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "id"))),
                lambda s: s["id"].cast("string"),
            ),
        ).alias("enc_csv"),
    )
