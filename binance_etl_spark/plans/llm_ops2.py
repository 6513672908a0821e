"""Second LLM-pipeline batch: deterministic dataset splitting, sequence
packing for training batches, and random-hyperplane LSH ANN — the
remaining training-data operators a 100 TB pipeline needs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.plans.registry import register


@register(
    "split_train_val",
    oracle="""
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 14
                  THEN 'train' ELSE 'val' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM assigned GROUP BY split
    """,
    doc="Deterministic train/val split by content-stable hash "
    "(first md5 nibble of the id: 14/16 -> train). Hash-mod splitting "
    "is reproducible across runs/engines/cluster sizes — the correct "
    "way to split at 100 TB (random() is not).",
    tags=("llm", "split"),
)
def split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    nibble = F.expr("instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1")
    assigned = d.select(
        "doc_id", F.when(nibble < 14, "train").otherwise("val").alias("split")
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@register(
    "text_pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT doc_id, lang, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 512)
                  AS BIGINT) AS pack_id
      FROM toks
    )
    SELECT lang, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY lang, pack_id
    """,
    doc="Sequence packing: greedy-fill docs into 512-token training "
    "packs per language (cumulative token count / budget). One window "
    "+ one agg; deterministic doc order (doc_id). The standard "
    "pretraining batch-packing shape at any scale.",
    tags=("llm", "pack"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 512).cast("bigint"),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


# Random-hyperplane LSH: plane components derive from md5 nibbles of
# (plane, dim) — engine-portable pseudo-randomness in [-7.5, 7.5].
_N_PLANES = 4

# Vote contributions are floored to e-12 integer units so the per-plane
# sum is order-independent (a raw double sum could flip the sign bit
# between engines when the projection is near zero).
_SQL_PLANE_BIT = """
      SELECT p.plane, e.vec_id,
             CASE WHEN SUM(CAST(floor((instr('0123456789abcdef',
                        substr(md5(p.plane || '_' || i.i), 1, 1)) - 8.5)
                        * CAST(e.embedding[i.i] AS DOUBLE) * 1000000000000) AS BIGINT)) > 0
                  THEN 1 ELSE 0 END AS bit
      FROM {src} e
      CROSS JOIN (SELECT UNNEST(generate_series(0, {np} - 1)) AS plane) p
      CROSS JOIN (SELECT UNNEST(generate_series(1, 64)) AS i) i
      GROUP BY p.plane, e.vec_id
"""

_SQL_DOT_Q = (
    "CAST(list_sum(list_transform(generate_series(1, len(embedding)), i -> "
    "CAST(floor(CAST(embedding[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE) * 1000000000000)"
    " AS BIGINT))) AS BIGINT)"
)
_SQL_NORM = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE) * 1000000000000)"
    " AS BIGINT))) AS BIGINT)"
)


@register(
    "sim_ann_lsh",
    oracle=f"""
    WITH bits AS ({_SQL_PLANE_BIT.format(src="embeddings", np=_N_PLANES)}),
    buckets AS (
      SELECT vec_id, CAST(SUM(bit << plane) AS INT) AS bucket
      FROM bits GROUP BY vec_id
    ),
    q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    qbucket AS (SELECT bucket FROM buckets WHERE vec_id = 0),
    cand AS (
      SELECT e.vec_id, e.embedding FROM embeddings e
      JOIN buckets b ON e.vec_id = b.vec_id
      JOIN qbucket ON b.bucket = qbucket.bucket
    ),
    scored AS (
      SELECT vec_id,
             CAST({_SQL_DOT_Q} AS DOUBLE)
               / sqrt(CAST({_SQL_NORM.format(a="embedding")} AS DOUBLE)
                      * CAST({_SQL_NORM.format(a="q_emb")} AS DOUBLE)) AS sim
      FROM cand, q
    )
    SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 10
    """,
    doc="Random-hyperplane LSH ANN: 4 md5-derived hyperplanes hash each "
    "vector to a sign-pattern bucket; the query searches only its own "
    "bucket (expected candidates = n / 2^planes), exact cosine ranks "
    "them. The bucket is a PURE per-row expression "
    "(operators/similarity.py::hyperplane_bucket) — one narrow scan, "
    "no per-vector bucket table, no O(n) broadcast; only the 1-row "
    "query bucket broadcasts. The LSH scale path for unclustered "
    "vectors.",
    tags=("similarity", "ann", "lsh"),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.similarity import (
        cosine_from_e12,
        dot_e12,
        hyperplane_bucket,
        sq_norm_e12,
    )

    e = fanout(load(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    bucketed = e.withColumn("bucket", hyperplane_bucket("embedding", _N_PLANES))
    qrow = bucketed.where(F.col("vec_id") == 0).select(
        "bucket", F.col("embedding").alias("q_embedding")
    )
    cand = bucketed.join(F.broadcast(qrow), "bucket")
    scored = cand.select(
        "vec_id",
        cosine_from_e12(
            dot_e12("embedding", "q_embedding"),
            sq_norm_e12("embedding"),
            sq_norm_e12("q_embedding"),
        ).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), "vec_id").limit(10)
