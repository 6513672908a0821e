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
    "them. Bucketing is one scan + grouped agg; the bucket join is an "
    "equi-join — the LSH scale path for unclustered vectors.",
    tags=("similarity", "ann", "lsh"),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings"))
    planes = spark.range(_N_PLANES).select(F.col("id").cast("int").alias("plane"))
    dims = spark.range(1, 65).select(F.col("id").cast("int").alias("i"))
    grid = planes.crossJoin(dims).withColumn(
        "w",
        F.expr("instr('0123456789abcdef', substr(md5(plane || '_' || i), 1, 1)) - 8.5"),
    )
    contrib = (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(grid))
        .select(
            "vec_id",
            "plane",
            F.floor(
                F.col("w")
                * F.element_at("embedding", F.col("i")).cast("double")
                * F.lit(1000000000000)
            )
            .cast("bigint")
            .alias("c"),
        )
    )
    bits = (
        contrib.groupBy("plane", "vec_id")
        .agg(F.when(F.sum("c") > 0, 1).otherwise(0).alias("bit"))
    )
    buckets = bits.groupBy("vec_id").agg(
        F.sum(F.expr("shiftleft(bit, plane)")).cast("int").alias("bucket")
    )
    qbucket = buckets.where(F.col("vec_id") == 0).select("bucket")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_embedding"))
    cand = e.join(F.broadcast(buckets), "vec_id").join(F.broadcast(qbucket), "bucket")
    from binance_etl_spark.operators.similarity import cosine_from_e12, dot_e12, sq_norm_e12

    scored = cand.crossJoin(F.broadcast(q)).select(
        "vec_id",
        cosine_from_e12(
            dot_e12("embedding", "q_embedding"),
            sq_norm_e12("embedding"),
            sq_norm_e12("q_embedding"),
        ).alias("sim"),
    )
    return scored.orderBy(F.col("sim").desc(), "vec_id").limit(10)
