"""Seventh LLM-pipeline batch: chunking, embedding quantization,
temperature sampling, and n-gram novelty.

- text_chunk_overlap: fixed-size overlapping character chunks — the
  RAG / context-window preprocessing step every retrieval corpus runs.
- emb_quantize_int8: symmetric per-vector int8 quantization with exact
  reconstruction-error accounting — the storage-shrink step before
  shipping embeddings to an ANN index.
- sample_temperature: temperature-reweighted per-source sampling
  quotas (the sqrt-smoothing used to rebalance domain mixes).
- text_ngram_novelty: per-doc fraction of 3-gram shingles first
  introduced by that doc — a corpus-order novelty/redundancy signal.

Determinism rules (DuckDB bit-parity): all cross-engine arithmetic is
bigint (floor-e12/e6 fixed point, integer div on non-negative
operands only — truncation semantics then agree everywhere); md5 for
hashing; sqrt/floor are IEEE-correctly-rounded in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.operators.dedup import shingles
from binance_etl_spark.plans.registry import register

# --- text_chunk_overlap ----------------------------------------------

_CHUNK, _STRIDE = 80, 60


@register(
    "text_chunk_overlap",
    oracle=f"""
    SELECT doc_id, chunk_no,
           chunk_no * {_STRIDE} + 1 AS chunk_start,
           substr(text, CAST(chunk_no * {_STRIDE} + 1 AS INT), {_CHUNK}) AS chunk_text,
           CAST(length(substr(text, CAST(chunk_no * {_STRIDE} + 1 AS INT), {_CHUNK})) AS BIGINT) AS chunk_len
    FROM (
      SELECT doc_id, text,
             UNNEST(generate_series(0, greatest(n_chars - 1, 0) // {_STRIDE})) AS chunk_no
      FROM documents
    )
    """,
    doc=f"Overlapping character chunking ({_CHUNK}-char windows, stride "
    f"{_STRIDE}): one row per (doc, chunk) with 1-based start offset — "
    "the RAG/context-window preprocessing step. Pure narrow transform "
    "(sequence + explode + substr, all codegen'd): no shuffle at all, "
    "embarrassingly parallel at any corpus size.",
    tags=("llm", "text", "chunking"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    last = F.expr(f"greatest(n_chars - 1, CAST(0 AS BIGINT)) div {_STRIDE}")
    c = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0).cast("bigint"), last)).alias("chunk_no"),
    )
    chunk = F.expr(f"substr(text, CAST(chunk_no * {_STRIDE} + 1 AS INT), {_CHUNK})")
    return c.select(
        "doc_id",
        "chunk_no",
        (F.col("chunk_no") * _STRIDE + 1).alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
    )


# --- emb_quantize_int8 ----------------------------------------------

# Element magnitudes in e12 fixed-point units; amax floor-guarded to 1
# so all-zero vectors quantize to zeros instead of dividing by zero.
# abs(q) = (a*127) div amax  (<= 127 by construction);
# recon   = (abs(q)*amax) div 127;  err = a - recon  (>= 0).
_SQL_ABS_U = "abs(CAST(floor(CAST(x AS DOUBLE) * 1000000000000) AS BIGINT))"


@register(
    "emb_quantize_int8",
    oracle=f"""
    WITH a AS (
      SELECT vec_id,
             list_transform(embedding, x -> {_SQL_ABS_U}) AS au
      FROM embeddings
    ), m AS (
      SELECT vec_id, au, GREATEST(list_max(au), 1) AS amax FROM a
    )
    SELECT vec_id,
           CAST(len(au) AS BIGINT) AS n_dims,
           amax AS amax_units,
           CAST(list_max(list_transform(au, x -> (x * 127) // amax)) AS BIGINT) AS max_abs_q,
           CAST(list_sum(list_transform(
               au, x -> x - (((x * 127) // amax) * amax) // 127
           )) AS BIGINT) AS sum_abs_err_units
    FROM m
    """,
    doc="Symmetric per-vector int8 quantization (scale = amax/127) "
    "with EXACT reconstruction-error accounting in e12 fixed-point "
    "bigint units (quantization error depends only on magnitudes, so "
    "no sign handling is needed). Narrow per-row array math, fully "
    "codegen'd, zero shuffle — the embedding-compression step before "
    "an ANN index build, at any scale.",
    tags=("llm", "embedding", "quantization"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings"))
    au = F.transform(
        F.col("embedding"),
        lambda x: F.abs(
            F.floor(x.cast("double") * F.lit(1_000_000_000_000.0)).cast("bigint")
        ),
    )
    with_u = e.select("vec_id", au.alias("au"))
    amax = F.greatest(
        F.aggregate(
            F.col("au"),
            F.lit(0).cast("bigint"),
            lambda acc, x: F.greatest(acc, x),
        ),
        F.lit(1).cast("bigint"),
    )
    m = with_u.select("vec_id", "au", amax.alias("amax"))
    aq = "((x * 127) div amax)"
    return m.select(
        "vec_id",
        F.size("au").cast("bigint").alias("n_dims"),
        F.col("amax").alias("amax_units"),
        F.expr(f"aggregate(transform(au, x -> {aq}), CAST(0 AS BIGINT), "
               "(acc, x) -> greatest(acc, x))").alias("max_abs_q"),
        F.expr(
            f"aggregate(transform(au, x -> x - ({aq} * amax) div 127), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("sum_abs_err_units"),
    )


# --- sample_temperature ---------------------------------------------

_TEMP_BUDGET = 10_000


@register(
    "sample_temperature",
    oracle=f"""
    WITH src AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), w AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS weight_units
      FROM src
    ), t AS (
      SELECT CAST(SUM(weight_units) AS BIGINT) AS total FROM w
    )
    SELECT source, n_docs, weight_units,
           (weight_units * 1000000) // total AS share_ppm,
           (weight_units * {_TEMP_BUDGET}) // total AS quota_docs
    FROM w, t
    """,
    doc="Temperature-reweighted sampling quotas (T=2: weight = "
    "sqrt(count), the domain-rebalancing curve): per-source ppm share "
    "and doc quota for a fixed budget, in exact e6 fixed-point bigint "
    "(sqrt is IEEE-correctly-rounded, identical across engines). One "
    "map-side-combinable count shuffle; the grand total is a 1-row "
    "broadcast — no second data shuffle at any corpus size.",
    tags=("llm", "sampling"),
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    w = d.groupBy("source").agg(F.count("*").alias("n_docs")).select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("weight_units"),
    )
    total = w.agg(F.sum("weight_units").alias("total"))
    return w.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "weight_units",
        F.expr("(weight_units * 1000000) div total").alias("share_ppm"),
        F.expr(f"(weight_units * {_TEMP_BUDGET}) div total").alias("quota_docs"),
    )


# --- text_ngram_novelty ---------------------------------------------

_SQL_GRAM3 = "md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])"
_SQL_SHINGLE3 = (
    f"list_distinct(list_transform(generate_series(1, len(t) - 2), i -> {_SQL_GRAM3}))"
)


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, UNNEST({_SQL_SHINGLE3}) AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    ), fst AS (
      SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY g
    )
    SELECT d.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           (CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
            * 1000000) // COUNT(*) AS novelty_ppm
    FROM g d JOIN fst f ON d.g = f.g
    GROUP BY d.doc_id
    """,
    doc="Per-doc 3-gram NOVELTY: fraction (ppm) of a doc's distinct "
    "3-token shingles whose minimum doc_id over the whole corpus is "
    "this doc — i.e. first introduced here. A corpus-order redundancy "
    "signal (low novelty = mostly repeats of earlier material). Two "
    "map-side-combinable shuffles (min per gram, count per doc) plus "
    "one equi-join on the gram hash — O(docs x grams), never O(n^2).",
    tags=("llm", "text", "dedup"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    g = d.select(
        "doc_id",
        F.explode(
            F.transform(shingles(F.col("text"), 3), lambda s: F.md5(s))
        ).alias("g"),
    )
    fst = g.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("bigint")
    return (
        g.join(fst, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            novel.alias("n_novel"),
            F.expr(
                "CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)"
                " * 1000000 div count(*)"
            ).alias("novelty_ppm"),
        )
    )


@register(
    "sample_temperature_apply",
    oracle=f"""
    WITH src AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), w AS (
      SELECT source,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT) AS wu
      FROM src
    ), t AS (
      SELECT CAST(SUM(wu) AS BIGINT) AS total FROM w
    ), quota AS (
      SELECT source, (wu * {_TEMP_BUDGET}) // total AS quota_docs FROM w, t
    ), ranked AS (
      SELECT d.doc_id, d.source, q.quota_docs,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS rn
      FROM documents d JOIN quota q ON d.source = q.source
    )
    SELECT doc_id, source, rn FROM ranked WHERE rn <= quota_docs
    """,
    doc="MIXTURE MATERIALIZATION: applies sample_temperature's "
    "per-source quotas by ranking docs within each source on "
    "md5(doc_id) (a deterministic, resumable permutation — identical "
    "sample on re-run at any cluster size) and keeping rank <= quota. "
    "Quota table is sources-sized (broadcast); one keyed window sort. "
    "Together with sample_temperature this is the domain-rebalancing "
    "pipeline end to end.",
    tags=("llm", "sampling"),
)
def sample_temperature_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    w = d.groupBy("source").agg(F.count("*").alias("n_docs")).select(
        "source",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000)
        .cast("bigint")
        .alias("wu"),
    )
    total = w.agg(F.sum("wu").alias("total"))
    quota = w.crossJoin(F.broadcast(total)).select(
        "source", F.expr(f"(wu * {_TEMP_BUDGET}) div total").alias("quota_docs")
    )
    rank_w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.join(F.broadcast(quota), "source").select(
        "doc_id",
        "source",
        "quota_docs",
        F.row_number().over(rank_w).alias("rn"),
    )
    return ranked.where(F.col("rn") <= F.col("quota_docs")).select(
        "doc_id", "source", "rn"
    )
