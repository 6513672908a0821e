"""Retrieval post-processing: MMR-diversified top-k (Carbonell &
Goldstein 1998) — the diversification step a RAG read path runs after
ANN candidate generation, picking results that are relevant to the
query but dissimilar to what is already selected.

Two-stage shape (the production retrieval contract): a DISTRIBUTED
candidate stage — brute-force exact cosine top-20 via the e-12
integer dot products of operators/similarity.py (one scan, broadcast
query, TakeOrderedAndProject; identical at any corpus size) and a
distributed 20x20 pairwise-similarity matrix over the broadcast-tiny
candidate set — then a BOUNDED greedy re-rank over those 20 rows
(the candidate count is the contract, never the corpus; every real
reranker is in-memory at this stage). All similarity doubles derive
from exact integer dots, 0.5 is a power of two, and max() over
doubles is order-free — so the greedy walk picks identical ids on
every engine and the DuckDB oracle unrolls the exact 5 selections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.operators.similarity import (
    cosine_from_e12,
    dot_e12,
    sq_norm_e12,
)
from binance_etl_spark.plans.llm_ops import _SQL_DOT
from binance_etl_spark.plans.registry import register

_K_CAND = 20
_K_PICK = 5
_LAMBDA = 0.5  # exactly representable; 0.5*x - 0.5*y is IEEE-exact


def _mmr_step_sql(k: int) -> str:
    prev = f"s{k - 1}" if k > 1 else None
    if k == 1:
        return f"""
    pick1 AS (
      SELECT CAST(1 AS BIGINT) AS pick_rank, vec_id, 0.5 * sim AS mmr
      FROM cand ORDER BY sim DESC, vec_id LIMIT 1
    ), s1 AS (SELECT vec_id FROM pick1)"""
    return f"""
    r{k} AS (
      SELECT c.vec_id,
             0.5 * c.sim - 0.5 * (
               SELECT MAX(p.pairsim) FROM p
               WHERE p.i = c.vec_id
                 AND p.j IN (SELECT vec_id FROM {prev})
             ) AS mmr
      FROM cand c
      WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
    ), pick{k} AS (
      SELECT CAST({k} AS BIGINT) AS pick_rank, vec_id, mmr
      FROM r{k} ORDER BY mmr DESC, vec_id LIMIT 1
    ), s{k} AS (
      SELECT vec_id FROM {prev} UNION ALL SELECT vec_id FROM pick{k}
    )"""


_MMR_ORACLE = (
    f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id, embedding,
             CAST({_SQL_DOT.format(a="embedding", b="q_emb")} AS DOUBLE)
               / sqrt(CAST({_SQL_DOT.format(a="embedding", b="embedding")} AS DOUBLE)
                      * CAST({_SQL_DOT.format(a="q_emb", b="q_emb")} AS DOUBLE)) AS sim
      FROM embeddings, q
    ), cand AS (
      SELECT vec_id, embedding, sim FROM scored
      ORDER BY sim DESC, vec_id LIMIT {_K_CAND}
    ), p AS (
      SELECT a.vec_id AS i, b.vec_id AS j,
             CAST({_SQL_DOT.format(a="a.embedding", b="b.embedding")} AS DOUBLE)
               / sqrt(CAST({_SQL_DOT.format(a="a.embedding", b="a.embedding")} AS DOUBLE)
                      * CAST({_SQL_DOT.format(a="b.embedding", b="b.embedding")} AS DOUBLE)) AS pairsim
      FROM cand a, cand b
    ),"""
    + ",".join(_mmr_step_sql(k) for k in range(1, _K_PICK + 1))
    + f"""
    SELECT pick_rank, vec_id, mmr FROM (
      {" UNION ALL ".join(f"SELECT * FROM pick{k}" for k in range(1, _K_PICK + 1))}
    ) ORDER BY pick_rank
    """
)


def mmr_candidates(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The distributed stage: (lazy candidate plan, materialized
    candidates, pairwise candidate similarity matrix). The lazy plan
    exists so the shape is pinnable (tests/test_plan_pins.py); the
    20-row result is eagerly localCheckpointed so the corpus is
    scanned exactly ONCE — the candidate collect and both sides of
    the pair matrix reuse the checkpointed rows instead of
    re-running the scan."""
    e = fanout(load(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    cand_plan = (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            cosine_from_e12(
                dot_e12("embedding", "q_embedding"),
                sq_norm_e12("embedding"),
                sq_norm_e12("q_embedding"),
            ).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(_K_CAND)
    )
    cand = cand_plan.localCheckpoint(eager=True)  # 20 rows, one scan
    a = cand.select(
        F.col("vec_id").alias("i"), F.col("embedding").alias("ea")
    )
    b = cand.select(
        F.col("vec_id").alias("j"), F.col("embedding").alias("eb")
    )
    pairs = a.crossJoin(F.broadcast(b)).select(
        "i",
        "j",
        cosine_from_e12(
            dot_e12("ea", "eb"), sq_norm_e12("ea"), sq_norm_e12("eb")
        ).alias("pairsim"),
    )
    return cand_plan, cand, pairs


@register(
    "sim_mmr_topk",
    oracle=_MMR_ORACLE,
    doc="Maximal-marginal-relevance diversified retrieval: exact "
    "cosine top-20 candidates (one scan, broadcast query, "
    "TakeOrderedAndProject — the sim_topk_cosine plan), a distributed "
    "20x20 candidate pairwise-cosine matrix, then the greedy "
    "lambda=0.5 MMR walk selecting 5 results (relevance minus max "
    "similarity to the already-picked set; ties to the smaller "
    "vec_id). The re-rank runs over the BOUNDED candidate set — 20 "
    "rows by contract regardless of corpus size — so the collect is "
    "k'-bounded like the k-means centroid collects; all scores "
    "derive from e-12 integer dots and the oracle unrolls the exact "
    "5 picks.",
    tags=("similarity", "rag", "llm"),
)
def sim_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, cand, pairs = mmr_candidates(spark, sf_dir)
    sims = {r["vec_id"]: r["sim"] for r in cand.select("vec_id", "sim").collect()}
    psim = {(r["i"], r["j"]): r["pairsim"] for r in pairs.collect()}

    picks: list[tuple[int, int, float]] = []
    selected: list[int] = []
    remaining = set(sims)
    for rank in range(1, _K_PICK + 1):
        if rank == 1:
            scores = {v: _LAMBDA * sims[v] for v in remaining}
        else:
            scores = {
                v: _LAMBDA * sims[v]
                - _LAMBDA * max(psim[(v, j)] for j in selected)
                for v in remaining
            }
        best = min(scores, key=lambda v: (-scores[v], v))
        picks.append((rank, best, scores[best]))
        selected.append(best)
        remaining.discard(best)
    return spark.createDataFrame(
        picks, "pick_rank bigint, vec_id bigint, mmr double"
    ).orderBy("pick_rank")
