"""Retrieval post-processing: MMR-diversified top-k (Carbonell &
Goldstein 1998) — the diversification step a RAG read path runs after
ANN candidate generation, picking results that are relevant to the
query but dissimilar to what is already selected.

Two-stage shape (the production retrieval contract): a DISTRIBUTED
candidate stage — brute-force exact cosine top-20 via the e-12
integer dot products of operators/similarity.py (one scan, broadcast
query, TakeOrderedAndProject; identical at any corpus size) — then a
BOUNDED driver-side re-rank over those 20 rows: the k*k pair-cosine
matrix (400 dots by contract, never corpus-sized) and the greedy MMR
walk both run in-process, because at that size a Spark job's fixed
costs dwarf the arithmetic (every real reranker is in-memory at this
stage). All similarity doubles derive from exact integer dots whose
Python twin is bit-identical (IEEE binary64 everywhere), 0.5 is a
power of two, and max() over doubles is order-free — so the greedy
walk picks identical ids on every engine and the DuckDB oracle
unrolls the exact 5 selections.
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


def mmr_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed candidate stage: exact-cosine top-k via one
    corpus scan, broadcast query row, TakeOrderedAndProject (shape
    pinned in tests/test_plan_pins.py). The registered query collects
    this ONCE and derives the pair matrix from the collected rows —
    the corpus is never re-scanned."""
    e = fanout(load(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    return (
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


def _cosine_e12_py(a: list[float], b: list[float]) -> float:
    """Driver-side twin of cosine_from_e12(dot_e12(...)) — bit-exact:
    Python floats ARE IEEE binary64, floor(x*y*1e12) and the final
    sqrt/divide round identically to the JVM expressions, and the
    integer partial sums are order-free. Used only on the BOUNDED
    k-candidate set (k*k = 400 dots by contract, never corpus-sized),
    where a Spark job's fixed costs dwarf the arithmetic."""
    import math

    dot = sum(math.floor(x * y * 1e12) for x, y in zip(a, b))
    na = sum(math.floor(x * x * 1e12) for x in a)
    nb = sum(math.floor(y * y * 1e12) for y in b)
    return dot / math.sqrt(float(na) * float(nb))


@register(
    "sim_mmr_topk",
    oracle=_MMR_ORACLE,
    doc="Maximal-marginal-relevance diversified retrieval: exact "
    "cosine top-20 candidates (ONE corpus scan, broadcast query, "
    "TakeOrderedAndProject — the sim_topk_cosine plan), then the "
    "greedy lambda=0.5 MMR walk selecting 5 results (relevance minus "
    "max similarity to the already-picked set; ties to the smaller "
    "vec_id). The re-rank — including the k*k pair-cosine matrix — "
    "runs driver-side over the BOUNDED candidate set (20 rows / 400 "
    "dots by contract regardless of corpus size, a k-bounded collect "
    "like the k-means centroid collects) with a bit-identical Python "
    "twin of the e-12 integer-dot arithmetic; the oracle unrolls the "
    "exact 5 picks.",
    tags=("similarity", "rag", "llm"),
)
def sim_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = mmr_candidates(spark, sf_dir)
    rows = cand.collect()  # the ONE corpus-touching job (k rows out)
    sims = {r["vec_id"]: r["sim"] for r in rows}
    emb = {r["vec_id"]: r["embedding"] for r in rows}
    psim = {
        (i, j): _cosine_e12_py(emb[i], emb[j]) for i in emb for j in emb
    }

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
