"""Eleventh LLM-pipeline batch: compressed-domain ANN and sketch-based
frequency estimation — the two remaining "fixed-memory at 100 TB"
primitives the earlier rounds' similarity/text suites did not cover.

- sim_ann_pq: product-quantization (PQ) asymmetric-distance search.
  Vectors are compressed 64 floats -> 8 code bytes (M=8 subspaces x
  K=16 codes); the query scans CODES, not floats, via a precomputed
  ADC (asymmetric distance computation) table. This is the memory
  story IVF alone lacks: at 100 TB of embeddings the float vectors
  no longer fit hot storage, but the 32x-smaller code table does.
- text_heavy_hitters_cms: count-min-sketch frequency estimation.
  The sketch is a FIXED 4x256-cell grid built by one map-side-
  combinable aggregate (256 live groups per executor regardless of
  corpus size) and broadcast for lookups — the standard first pass
  of corpus frequency monitoring when an exact token groupBy would
  shuffle billions of distinct keys.

Parity: PQ distances are e-12 floored integer units per dimension
(sums are order-independent bigint adds — same discipline as
operators/similarity.py); CMS buckets are md5-hex-byte derived, the
engine-portable hash used across the dedup suite. Both oracles
reproduce the arithmetic exactly, so results hash-match bit-for-bit.

Reference parity note: the reference ETL (binance_etl, ~539 LoC) has
no vector or sketch surface; these are north-star extension operators
per BASELINE.json / SURVEY.md §2.12.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.plans.registry import register

# --- sim_ann_pq -------------------------------------------------------

_M = 8  # subspaces
_DSUB = 8  # dims per subspace (embedding dim 64 = _M * _DSUB)
_K = 16  # codes per subspace
_E12 = 1_000_000_000_000.0


def _sq_dist_e12_py(a: list[float], b: list[float]) -> int:
    """Driver-side twin of the engine expression: sum_i
    floor((a_i - b_i)^2 * 1e12). Pure IEEE double ops, so the value is
    bit-identical to what Spark and DuckDB compute for the same floats."""
    return sum(int(math.floor((x - y) * (x - y) * _E12)) for x, y in zip(a, b))


def _pq_sq_dist_e12(sub: Column, code: list[float]) -> Column:
    """Engine expression for the same e-12 squared distance between a
    bound subvector column and one literal code vector."""
    lits = F.array(*[F.lit(float(c)) for c in code])
    term = lambda x, y: F.floor((x - y) * (x - y) * F.lit(_E12))  # noqa: E731
    return F.aggregate(
        F.zip_with(sub, lits, term), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


@register(
    "sim_ann_pq",
    oracle=f"""
    WITH cb AS (  -- codebook: code k = subvectors of vec_id k (k = 1..{_K})
      SELECT vec_id AS k, (i - 1) // {_DSUB} AS m, (i - 1) % {_DSUB} AS j,
             CAST(embedding[i] AS DOUBLE) AS c
      FROM embeddings, UNNEST(generate_series(1, {_M * _DSUB})) AS u(i)
      WHERE vec_id BETWEEN 1 AND {_K}
    ), ex AS (
      SELECT vec_id, (i - 1) // {_DSUB} AS m, (i - 1) % {_DSUB} AS j,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(generate_series(1, {_M * _DSUB})) AS u(i)
    ), d AS (  -- encode: e-12 squared distance vector-subspace -> code
      SELECT ex.vec_id, ex.m, cb.k,
             SUM(CAST(floor((x - c) * (x - c) * 1000000000000) AS BIGINT)) AS dist
      FROM ex JOIN cb ON cb.m = ex.m AND cb.j = ex.j
      GROUP BY ex.vec_id, ex.m, cb.k
    ), enc AS (  -- argmin code per (vector, subspace), ties -> lower k
      SELECT vec_id, m, MIN(dist * {_K} + (k - 1)) % {_K} AS code
      FROM d GROUP BY vec_id, m
    ), q AS (
      SELECT (i - 1) // {_DSUB} AS m, (i - 1) % {_DSUB} AS j,
             CAST(embedding[i] AS DOUBLE) AS qx
      FROM embeddings, UNNEST(generate_series(1, {_M * _DSUB})) AS u(i)
      WHERE vec_id = 0
    ), adc AS (  -- query-side ADC table: M x K distances
      SELECT cb.m, cb.k - 1 AS code,
             SUM(CAST(floor((qx - c) * (qx - c) * 1000000000000) AS BIGINT)) AS ad
      FROM cb JOIN q ON q.m = cb.m AND q.j = cb.j
      GROUP BY cb.m, cb.k
    ), scored AS (
      SELECT e2.vec_id, SUM(ad) AS adc_dist
      FROM enc e2 JOIN adc ON adc.m = e2.m AND adc.code = e2.code
      GROUP BY e2.vec_id
    )
    SELECT s.vec_id, e.label, s.adc_dist
    FROM scored s JOIN embeddings e USING (vec_id)
    ORDER BY adc_dist, vec_id LIMIT 10
    """,
    doc="Product-quantization ANN: 64-float vectors compress to 8 code "
    "bytes (8 subspaces x 16 codes; codebook = the subvectors of vec_id "
    "1..16 — a deterministic stand-in for the per-subspace k-means "
    "sim_kmeans_lloyd demonstrates). The query precomputes an 8x16 ADC "
    "distance table on the driver (pure IEEE arithmetic, bit-identical "
    "to the oracle's SQL) and the scan is then SHUFFLE-FREE: encode + "
    "table-lookup per row, TakeOrderedAndProject top-k. At 100 TB the "
    "codebook is a ~KB broadcast constant and executors touch only the "
    "32x-compressed codes; encode cost O(M*K*dsub) per vector is the "
    "one-time indexing pass.",
    tags=("similarity", "ann"),
)
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings"))

    # Codebook + query: K+1 bounded rows to the driver (same discipline
    # as the k-row centroid pulls in operators/kmeans.py). In production
    # the codebook is trained once and shipped as a broadcast constant.
    small = {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in e.where(F.col("vec_id") <= _K).collect()
    }
    qvec = small[0]
    codebook = [
        [small[k][m * _DSUB : (m + 1) * _DSUB] for k in range(1, _K + 1)]
        for m in range(_M)
    ]
    # ADC table, driver-side: adc[m][k] = e-12 dist(query_sub_m, code_mk).
    adc = [
        [_sq_dist_e12_py(qvec[m * _DSUB : (m + 1) * _DSUB], codebook[m][k]) for k in range(_K)]
        for m in range(_M)
    ]

    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    approx: Column = F.lit(0).cast("long")
    for m in range(_M):
        sub = F.slice(emb_d, m * _DSUB + 1, _DSUB)
        # argmin over K codes, ties to the lower code index: min over
        # (dist * K + k) then % K — dist is non-negative so the packed
        # key preserves ordering.
        enc = F.least(
            *[_pq_sq_dist_e12(sub, codebook[m][k]) * _K + F.lit(k) for k in range(_K)]
        )
        code = enc % _K
        adc_m = F.element_at(
            F.array(*[F.lit(int(v)) for v in adc[m]]), (code + 1).cast("int")
        )
        approx = approx + adc_m
    return (
        e.select("vec_id", "label", approx.alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )


# --- text_heavy_hitters_cms -------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row (one md5 hex byte, no modulo bias)

# Engine-portable md5-byte bucket: first two hex chars of
# md5('<row>#<tok>') as an integer 0..255.
_SQL_BUCKET = (
    "((instr('0123456789abcdef', substr(md5(CAST({d} AS VARCHAR) || '#' || tok), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef', substr(md5(CAST({d} AS VARCHAR) || '#' || tok), 2, 1)) - 1)"
)


def _bucket(d: int) -> Column:
    h = F.md5(F.concat(F.lit(f"{d}#"), F.col("tok")).cast("binary"))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


@register(
    "text_heavy_hitters_cms",
    oracle=f"""
    WITH toks AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ), tot AS (SELECT COUNT(*) AS n FROM toks),
    cells AS (  -- the 4x256 sketch: counter per (row, bucket)
      SELECT d, {_SQL_BUCKET.format(d="d")} AS bucket, COUNT(*) AS c
      FROM toks, UNNEST(generate_series(0, {_CMS_D - 1})) AS u(d)
      GROUP BY 1, 2
    ), cand AS (SELECT DISTINCT tok FROM toks),
    est AS (  -- point query: min over the D counters the token hits
      SELECT tok, MIN(c) AS est
      FROM (SELECT tok, d, {_SQL_BUCKET.format(d="d")} AS bucket
            FROM cand, UNNEST(generate_series(0, {_CMS_D - 1})) AS u(d)) j
      JOIN cells USING (d, bucket)
      GROUP BY tok
    )
    SELECT tok, est FROM est, tot
    WHERE est * 100 >= n
    ORDER BY est DESC, tok
    """,
    doc="Count-min-sketch heavy hitters: the sketch is a FIXED 4x256 "
    "grid built by one map-side-combinable aggregate (partial aggs hold "
    "at most 1024 cells per executor no matter the corpus size, vs the "
    "unbounded hash table of an exact token groupBy), then broadcast "
    "(~KB) to estimate candidate frequencies with zero joins against "
    "the corpus. Estimates are deterministic overcounts (est >= true, "
    "tested in tests/test_llm_ops11.py); returned tokens are those "
    "estimated at >= 1% of all token occurrences. At 100 TB the "
    "candidate list would come from a per-partition space-saving pass; "
    "here it is the distinct-token set, which keeps the oracle exact.",
    tags=("text", "sketch"),
)
def text_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))

    # Sketch build: explode each token into its D (row, bucket) cells —
    # the groupBy has at most D*W live groups, so partial aggregation
    # collapses everything map-side; the shuffle moves <= 1024 rows.
    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(dd).alias("d"), _bucket(dd).alias("bucket"))
                        for dd in range(_CMS_D)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.d", "cell.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = toks.agg(F.count(F.lit(1)).alias("n"))

    cand = toks.distinct()
    probes = cand.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dd).alias("d"), _bucket(dd).alias("bucket"))
                    for dd in range(_CMS_D)
                ]
            )
        ).alias("cell"),
    ).select("tok", "cell.d", "cell.bucket")
    est = (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("tok")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.crossJoin(F.broadcast(total))  # 1-row total, stats-broadcast pattern
        .where(F.col("est") * 100 >= F.col("n"))
        .select("tok", "est")
        .orderBy(F.desc("est"), "tok")
    )
