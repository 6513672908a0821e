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
from binance_etl_spark.plans.registry import register, register_sql

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


def _pq_sq_dist_e12(sub: Column, code: Column) -> Column:
    """Engine expression for the same e-12 squared distance between a
    bound subvector column and one code vector (array<double>)."""
    term = lambda x, y: F.floor((x - y) * (x - y) * F.lit(_E12))  # noqa: E731
    return F.aggregate(
        F.zip_with(sub, code, term), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _pq_setup(e: DataFrame):
    """Driver-side codebook + query ADC table, or None when the corpus
    lacks the query vector / full codebook (empty or pruned input).

    K+1 bounded rows to the driver (same discipline as the k-row
    centroid pulls in operators/kmeans.py). In production the codebook
    is trained once and shipped as a broadcast constant."""
    small = {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in e.where(F.col("vec_id") <= _K).collect()
    }
    if set(range(_K + 1)) - set(small):
        return None
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
    return codebook, adc


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
      SELECT e2.vec_id, CAST(SUM(ad) AS BIGINT) AS adc_dist
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
    setup = _pq_setup(e)
    if setup is None:
        # schema-stable empty result, not a KeyError
        return e.select(
            "vec_id", "label", F.lit(None).cast("long").alias("adc_dist")
        ).limit(0)
    codebook, adc = setup

    return (
        e.select("vec_id", "label", _pq_adc_col(codebook, adc).alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )


def _sql_double_array(vals) -> str:
    """array(..D, ..) literal text — repr() is the shortest round-trip
    decimal, so the parsed double is bit-identical to the Python
    float. ONE F.expr parse instead of len(vals) py4j lit() calls
    (measured: 1,000 lits cost ~0.7s of driver time; the parse, 3ms)."""
    return "array(" + ",".join(repr(float(v)) + "D" for v in vals) + ")"


def _sql_long_array(vals) -> str:
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def _pq_code_cols(codebook) -> list[Column]:
    """Per-subspace PQ code (argmin over the codebook, ties to the
    lower code index) as M long columns over `embedding` — the encode
    half of PQ, shared by the inline ADC scan (sim_ann_pq) and the
    persistent index build (plans/ann_index.py)."""
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    codes: list[Column] = []
    for m in range(_M):
        sub = F.slice(emb_d, m * _DSUB + 1, _DSUB)
        # One distance LAMBDA evaluated over the literal codebook array
        # (array<array<double>>) — a single expression subtree instead
        # of K inlined copies, which keeps analysis/codegen cost flat in
        # K (measured: 16 inlined copies cost ~5s of planning).
        cb_m = F.expr(
            "array("
            + ",".join(_sql_double_array(code) for code in codebook[m])
            + ")"
        )
        dists = F.transform(cb_m, lambda code: _pq_sq_dist_e12(sub, code))
        # argmin over K codes, ties to the lower code index: min over
        # (dist * K + k) then % K — dist is non-negative so the packed
        # key preserves ordering.
        enc = F.array_min(
            F.zip_with(
                dists,
                F.sequence(F.lit(0).cast("long"), F.lit(_K - 1).cast("long")),
                lambda dv, k: dv * _K + k,
            )
        )
        codes.append(enc % _K)
    return codes


def _pq_adc_col(codebook, adc) -> Column:
    """encode-and-lookup as ONE codegen'd column over `embedding`:
    per subspace, argmin over the literal codebook (ties to the lower
    code), then the query's precomputed ADC entry for that code."""
    approx: Column = F.lit(0).cast("long")
    for m, code in enumerate(_pq_code_cols(codebook)):
        adc_m = F.element_at(
            F.expr(_sql_long_array(adc[m])), (code + 1).cast("int")
        )
        approx = approx + adc_m
    return approx



@register(
    "sim_ann_ivfpq",
    oracle=f"""
    WITH cb AS (  -- PQ codebook: code k = subvectors of vec_id k (k = 1..{_K})
      SELECT vec_id AS k, (i - 1) // {_DSUB} AS m, (i - 1) % {_DSUB} AS j,
             CAST(embedding[i] AS DOUBLE) AS c
      FROM embeddings, UNNEST(generate_series(1, {_M * _DSUB})) AS u(i)
      WHERE vec_id BETWEEN 1 AND {_K}
    ), qf AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    qpos AS (
      SELECT UNNEST(generate_series(1, len(q_emb))) AS pos, q_emb FROM qf
    ), qvals AS (SELECT pos, q_emb[pos] AS qval FROM qpos),
    ivf_centroids AS (  -- coarse quantizer: per-label exact e-12 centroid sums
      SELECT label, pos, SUM(v_e12) AS c_e12, COUNT(*) AS n FROM (
        SELECT label, i AS pos,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000000) AS BIGINT) AS v_e12
        FROM (SELECT label, embedding,
                     UNNEST(generate_series(1, len(embedding))) AS i
              FROM embeddings)
      ) GROUP BY label, pos
    ), list_scores AS (
      SELECT label,
             CAST(SUM(CAST(floor(CAST(qval AS DOUBLE) * CAST(c_e12 AS DOUBLE)) AS BIGINT))
                  AS DOUBLE) / MAX(n) AS list_score
      FROM ivf_centroids JOIN qvals USING (pos) GROUP BY label
    ), top_lists AS (
      SELECT label FROM list_scores ORDER BY list_score DESC, label LIMIT 2
    ), cand AS (  -- IVF prune: only vectors in the probed lists
      SELECT e.vec_id, e.label, e.embedding
      FROM embeddings e JOIN top_lists USING (label)
    ), ex AS (
      SELECT vec_id, (i - 1) // {_DSUB} AS m, (i - 1) % {_DSUB} AS j,
             CAST(embedding[i] AS DOUBLE) AS x
      FROM cand, UNNEST(generate_series(1, {_M * _DSUB})) AS u(i)
    ), d AS (  -- PQ encode candidates: e-12 sq dist subvector -> code
      SELECT ex.vec_id, ex.m, cb.k,
             SUM(CAST(floor((x - c) * (x - c) * 1000000000000) AS BIGINT)) AS dist
      FROM ex JOIN cb ON cb.m = ex.m AND cb.j = ex.j
      GROUP BY ex.vec_id, ex.m, cb.k
    ), enc AS (
      SELECT vec_id, m, MIN(dist * {_K} + (k - 1)) % {_K} AS code
      FROM d GROUP BY vec_id, m
    ), qsub AS (
      SELECT (i - 1) // {_DSUB} AS m, (i - 1) % {_DSUB} AS j,
             CAST(q_emb[i] AS DOUBLE) AS qx
      FROM qf, UNNEST(generate_series(1, {_M * _DSUB})) AS u(i)
    ), adc AS (  -- query-side ADC table: M x K distances
      SELECT cb.m, cb.k - 1 AS code,
             SUM(CAST(floor((qx - c) * (qx - c) * 1000000000000) AS BIGINT)) AS ad
      FROM cb JOIN qsub ON qsub.m = cb.m AND qsub.j = cb.j
      GROUP BY cb.m, cb.k
    ), scored AS (
      SELECT e2.vec_id, CAST(SUM(ad) AS BIGINT) AS adc_dist
      FROM enc e2 JOIN adc ON adc.m = e2.m AND adc.code = e2.code
      GROUP BY e2.vec_id
    )
    SELECT s.vec_id, c.label, s.adc_dist
    FROM scored s JOIN cand c USING (vec_id)
    ORDER BY adc_dist, vec_id LIMIT 10
    """,
    doc="IVFPQ composite ANN — the production shape (FAISS IVFPQ): the "
    "coarse quantizer (per-label centroids, operators/similarity.py::"
    "ivf_top_lists) prunes to nprobe=2 lists, and candidates in those "
    "lists are scored by PQ asymmetric distance over their 8-byte "
    "codes — never by raw floats. At 100 TB this composes the two "
    "scale levers: IVF cuts the candidate set by n_lists/nprobe, PQ "
    "cuts bytes-per-candidate 32x, and the scan stays shuffle-free "
    "codegen ending in TakeOrderedAndProject (the only exchanges are "
    "the centroid build's bounded agg and the broadcast of nprobe "
    "list ids). Same e-12 integer arithmetic as sim_ann_pq, so the "
    "oracle reproduces it bit-for-bit.",
    tags=("similarity", "ann"),
)
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import similarity as S

    e = fanout(load(spark, sf_dir, "embeddings"))
    setup = _pq_setup(e)
    if setup is None:
        return e.select(
            "vec_id", "label", F.lit(None).cast("long").alias("adc_dist")
        ).limit(0)
    codebook, adc = setup
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_embedding"))
    centroids = S.ivf_centroids_e12(e, "label")
    top_lists = S.ivf_top_lists(centroids, q, "label", nprobe=2)
    cand = e.join(F.broadcast(top_lists.select("label")), "label")
    return (
        cand.select("vec_id", "label", _pq_adc_col(codebook, adc).alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )


# --- text_heavy_hitters_cms -------------------------------------------

from binance_etl_spark.operators.text import CMS_D as _CMS_D  # noqa: E402
from binance_etl_spark.operators.text import cms_cells, cms_estimate  # noqa: E402

# Engine-portable md5-byte bucket: first two hex chars of
# md5('<row>#<tok>') as an integer 0..255.
_SQL_BUCKET = (
    "((instr('0123456789abcdef', substr(md5(CAST({d} AS VARCHAR) || '#' || tok), 1, 1)) - 1) * 16"
    " + instr('0123456789abcdef', substr(md5(CAST({d} AS VARCHAR) || '#' || tok), 2, 1)) - 1)"
)


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
    cells = cms_cells(toks)
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(toks.distinct(), cells)
    return (
        est.crossJoin(F.broadcast(total))  # 1-row total, stats-broadcast pattern
        .where(F.col("est") * 100 >= F.col("n"))
        .select("tok", "est")
        .orderBy(F.desc("est"), "tok")
    )


# --- er_resolve_e2e ----------------------------------------------------
# Entity resolution end-to-end, shared-text SQL (the strongest parity
# statement): derive two deterministic dirty variants per master part
# name, block candidates on (4-char prefix, +-3 length band), verify
# with levenshtein <= 3, pick each record's best master by
# (distance, ent_id), and survive into golden records with merge
# counts. Match-to-master shape; general transitive clustering is
# dedup_cluster_cc (plans/llm_ops3.py).

register_sql(
    "er_resolve_e2e",
    """
    WITH master AS (
        -- canonicalize first: the fixture (like most real catalogs) has
        -- massively duplicated names, so the match side is the DISTINCT
        -- name table, not raw rows — this is what keeps block sizes
        -- O(distinct names), not O(rows).
        SELECT p_name, MIN(p_partkey) AS ent_id, COUNT(*) AS n_master_rows
        FROM part GROUP BY p_name
    ),
    dirty AS (
        SELECT p_partkey * 10 + 1 AS rec_id,
               CONCAT(SUBSTRING(p_name, 1, LENGTH(p_name) - 1), '_') AS rec_name
        FROM part
        UNION ALL
        SELECT p_partkey * 10 + 2, CONCAT(p_name, ' xx') FROM part
    ),
    cand AS (
        SELECT m.ent_id, d.rec_id, LEVENSHTEIN(m.p_name, d.rec_name) AS dist
        FROM master m JOIN dirty d
          ON SUBSTRING(m.p_name, 1, 4) = SUBSTRING(d.rec_name, 1, 4)
         AND LENGTH(m.p_name) BETWEEN LENGTH(d.rec_name) - 3
                                  AND LENGTH(d.rec_name) + 3
        WHERE LEVENSHTEIN(m.p_name, d.rec_name) <= 3
    ),
    best AS (
        SELECT ent_id, rec_id, dist,
               ROW_NUMBER() OVER (PARTITION BY rec_id ORDER BY dist, ent_id) AS rn
        FROM cand
    )
    SELECT ent_id,
           COUNT(*) AS n_merged,
           CAST(SUM(dist) AS BIGINT) AS sum_dist,
           MIN(rec_id) AS min_rec,
           MAX(rec_id) AS max_rec
    FROM best WHERE rn = 1
    GROUP BY ent_id
    ORDER BY ent_id
    """,
    doc="Entity-resolution composite: canonical master extraction "
    "(GROUP BY name) -> dirty-record generation -> blocked candidate "
    "join (equi on prefix + length band, never O(n^2) and never "
    "rows x rows: the match side is the distinct-name table) -> "
    "edit-distance verify on candidates only -> best-match "
    "survivorship (ROW_NUMBER per record) -> golden-record merge "
    "audit. One Catalyst plan, shared-text on both engines; the "
    "blocking key is the shuffle key, so scale behavior is that of "
    "dedup_minhash_lsh's band join, and the small canonical side is "
    "broadcast by AQE.",
    tags=("er", "llm", "e2e"),
)


# --- sim_ann_recall ----------------------------------------------------

_SQL_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1000000000000) AS BIGINT)))"
    " AS BIGINT)"
)


@register(
    "sim_ann_recall",
    oracle=f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    exact AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               CAST({_SQL_DOT.format(a="embedding", b="q_emb")} AS DOUBLE)
                 / sqrt(CAST({_SQL_DOT.format(a="embedding", b="embedding")} AS DOUBLE)
                        * CAST({_SQL_DOT.format(a="q_emb", b="q_emb")} AS DOUBLE)) AS sim
        FROM embeddings, q
      ) ORDER BY sim DESC, vec_id LIMIT 10
    ),
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
    ), approx AS (
      SELECT vec_id FROM (
        SELECT e.vec_id,
               CAST({_SQL_DOT.format(a="e.embedding", b="q_emb")} AS DOUBLE)
                 / sqrt(CAST({_SQL_DOT.format(a="e.embedding", b="e.embedding")} AS DOUBLE)
                        * CAST({_SQL_DOT.format(a="q_emb", b="q_emb")} AS DOUBLE)) AS sim
        FROM embeddings e JOIN top_lists USING (label), q
      ) ORDER BY sim DESC, vec_id LIMIT 10
    )
    SELECT CAST(10 AS INT) AS k,
           COUNT(*) AS n_hit,
           CAST(COUNT(*) * 10 AS BIGINT) AS recall_pct
    FROM exact JOIN approx USING (vec_id)
    """,
    doc="ANN quality evaluation as a query: recall@10 of the IVF probe "
    "(nprobe=2) against the exact brute-force ranking — approximate "
    "retrieval ships with a recall gate, and this runs that gate as one "
    "plan (both rankings + the intersection). At scale the exact arm "
    "runs on a sampled query set, the approx arm on the full index; "
    "both sides here reuse the registered operators unchanged.",
    tags=("similarity", "ann", "eval"),
)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import similarity as S

    e = fanout(load(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_embedding"))
    exact = S.cosine_topk(e, q, k=10).select("vec_id")
    approx = S.ivf_probe(
        e, S.ivf_centroids_e12(e, "label"), q, list_col="label", nprobe=2, k=10
    ).select("vec_id")
    return (
        exact.join(approx, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .select(
            F.lit(10).cast("int").alias("k"),
            "n_hit",
            (F.col("n_hit") * 10).cast("bigint").alias("recall_pct"),
        )
    )


# --- sample_quality_calibrated -----------------------------------------


@register(
    "sample_quality_calibrated",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS score
      FROM documents
    ), r AS (
      SELECT doc_id, source, score,
             percent_rank() OVER (PARTITION BY source ORDER BY score, doc_id) AS pr
      FROM s
    )
    SELECT source,
           COUNT(*) AS n_kept,
           MIN(score) AS threshold_score,
           MIN(doc_id) AS min_kept_id,
           MAX(doc_id) AS max_kept_id
    FROM r WHERE pr >= 0.5
    GROUP BY source ORDER BY source
    """,
    doc="Per-domain quality-score calibration: rank-normalize the score "
    "WITHIN each source (percent_rank over a deterministic total order) "
    "and keep each domain's top half — absolute-threshold filtering "
    "lets high-resource domains drown out the rest; rank calibration "
    "gives every domain the same survival rate and surfaces the induced "
    "per-domain absolute threshold (threshold_score differs per "
    "source). One window pass partitioned by source (the shuffle key), "
    "then a grouped audit.",
    tags=("sampling", "llm"),
)
def sample_quality_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load(spark, sf_dir, "documents")
    sel = d.select(
        "doc_id",
        "source",
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint").alias("score"),
    )
    pr = F.percent_rank().over(W.partitionBy("source").orderBy("score", "doc_id"))
    kept = sel.withColumn("pr", pr).where(F.col("pr") >= 0.5)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("score").alias("threshold_score"),
            F.min("doc_id").alias("min_kept_id"),
            F.max("doc_id").alias("max_kept_id"),
        )
        .orderBy("source")
    )


# --- sim_ann_recall_learned --------------------------------------------
#
# The recall gate above (sim_ann_recall) probes the PRECOMPUTED label
# partition — and honestly reports ~20-30% recall on the synthetic
# corpus, because those labels are not cosine-coherent neighborhoods.
# Production IVF does not inherit its lists: it LEARNS them (k-means
# coarse quantizer, the FAISS IVF training step) and probes the lists
# nearest the query. This query runs that full learned pipeline —
# deterministic Lloyd fit (operators/kmeans.py, k=8, 3 iters), classic
# nearest-centroid list selection (floor-e12 L2, ties to lower cid,
# nprobe=2), exact cosine rescore of the probed members — and reports
# recall@10 against brute force: 100% on the same corpus where
# label-lists cap out near 20%. The oracle unrolls the identical fit
# in DuckDB SQL (llm_ops4._kmeans_iter_sql), so even the iterative
# training is exact-parity checked.
#
# Scale: fit is the sim_kmeans_lloyd plan (driver-side k x dim
# centroids = implicit broadcast, shuffle-free assignment, one
# map-side-combinable update per iteration); list selection is a
# driver-side k-row computation; the probe scans only the nprobe
# lists' members (partition-prunable when the corpus is laid out by
# cluster id).

def _ivf_learned_oracle() -> str:
    from binance_etl_spark.plans.llm_ops4 import _kmeans_iter_sql

    return f"""
    WITH e AS (
      SELECT vec_id, embedding AS emb FROM embeddings
    ), c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             list_transform(emb, x -> CAST(x AS DOUBLE)) AS c
      FROM e ORDER BY vec_id LIMIT 8
    ), {_kmeans_iter_sql(1)}, {_kmeans_iter_sql(2)}, {_kmeans_iter_sql(3)},
    afinal AS (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM (
        SELECT e.vec_id, c.cid,
               list_sum(list_transform(generate_series(1, len(e.emb)), i ->
                 CAST(floor((CAST(e.emb[i] AS DOUBLE) - c.c[i])
                            * (CAST(e.emb[i] AS DOUBLE) - c.c[i]) * 1e12) AS BIGINT))) AS d
        FROM e CROSS JOIN c3 c
      )
    ), q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    qd AS (
      SELECT c.cid,
             list_sum(list_transform(generate_series(1, len(q_emb)), i ->
               CAST(floor((CAST(q_emb[i] AS DOUBLE) - c.c[i])
                          * (CAST(q_emb[i] AS DOUBLE) - c.c[i]) * 1e12) AS BIGINT))) AS d
      FROM c3 c, q
    ), top_lists AS (SELECT cid FROM qd ORDER BY d, cid LIMIT 2),
    members AS (
      SELECT vec_id FROM afinal
      WHERE rn = 1 AND cid IN (SELECT cid FROM top_lists)
    ),
    exact AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               CAST({_SQL_DOT.format(a="embedding", b="q_emb")} AS DOUBLE)
                 / sqrt(CAST({_SQL_DOT.format(a="embedding", b="embedding")} AS DOUBLE)
                        * CAST({_SQL_DOT.format(a="q_emb", b="q_emb")} AS DOUBLE)) AS sim
        FROM embeddings, q
      ) ORDER BY sim DESC, vec_id LIMIT 10
    ),
    approx AS (
      SELECT vec_id FROM (
        SELECT e2.vec_id,
               CAST({_SQL_DOT.format(a="e2.embedding", b="q_emb")} AS DOUBLE)
                 / sqrt(CAST({_SQL_DOT.format(a="e2.embedding", b="e2.embedding")} AS DOUBLE)
                        * CAST({_SQL_DOT.format(a="q_emb", b="q_emb")} AS DOUBLE)) AS sim
        FROM embeddings e2 JOIN members m ON e2.vec_id = m.vec_id, q
      ) ORDER BY sim DESC, vec_id LIMIT 10
    )
    SELECT CAST(10 AS INT) AS k,
           COUNT(*) AS n_hit,
           CAST(COUNT(*) * 10 AS BIGINT) AS recall_pct
    FROM exact JOIN approx USING (vec_id)
    """


@register(
    "sim_ann_recall_learned",
    oracle=_ivf_learned_oracle(),
    doc="Recall@10 of IVF with LEARNED lists: deterministic k-means "
    "coarse quantizer (k=8, 3 Lloyd iters, the sim_kmeans_lloyd plan "
    "— broadcast centroids, shuffle-free assignment, map-side-"
    "combinable update), classic nearest-centroid probe (nprobe=2, "
    "floor-e12 L2, ties to lower cid), exact cosine rescore of probed "
    "members only. Complements sim_ann_recall (precomputed-label "
    "lists, ~20-30% on this corpus): learning the quantizer recovers "
    "100% — the gate pair shows recall is a property of the LIST "
    "ASSIGNMENT, which is exactly what the gate exists to measure. "
    "Oracle unrolls the identical fit in SQL, so the iterative "
    "training is exact-parity checked end to end.",
    tags=("similarity", "ann", "eval", "llm", "iterative"),
)
def sim_ann_recall_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import similarity as S
    from binance_etl_spark.operators.kmeans import kmeans_fit

    # persist for the fit's 4 driver actions + the 3 downstream scans
    # (2000 rows x 64 floats at sf1 — bounded by the corpus, and the
    # fit re-reads it every Lloyd iteration otherwise). Width 8: the
    # per-iteration actions pay per-task scheduling overhead, so a
    # small corpus should not fan to every core (at real scale the
    # source arrives already partitioned and fanout is a no-op cap)
    e = fanout(load(spark, sf_dir, "embeddings"), 8).persist()
    try:
        centroids, assign = kmeans_fit(e, "embedding", "vec_id", k=8, n_iter=3)

        # single bounded collect: THE query vector (1 row, 64 floats)
        qv = [
            float(x)
            for x in e.where(F.col("vec_id") == 0)
            .select("embedding")
            .first()[0]
        ]
    finally:
        # release after the fit's eager actions — a leaked cache entry
        # per invocation starves the block manager in long sessions;
        # the returned plan's bounded re-scans are cheaper than that
        e.unpersist(False)

    def _sqd_e12(c: list[float]) -> int:
        return sum(math.floor((a - b) * (a - b) * 1e12) for a, b in zip(qv, c))

    top = sorted(range(len(centroids)), key=lambda i: (_sqd_e12(centroids[i]), i))[:2]

    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_embedding"))
    exact = S.cosine_topk(e, q, k=10).select("vec_id")
    probed = e.join(
        assign.where(F.col("cluster").isin([int(t) for t in top])).select("vec_id"),
        "vec_id",
        "left_semi",
    )
    approx = S.cosine_topk(probed, q, k=10).select("vec_id")
    return (
        exact.join(approx, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .select(
            F.lit(10).cast("int").alias("k"),
            "n_hit",
            (F.col("n_hit") * 10).cast("bigint").alias("recall_pct"),
        )
    )
