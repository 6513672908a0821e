"""Eighth LLM-pipeline batch: keyword retrieval and data profiling.

- text_inverted_index: term -> (df, cf, max_tf, first_doc) posting
  statistics — the index-build step behind keyword search, idf
  weighting, and stopword discovery.
- text_bm25_topk: BM25-family keyword retrieval over the corpus for a
  fixed query, integer fixed-point throughout (log-free rational idf)
  so DuckDB agrees bit-for-bit.
- profile_columns: one-scan data-quality profile (null/distinct/
  min/max per column, long format) — the "ANALYZE TABLE"-style report
  every ingest pipeline runs before training.
- rag_retrieve_e2e: the retrieval-augmented-generation read path as
  ONE Catalyst plan: exact cosine top-k over embeddings -> join the
  matching documents -> overlapping context-window chunks, ranked.

Determinism rules (DuckDB bit-parity): cross-engine arithmetic is
bigint fixed point (floor-e6/e12); integer div only on non-negative
operands (truncation semantics agree); doubles appear only via IEEE
ops both engines round identically (multiply, sqrt, min/max).

Reference parity note: the reference engine (anselumana/binance-etl)
has no text/retrieval surface at all — these are the north-star
extension operators (SURVEY.md §2.12) a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from binance_etl_spark.catalog import fanout, load
from binance_etl_spark.operators import similarity as S
from binance_etl_spark.plans.registry import register

# --- text_inverted_index ---------------------------------------------


@register(
    "text_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT term, doc_id, COUNT(*) AS tf
      FROM tok WHERE term <> '' GROUP BY term, doc_id
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS cf,
           CAST(MAX(tf) AS BIGINT) AS max_tf,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM tf GROUP BY term
    """,
    doc="Inverted-index posting statistics: per term, document "
    "frequency, collection frequency, max in-doc tf, first posting. "
    "Two-phase aggregation — (term, doc) partial counts then term "
    "rollup — both map-side combinable; the only shuffles are on the "
    "(term, doc) and term keys, so the plan is the one you'd run on a "
    "100 TB corpus (vocabulary is tiny next to the token stream).",
    tags=("llm", "text", "retrieval"),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).where(
        F.col("term") != ""
    )
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    return tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.max("tf").cast("bigint").alias("max_tf"),
        F.min("doc_id").cast("bigint").alias("first_doc_id"),
    )


# --- text_bm25_topk --------------------------------------------------

# k1 = 1.2, b = 0.75 in e3 fixed point; rational (log-free) idf:
# idf_e6 = (2(N-df)+1) * 1e6 div (2df+1) — the BM25 odds ratio without
# the log, monotone in the same direction and integer-exact.
_BM25_TERMS = ("spark", "hash", "window")
_BM25_K = 15
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl, text FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs, (SUM(dl) * 1000) // COUNT(*) AS avgdl_e3
      FROM docs
    ), tf AS (
      SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
        SELECT doc_id, dl, UNNEST(string_split(text, ' ')) AS term FROM docs
      ) WHERE term IN ({_BM25_TERMS_SQL})
      GROUP BY doc_id, dl, term
    ), df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             ((tf.tf * 2200 * 1000000) //
                (tf.tf * 1000 + (1200 * (250 + (750 * tf.dl * 1000) // s.avgdl_e3)) // 1000)
              * ((2 * (s.n_docs - df.df) + 1) * 1000000 // (2 * df.df + 1))
             ) // 1000000 AS contrib_e6
      FROM tf JOIN df USING (term), stats s
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(SUM(contrib_e6) AS BIGINT) AS score_e6,
           CAST(COUNT(*) AS BIGINT) AS n_hit_terms
    FROM scored GROUP BY doc_id
    ORDER BY score_e6 DESC, doc_id LIMIT {_BM25_K}
    """,
    doc="BM25 keyword retrieval (k1=1.2, b=0.75, rational idf) for a "
    f"fixed {len(_BM25_TERMS)}-term query, top-{_BM25_K}. The token "
    "explode is filtered to query terms BEFORE any shuffle (a narrow "
    "predicate on the exploded stream), so only matching postings move; "
    "corpus stats are a 1-row broadcast, per-term df a terms-sized "
    "broadcast, and the ranking a TakeOrderedAndProject k-merge. At "
    "100 TB this is one corpus scan with near-zero shuffle volume.",
    tags=("llm", "text", "retrieval"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fanout(load(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    docs = d.select("doc_id", "toks", F.size("toks").cast("bigint").alias("dl"))
    stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.expr("(SUM(dl) * 1000) div COUNT(*)").alias("avgdl_e3"),
    )
    tf = (
        docs.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                "((tf * 2200 * 1000000) div"
                " (tf * 1000 + (1200 * (250 + (750 * dl * 1000) div avgdl_e3)) div 1000)"
                " * ((2 * (n_docs - df) + 1) * 1000000 div (2 * df + 1))"
                ") div 1000000"
            ).alias("contrib_e6"),
        )
    )
    ranked = scored.groupBy("doc_id").agg(
        F.sum("contrib_e6").cast("bigint").alias("score_e6"),
        F.count("*").cast("bigint").alias("n_hit_terms"),
    )
    return ranked.select(F.col("doc_id").cast("bigint"), "score_e6", "n_hit_terms").orderBy(
        F.col("score_e6").desc(), "doc_id"
    ).limit(_BM25_K)


# --- profile_columns -------------------------------------------------

_PROF_NUM = ("l_quantity", "l_extendedprice", "l_discount")
_PROF_STR = ("l_returnflag", "l_linestatus")


def _prof_num_aggs(c: str) -> list:
    return [
        F.count(c).cast("bigint").alias(f"{c}__nn"),
        F.countDistinct(c).cast("bigint").alias(f"{c}__nd"),
        F.floor(F.min(c) * 1_000_000).cast("bigint").alias(f"{c}__min_u"),
        F.floor(F.max(c) * 1_000_000).cast("bigint").alias(f"{c}__max_u"),
    ]


def _prof_str_aggs(c: str) -> list:
    return [
        F.count(c).cast("bigint").alias(f"{c}__nn"),
        F.countDistinct(c).cast("bigint").alias(f"{c}__nd"),
        F.min(c).alias(f"{c}__min_s"),
        F.max(c).alias(f"{c}__max_s"),
    ]


def _prof_num_aggs_hll(c: str) -> list:
    out = _prof_num_aggs(c)
    out[1] = F.approx_count_distinct(c, rsd=0.02).cast("bigint").alias(f"{c}__nd")
    return out


def _prof_str_aggs_hll(c: str) -> list:
    out = _prof_str_aggs(c)
    out[1] = F.approx_count_distinct(c, rsd=0.02).cast("bigint").alias(f"{c}__nd")
    return out


def _prof_oracle() -> str:
    parts = []
    for c in _PROF_NUM:
        parts.append(
            f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COUNT({c}) AS BIGINT) AS n_nonnull,"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" CAST(floor(MIN({c}) * 1000000) AS BIGINT) AS min_units,"
            f" CAST(floor(MAX({c}) * 1000000) AS BIGINT) AS max_units,"
            f" CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
            f" FROM lineitem"
        )
    for c in _PROF_STR:
        parts.append(
            f"SELECT '{c}', CAST(COUNT(*) AS BIGINT), CAST(COUNT({c}) AS BIGINT),"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT),"
            f" CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), MIN({c}), MAX({c})"
            f" FROM lineitem"
        )
    return " UNION ALL ".join(parts)


@register(
    "profile_columns",
    oracle=_prof_oracle(),
    doc="One-scan column profile of lineitem (non-null count, EXACT "
    "distinct count, min/max — e6 fixed-point units for numerics, raw "
    "for strings) unpivoted to one row per column. Exact multi-column "
    "DISTINCT uses Catalyst's Expand (one scan, data duplicated per "
    "distinct aggregate) — the right call up to moderate column "
    "counts; the 100 TB wide-table variant swaps count_distinct for "
    "approx_count_distinct (HLL, no Expand) which this engine also "
    "ships (agg_approx_distinct). Profiling gates every corpus "
    "ingest: schema drift, null storms, and cardinality explosions "
    "surface here before they poison a training run.",
    tags=("llm", "quality", "profiling"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fanout: the Expand multiplies rows 6x BEFORE the partial agg, so
    # an under-partitioned local scan must be spread first (no-op on a
    # naturally many-partitioned big input).
    return _profile_plan(spark, sf_dir, exact=True)


def _profile_plan(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    li = fanout(load(spark, sf_dir, "lineitem"))
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in _PROF_NUM:
        aggs += _prof_num_aggs(c) if exact else _prof_num_aggs_hll(c)
    for c in _PROF_STR:
        aggs += _prof_str_aggs(c) if exact else _prof_str_aggs_hll(c)
    one = li.agg(*aggs)
    stack_args = []
    for c in _PROF_NUM:
        stack_args.append(
            f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__min_u`, `{c}__max_u`,"
            f" CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in _PROF_STR:
        stack_args.append(
            f"'{c}', `{c}__nn`, `{c}__nd`, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),"
            f" `{c}__min_s`, `{c}__max_s`"
        )
    n = len(_PROF_NUM) + len(_PROF_STR)
    return one.select(
        "n_rows",
        F.expr(
            f"stack({n}, {', '.join(stack_args)}) AS "
            "(col_name, n_nonnull, n_distinct, min_units, max_units, min_str, max_str)"
        ),
    ).select(
        "col_name", "n_rows", "n_nonnull", "n_distinct",
        "min_units", "max_units", "min_str", "max_str",
    )


@register(
    "profile_columns_hll",
    oracle=None,  # HLL estimates are engine-specific -> rows-only driver check;
    # exactness-adjacent guarantees live in tests/test_approx.py
    # (<=5% error vs exact) and tests/test_plan_pins.py (NO Expand).
    doc="The 100 TB twin of profile_columns: identical output shape, "
    "but every DISTINCT is approx_count_distinct (HyperLogLog++, rsd "
    "2%). The exact profile's Expand duplicates the scan output once "
    "per distinct aggregate (6x here, 50x on a 50-column table) before "
    "the partial agg; the HLL plan is a single ordinary partial+final "
    "hash aggregate — one scan, no row multiplication, sketches merge "
    "map-side. This is the variant to run on a wide production table; "
    "the exact twin stays for small/medium tables and as its oracle "
    "anchor.",
    tags=("llm", "quality", "profiling", "approx"),
)
def profile_columns_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _profile_plan(spark, sf_dir, exact=False)


# --- rag_retrieve_e2e ------------------------------------------------

_RAG_QVEC, _RAG_K, _RAG_CHUNK, _RAG_STRIDE = 7, 8, 120, 100

_SQL_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1000000000000) AS BIGINT)))"
    " AS BIGINT)"
)


@register(
    "rag_retrieve_e2e",
    oracle=f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_RAG_QVEC}),
    scored AS (
      SELECT vec_id,
             CAST({_SQL_DOT.format(a="embedding", b="q_emb")} AS DOUBLE)
               / sqrt(CAST({_SQL_DOT.format(a="embedding", b="embedding")} AS DOUBLE)
                      * CAST({_SQL_DOT.format(a="q_emb", b="q_emb")} AS DOUBLE)) AS sim
      FROM embeddings, q
    ), topk AS (
      SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT {_RAG_K}
    ), ranked AS (
      SELECT vec_id, sim,
             CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
      FROM topk
    )
    SELECT r.rank, CAST(d.doc_id AS BIGINT) AS doc_id, r.sim,
           c.chunk_no,
           c.chunk_no * {_RAG_STRIDE} + 1 AS chunk_start,
           substr(d.text, CAST(c.chunk_no * {_RAG_STRIDE} + 1 AS INT), {_RAG_CHUNK}) AS chunk_text
    FROM ranked r
    JOIN documents d ON d.doc_id = r.vec_id,
    LATERAL (SELECT UNNEST(generate_series(0, greatest(d.n_chars - 1, 0) // {_RAG_STRIDE})) AS chunk_no) c
    """,
    doc="The RAG read path as ONE Catalyst plan: exact cosine top-"
    f"{_RAG_K} against query vector {_RAG_QVEC} (broadcast query, one "
    "embedding scan, TakeOrderedAndProject k-merge), the k winners "
    "BROADCAST-joined to their documents (the corpus side never "
    f"shuffles), then {_RAG_CHUNK}-char/stride-{_RAG_STRIDE} context "
    "chunks with 1-based offsets, rank-tagged. At 100 TB the heavy "
    "side (embeddings + documents) is touched by exactly one scan "
    "each; everything after the top-k operates on k rows.",
    tags=("llm", "retrieval", "e2e"),
)
def rag_retrieve_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fanout(load(spark, sf_dir, "embeddings"))
    q = e.where(F.col("vec_id") == _RAG_QVEC).select(
        F.col("embedding").alias("q_embedding")
    )
    top = S.cosine_topk(e, q, k=_RAG_K)
    ranked = top.select(
        "vec_id",
        "sim",
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), "vec_id"))
        .cast("bigint")
        .alias("rank"),
    )
    docs = load(spark, sf_dir, "documents")
    joined = docs.join(
        F.broadcast(ranked), docs["doc_id"] == ranked["vec_id"], "inner"
    )
    last = F.expr(f"greatest(n_chars - 1, CAST(0 AS BIGINT)) div {_RAG_STRIDE}")
    chunked = joined.select(
        "rank",
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "sim",
        "text",
        F.explode(F.sequence(F.lit(0).cast("bigint"), last)).alias("chunk_no"),
    )
    chunk = F.expr(
        f"substr(text, CAST(chunk_no * {_RAG_STRIDE} + 1 AS INT), {_RAG_CHUNK})"
    )
    return chunked.select(
        "rank",
        "doc_id",
        "sim",
        "chunk_no",
        (F.col("chunk_no") * _RAG_STRIDE + 1).alias("chunk_start"),
        chunk.alias("chunk_text"),
    )
