"""Fifteenth LLM-pipeline batch (round 8): embedding-truncation
retrieval quality and winnowing document fingerprints.

- emb_matryoshka_recall: Matryoshka-representation question (Kusupati
  et al. 2022): if retrieval runs on a PREFIX of each embedding (here
  16 of 64 dims — the memory/latency knob MRL models expose), how much
  of the full-dimension top-10 survives? Recall@10 per query, exact.
- text_winnowing_fingerprint: the MOSS fingerprinting scheme
  (Schleimer/Wilkerson/Aiken 2003): hash every 3-gram, slide a
  4-gram window, keep each window's MINIMUM hash — a content-defined
  signature that is robust to insertions — then report the top
  document pairs by shared fingerprints (the plagiarism/near-dup
  match join, blocked by fingerprint value, never all-pairs on docs).

Cross-engine exactness: gram hashes are 32-bit md5 carves (the
instr-nibble idiom on DuckDB, the equivalence-pinned conv() carve on
Spark); cosine arithmetic is the e-12 floor-integer dot with a fixed
double/sqrt tree (operators/similarity.py). Reference parity note: the
reference ETL has no corpus surface; north-star extensions per
SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

_MRL_PREFIX = 16  # retrieval prefix dims (of 64)
_MRL_K = 10
_MRL_QUERIES = 5  # vec_id 0..4

_SQL_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, len({a})), i -> "
    "CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
    "* 1000000000000) AS BIGINT))) AS BIGINT)"
)

_SQL_COS = (
    f"CAST({_SQL_DOT.format(a='{a}', b='{b}')} AS DOUBLE) "
    f"/ sqrt(CAST({_SQL_DOT.format(a='{a}', b='{a}')} AS DOUBLE) "
    f"* CAST({_SQL_DOT.format(a='{b}', b='{b}')} AS DOUBLE))"
)


@register(
    "emb_matryoshka_recall",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS q_emb,
             q_emb[1:{_MRL_PREFIX}] AS q_pre
      FROM embeddings WHERE vec_id < {_MRL_QUERIES}
    ), scored AS (
      SELECT q.qid, e.vec_id,
             {_SQL_COS.format(a="e.embedding", b="q.q_emb")} AS sim_full,
             {_SQL_COS.format(
                 a=f"e.embedding[1:{_MRL_PREFIX}]", b="q.q_pre"
             )} AS sim_pre
      FROM embeddings e, q
    ), full_top AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim_full DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_MRL_K}
    ), pre_top AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim_pre DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_MRL_K}
    )
    SELECT f.qid, CAST({_MRL_K} AS INT) AS k,
           COUNT(p.vec_id) AS n_hit,
           CAST(COUNT(p.vec_id) * 100 / {_MRL_K} AS BIGINT) AS recall_pct
    FROM full_top f LEFT JOIN pre_top p
      ON p.qid = f.qid AND p.vec_id = f.vec_id
    GROUP BY f.qid ORDER BY f.qid
    """,
    doc="Matryoshka-embedding retrieval quality gate: for each of 5 "
    "query vectors, exact full-64-dim cosine top-10 vs top-10 under "
    "the first-16-dims PREFIX metric (the memory/latency truncation "
    "MRL-trained models serve), reported as recall@10 — the number a "
    "team checks before switching the serving index to truncated "
    "vectors. Both rankings come from ONE scored scan (the queries "
    "broadcast; e-12 integer dots; ROW_NUMBER ties broken by vec_id "
    "on both engines). 100 TB shape: one corpus scan, two window "
    "passes on the same qid-keyed exchange, k-bounded output.",
    tags=("llm", "similarity"),
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import similarity as S

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = (
        e.where(F.col("vec_id") < _MRL_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("q_emb"),
            F.expr(f"slice(embedding, 1, {_MRL_PREFIX})").alias("q_pre"),
        )
    )
    scored = (
        e.withColumn(
            "e_pre", F.expr(f"slice(embedding, 1, {_MRL_PREFIX})")
        )
        .crossJoin(F.broadcast(q))
        .select(
            "qid",
            "vec_id",
            S.cosine_from_e12(
                S.dot_e12("embedding", "q_emb"),
                S.sq_norm_e12("embedding"),
                S.sq_norm_e12("q_emb"),
            ).alias("sim_full"),
            S.cosine_from_e12(
                S.dot_e12("e_pre", "q_pre"),
                S.sq_norm_e12("e_pre"),
                S.sq_norm_e12("q_pre"),
            ).alias("sim_pre"),
        )
    )
    wq_full = W.partitionBy("qid").orderBy(F.desc("sim_full"), "vec_id")
    wq_pre = W.partitionBy("qid").orderBy(F.desc("sim_pre"), "vec_id")
    ranked = scored.select(
        "qid",
        "vec_id",
        F.row_number().over(wq_full).alias("rn_full"),
        F.row_number().over(wq_pre).alias("rn_pre"),
    )
    full_top = ranked.where(F.col("rn_full") <= _MRL_K).select("qid", "vec_id")
    pre_top = ranked.where(F.col("rn_pre") <= _MRL_K).select(
        "qid", F.col("vec_id").alias("p_vec")
    )
    return (
        full_top.join(
            pre_top,
            (full_top.qid == pre_top.qid)
            & (full_top.vec_id == pre_top.p_vec),
            "left",
        )
        .groupBy(full_top.qid)
        .agg(
            F.lit(_MRL_K).cast("int").alias("k"),
            F.count("p_vec").alias("n_hit"),
            (F.count("p_vec") * 100 / _MRL_K).cast("bigint").alias(
                "recall_pct"
            ),
        )
        .orderBy("qid")
    )


_WIN_W = 4  # winnowing window (grams)
_WIN_TOPK = 15

# 32-bit gram hash: first 8 md5 nibbles — instr arithmetic on DuckDB,
# the equivalence-pinned conv() carve on Spark. 32 bits matter for
# SCALE, not correctness: the match join blocks on fingerprint VALUE,
# so a 16-bit space saturates as the corpus grows (every bucket gains
# ~n/65536 docs and the blocked join turns quadratic — measured 6.9x
# at 10x docs); 4B values keep collision blocks O(1).
_SQL_H32 = (
    "CAST(((instr('0123456789abcdef', substr(md5({g}), 1, 1)) - 1) * 268435456"
    " + (instr('0123456789abcdef', substr(md5({g}), 2, 1)) - 1) * 16777216"
    " + (instr('0123456789abcdef', substr(md5({g}), 3, 1)) - 1) * 1048576"
    " + (instr('0123456789abcdef', substr(md5({g}), 4, 1)) - 1) * 65536"
    " + (instr('0123456789abcdef', substr(md5({g}), 5, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substr(md5({g}), 6, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substr(md5({g}), 7, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5({g}), 8, 1)) - 1)) AS BIGINT)"
)


@register(
    "text_winnowing_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, tok, pos FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok,
               UNNEST(generate_series(1, len(string_split(text, ' '))))
                 AS pos
        FROM documents
      )
    ), grams AS (
      SELECT doc_id, pos,
             tok || ' ' || lead(tok, 1) OVER w || ' ' ||
               lead(tok, 2) OVER w AS gram
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(tok, 2) OVER w IS NOT NULL
    ), hashes AS (
      SELECT doc_id, pos, {_SQL_H32.format(g="gram")} AS h FROM grams
    ), wins AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN {_WIN_W - 1} PRECEDING
                          AND CURRENT ROW) AS fp,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM hashes
    ), fps AS (
      SELECT DISTINCT doc_id, fp FROM wins WHERE rn >= {_WIN_W}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS shared_fps
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    ORDER BY shared_fps DESC, doc_a, doc_b LIMIT {_WIN_TOPK}
    """,
    doc="Winnowing document fingerprints (Schleimer/Wilkerson/Aiken "
    "2003, the MOSS scheme): 32-bit hash per 3-gram, a sliding "
    f"{_WIN_W}-gram window keeps each window's MINIMUM hash, distinct "
    "selected hashes form the doc's content-defined signature "
    "(guaranteed to share a fingerprint with any copy of >= w+k-1 "
    "tokens — robust to insertions, unlike fixed-stride sampling), "
    "then the match join pairs documents by shared fingerprint value "
    "— BLOCKED on the fingerprint, never an all-pairs doc join — and "
    "reports the top-15 pairs. 100 TB shape: one doc-keyed window "
    "exchange for gram/min windows, one fingerprint-keyed equi-join "
    "(same class as the minhash band join), TakeOrdered output.",
    tags=("llm", "text", "dedup"),
)
def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    grams = (
        toks.select(
            "doc_id",
            "pos",
            F.concat_ws(
                " ",
                F.col("tok"),
                F.lead("tok", 1).over(wdoc),
                F.lead("tok", 2).over(wdoc),
            ).alias("gram"),
            F.lead("tok", 2).over(wdoc).alias("t2"),
        )
        .where(F.col("t2").isNotNull())
        .drop("t2")
    )
    hashes = grams.select(
        "doc_id",
        "pos",
        F.expr("CAST(conv(substr(md5(gram), 1, 8), 16, 10) AS BIGINT)").alias(
            "h"
        ),
    )
    wmin = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(_WIN_W - 1), 0)
    )
    wins = hashes.select(
        "doc_id",
        F.min("h").over(wmin).alias("fp"),
        F.row_number().over(W.partitionBy("doc_id").orderBy("pos")).alias(
            "rn"
        ),
    )
    fps = wins.where(F.col("rn") >= _WIN_W).select("doc_id", "fp").distinct()
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .orderBy(F.desc("shared_fps"), "doc_a", "doc_b")
        .limit(_WIN_TOPK)
    )


# --- emb_hamming_ann -------------------------------------------------------

_HAM_QUERIES = 5
_HAM_K = 10


def _word_sql(elem_fmt: str, emb: str, offset: int) -> str:
    """Sign-quantize dims offset+1..offset+32 into one 32-bit word:
    bit i set iff the dim is >= 0.  elem_fmt is the engine's list
    accessor ('{e}[{i}]' on DuckDB, 'element_at({e}, {i})' on Spark);
    float comparisons are exact on both engines so the words match
    bit for bit."""
    terms = [
        f"(CASE WHEN {elem_fmt.format(e=emb, i=offset + b + 1)} >= 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(32)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "emb_hamming_ann",
    oracle=f"""
    WITH w AS (
      SELECT vec_id, embedding,
             {_word_sql('{e}[{i}]', 'embedding', 0)} AS w_lo,
             {_word_sql('{e}[{i}]', 'embedding', 32)} AS w_hi
      FROM embeddings
    ), q AS (
      SELECT vec_id AS qid, embedding AS q_emb,
             w_lo AS q_lo, w_hi AS q_hi
      FROM w WHERE vec_id < {_HAM_QUERIES}
    ), scored AS (
      SELECT q.qid, w.vec_id,
             bit_count(xor(w.w_lo, q.q_lo))
               + bit_count(xor(w.w_hi, q.q_hi)) AS ham,
             {_SQL_COS.format(a="w.embedding", b="q.q_emb")} AS sim_full
      FROM w, q
      WHERE w.vec_id <> q.qid
    ), full_top AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY sim_full DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_HAM_K}
    ), ham_top AS (
      SELECT qid, vec_id, ham FROM (
        SELECT qid, vec_id, ham,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY ham, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_HAM_K}
    )
    SELECT f.qid, CAST({_HAM_K} AS INT) AS k,
           COUNT(h.vec_id) AS n_hit,
           CAST(COUNT(h.vec_id) * 100 / {_HAM_K} AS BIGINT) AS recall_pct,
           CAST(MIN(h.ham) AS BIGINT) AS best_ham
    FROM full_top f LEFT JOIN ham_top h
      ON h.qid = f.qid AND h.vec_id = f.vec_id
    GROUP BY f.qid ORDER BY f.qid
    """,
    doc="Binary-quantization ANN quality gate: sign-quantize each "
    "64-dim embedding to TWO 32-bit words (bit = dim >= 0 — the 1-bit "
    "/ 32x-compression serving trick next to emb_quantize_int8 and "
    "the PQ family), rank neighbors by Hamming distance "
    "(bit_count(xor) on stored words — a 2-instruction distance at "
    "serve time), and report recall@10 against the exact full-"
    "precision cosine top-10 plus the best Hamming distance among "
    "true hits. Float sign tests are exact on both engines so the "
    "words, distances, and rankings hash-match. 100 TB shape: the "
    "5 query words broadcast; ONE corpus scan computes both metrics; "
    "two window passes share the qid-keyed exchange; at serve scale "
    "the index stores 8 bytes/vector and never touches the float "
    "column (the ann_index storage pattern).",
    tags=("llm", "similarity"),
)
def emb_hamming_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators import similarity as S

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    w = e.select(
        "vec_id",
        "embedding",
        F.expr(_word_sql("element_at({e}, {i})", "embedding", 0)).alias(
            "w_lo"
        ),
        F.expr(_word_sql("element_at({e}, {i})", "embedding", 32)).alias(
            "w_hi"
        ),
    )
    q = w.where(F.col("vec_id") < _HAM_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("w_lo").alias("q_lo"),
        F.col("w_hi").alias("q_hi"),
    )
    scored = (
        w.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(
                "bit_count(w_lo ^ q_lo) + bit_count(w_hi ^ q_hi)"
            ).alias("ham"),
            S.cosine_from_e12(
                S.dot_e12("embedding", "q_emb"),
                S.sq_norm_e12("embedding"),
                S.sq_norm_e12("q_emb"),
            ).alias("sim_full"),
        )
    )
    w_full = W.partitionBy("qid").orderBy(F.desc("sim_full"), "vec_id")
    w_ham = W.partitionBy("qid").orderBy("ham", "vec_id")
    ranked = scored.select(
        "qid",
        "vec_id",
        "ham",
        F.row_number().over(w_full).alias("rn_full"),
        F.row_number().over(w_ham).alias("rn_ham"),
    )
    full_top = ranked.where(F.col("rn_full") <= _HAM_K).select(
        "qid", "vec_id"
    )
    ham_top = ranked.where(F.col("rn_ham") <= _HAM_K).select(
        F.col("qid").alias("h_qid"),
        F.col("vec_id").alias("h_vec"),
        "ham",
    )
    return (
        full_top.join(
            ham_top,
            (full_top.qid == ham_top.h_qid)
            & (full_top.vec_id == ham_top.h_vec),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.lit(_HAM_K).cast("int").alias("k"),
            F.count("h_vec").alias("n_hit"),
            (F.count("h_vec") * 100 / _HAM_K).cast("bigint").alias(
                "recall_pct"
            ),
            F.min("ham").cast("bigint").alias("best_ham"),
        )
        .orderBy("qid")
    )


# --- text_bpe_segment ------------------------------------------------------

# Ordered merge list (the tokenizer's learned ranks, pinned as a
# constant so segmentation has an exact shared-text oracle — learning
# itself is text_bpe_learn's job). Includes a 3-deep hierarchical
# chain: (a,n) -> (s,c) -> (sc,an) fuses 'scan' into ONE token.
_BPE_MERGES = [
    ("a", "n"),
    ("s", "c"),
    ("sc", "an"),
    ("e", "r"),
    ("o", "r"),
    ("t", "a"),
    ("r", "o"),
    ("ro", "w"),
]
_BPE_DOCS = 30


def _bpe_apply_sql(col: str) -> str:
    """Chained-REPLACE BPE application over a space-separated symbol
    string wrapped in spaces: each merge (a, b) is `replace(s,
    ' a b ', ' ab ')` applied FOUR times — left-to-right
    non-overlapping replace consumes the shared separator, so one
    pass merges alternate pairs of an adjacency chain and four passes
    converge for any word under 16 symbols. replace() scans
    identically on Spark and DuckDB (verified: the intermediate
    consumed-space artifact matches byte for byte), so the exact text
    is the oracle."""
    s = col
    for a, b in _BPE_MERGES:
        for _ in range(4):
            s = f"replace({s}, ' {a} {b} ', ' {a}{b} ')"
    return s


@register(
    "text_bpe_segment",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w
        FROM documents WHERE doc_id < {_BPE_DOCS}
      ) WHERE w <> ''
    ), seg AS (
      SELECT doc_id, length(w) AS chars,
             {_bpe_apply_sql(
                 "(' ' || array_to_string(string_split(w, ''), ' ') || ' ')"
             )} AS s
      FROM words
    ), counted AS (
      SELECT doc_id, chars,
             length(trim(s)) - length(replace(trim(s), ' ', '')) + 1
               AS n_tokens
      FROM seg
    )
    SELECT doc_id, COUNT(*) AS n_words,
           CAST(SUM(chars) AS BIGINT) AS n_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST((1000000 * SUM(n_tokens)) // COUNT(*) AS BIGINT)
             AS tokens_per_word_ppm,
           CAST((1000000 * SUM(n_tokens)) // SUM(chars) AS BIGINT)
             AS tokens_per_char_ppm
    FROM counted GROUP BY doc_id ORDER BY doc_id
    """,
    doc="BPE segmentation with a FIXED ordered merge list (the apply "
    "half of the tokenizer story — text_bpe_learn learns merges, this "
    "op segments with them and reports per-doc token statistics, the "
    "number a token-budget planner actually consumes). Application is "
    "pure chained REPLACE over space-separated symbols (greedy "
    "left-to-right per merge, in rank order, exactly the textbook "
    "apply loop) — no UDF, whole-stage codegen end to end, and the "
    "identical text runs on DuckDB so segmentation is value-oracled, "
    "unlike any sampling-based tokenizer estimate. Includes a 3-deep "
    "hierarchical chain ((a,n) -> (s,c) -> (sc,an)) proving rank "
    "order matters. 100 TB shape: one scan, one combinable per-doc "
    "aggregate; the merge list is a compile-time constant (a learned "
    "vocabulary would broadcast).",
    tags=("llm", "text"),
)
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < _BPE_DOCS)
    words = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    seg = words.select(
        "doc_id",
        F.length("w").alias("chars"),
        F.expr(
            _bpe_apply_sql("(' ' || array_join(split(w, ''), ' ') || ' ')")
        ).alias("s"),
    )
    counted = seg.select(
        "doc_id",
        "chars",
        F.expr(
            "length(trim(s)) - length(replace(trim(s), ' ', '')) + 1"
        ).alias("n_tokens"),
    )
    return (
        counted.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("chars").cast("bigint").alias("n_chars"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.expr(
                "CAST((1000000 * SUM(n_tokens)) DIV COUNT(*) AS BIGINT)"
            ).alias("tokens_per_word_ppm"),
            F.expr(
                "CAST((1000000 * SUM(n_tokens)) DIV SUM(chars) AS BIGINT)"
            ).alias("tokens_per_char_ppm"),
        )
        .orderBy("doc_id")
    )


# --- emb_outlier_centroid --------------------------------------------------

_OUT_DIMS = 64
_OUT_K = 5


def _out_x(elem_fmt: str, d: int) -> str:
    return (
        f"CAST(floor(CAST({elem_fmt.format(i=d)} AS DOUBLE) * 10000)"
        " AS BIGINT)"
    )


def _out_score_sql() -> str:
    """n^2 * ||x - centroid||^2 in EXACT integers: with e4-quantized
    coords x_d and per-label sums s_d over n members,
    sum_d (n*x_d - s_d)^2 needs no division and no doubles at all —
    order-free by integer associativity. BIGINT bound: |n*x_d| <=
    n*1e4, so the 64-term sum stays in int64 to ~1e5 members/label
    (document larger labels re-anchor or sample)."""
    terms = [
        f"(n * x{d} - s{d}) * (n * x{d} - s{d})"
        for d in range(1, _OUT_DIMS + 1)
    ]
    return " + ".join(terms)


@register(
    "emb_outlier_centroid",
    oracle=f"""
    WITH x AS (
      SELECT vec_id, label,
             {", ".join(
                 _out_x("embedding[{i}]", d) + f" AS x{d}"
                 for d in range(1, _OUT_DIMS + 1))}
      FROM embeddings
    ), c AS (
      SELECT label, COUNT(*) AS n,
             {", ".join(f"SUM(x{d}) AS s{d}"
                        for d in range(1, _OUT_DIMS + 1))}
      FROM x GROUP BY label
    ), scored AS (
      SELECT x.vec_id, x.label,
             CAST({_out_score_sql()} AS BIGINT) AS d2n2
      FROM x JOIN c ON c.label = x.label
    ), ranked AS (
      SELECT label, vec_id, d2n2,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY d2n2 DESC, vec_id) AS rnk
      FROM scored
    )
    SELECT label, CAST(rnk AS INT) AS rnk, vec_id, d2n2
    FROM ranked WHERE rnk <= {_OUT_K}
    ORDER BY label, rnk
    """,
    doc="Embedding outlier screen: the top-5 farthest members from "
    "each label's centroid — the embedding-space DQ gate run before "
    "trusting labels or feeding a clustering index (mislabeled / "
    "corrupted vectors surface here first). The score is n^2 * "
    "squared-distance computed ENTIRELY in integers (e4-quantized "
    "coords, per-label sums, 64 fixed-order integer terms — no "
    "division, no doubles, so the hash is exact by construction; "
    "bound documented to ~1e5 members/label). 100 TB shape: one "
    "combinable per-label moment pass, the 4-row centroid table "
    "broadcast back over ONE corpus scan, per-label top-k windows — "
    "never a pairwise join.",
    tags=("llm", "similarity", "dq"),
)
def emb_outlier_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id",
        "label",
        *[
            F.expr(_out_x("element_at(embedding, {i})", d)).alias(f"x{d}")
            for d in range(1, _OUT_DIMS + 1)
        ],
    )
    c = x.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"x{d}").alias(f"s{d}") for d in range(1, _OUT_DIMS + 1)],
    )
    scored = x.join(F.broadcast(c), "label").select(
        "vec_id",
        "label",
        F.expr(f"CAST({_out_score_sql()} AS BIGINT)").alias("d2n2"),
    )
    wr = W.partitionBy("label").orderBy(F.desc("d2n2"), "vec_id")
    return (
        scored.select(
            "label", "vec_id", "d2n2", F.row_number().over(wr).alias("rnk")
        )
        .where(F.col("rnk") <= _OUT_K)
        .select("label", F.col("rnk").cast("int").alias("rnk"), "vec_id", "d2n2")
        .orderBy("label", "rnk")
    )


# --- dedup_cross_source_matrix -----------------------------------------------

from binance_etl_spark.operators import dedup as D  # noqa: E402
from binance_etl_spark.plans.llm_ops import (  # noqa: E402
    CAP_JACCARD,
    _sql_minhash_cte,
    _SQL_SHINGLES,
)


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH a AS (
      SELECT doc_id AS a_id, {_SQL_SHINGLES} AS a_sh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < {CAP_JACCARD})
    ),
    {_sql_minhash_cte("a", CAP_JACCARD)},
    cand2 AS (
      SELECT DISTINCT l_id, r_id, l_sh, r_sh FROM (
        SELECT x.a_id AS l_id, y.a_id AS r_id,
               x.a_sh AS l_sh, y.a_sh AS r_sh
        FROM aband x JOIN aband y
          ON x.band0 = y.band0 AND x.a_id < y.a_id
        UNION ALL
        SELECT x.a_id, y.a_id, x.a_sh, y.a_sh
        FROM aband x JOIN aband y
          ON x.band1 = y.band1 AND x.a_id < y.a_id
        UNION ALL
        SELECT x.a_id, y.a_id, x.a_sh, y.a_sh
        FROM aband x JOIN aband y
          ON x.band2 = y.band2 AND x.a_id < y.a_id
      )
    ), verified AS (
      SELECT l_id, r_id
      FROM cand2
      WHERE CAST(len(list_filter(l_sh, s -> list_contains(r_sh, s)))
                 AS DOUBLE)
            / (len(l_sh) + len(r_sh)
               - len(list_filter(l_sh, s -> list_contains(r_sh, s))))
            >= 0.5
    )
    SELECT least(da.source, db.source) AS src_a,
           greatest(da.source, db.source) AS src_b,
           COUNT(*) AS n_pairs,
           CAST(CASE WHEN da.source <> db.source THEN 1 ELSE 0 END
                AS BIGINT) AS is_cross
    FROM verified v
    JOIN documents da ON da.doc_id = v.l_id
    JOIN documents db ON db.doc_id = v.r_id
    GROUP BY least(da.source, db.source), greatest(da.source, db.source),
             CASE WHEN da.source <> db.source THEN 1 ELSE 0 END
    ORDER BY src_a, src_b
    """,
    doc="Cross-source contamination matrix: within-corpus near-dup "
    "pairs (the dedup_minhash_lsh pipeline — banded LSH candidates, "
    "exact Jaccard >= 0.5 verification, a_id < b_id canonical pairs) "
    "rolled up by UNORDERED source pair — the report that tells a "
    "corpus owner whether duplication lives INSIDE crawls or leaks "
    "ACROSS them (cross-source near-dups are the train/eval "
    "contamination channel dedup_decontaminate exists to cut). 100 TB "
    "shape: identical to the banded dedup (candidate generation is an "
    "equi-join on band value, never all-pairs); the source rollup "
    "adds two broadcast doc->source lookups over the verified-pair "
    "set only.",
    tags=("dedup", "lsh", "llm"),
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.catalog import fanout

    docs = fanout(
        load(spark, sf_dir, "documents").where(F.col("doc_id") < CAP_JACCARD)
    )
    a = docs.select(
        F.col("doc_id").alias("id"), D.shingles(F.col("text")).alias("sh")
    ).cache()
    sig = D.minhash_signature(a, "id", "sh")
    bands = D.lsh_bands(sig, "id")
    left = bands.select(
        F.col("id").alias("l_id"), "band_no", "band_val"
    )
    right = bands.select(
        F.col("id").alias("r_id"), "band_no", "band_val"
    )
    cand = (
        left.join(right, ["band_no", "band_val"])
        .where(F.col("l_id") < F.col("r_id"))
        .select("l_id", "r_id")
        .distinct()
    )
    pairs = (
        cand.join(a.select(F.col("id").alias("l_id"), F.col("sh").alias("l_sh")), "l_id")
        .join(a.select(F.col("id").alias("r_id"), F.col("sh").alias("r_sh")), "r_id")
        .where(D.jaccard(F.col("l_sh"), F.col("r_sh")) >= 0.5)
        .select("l_id", "r_id")
    )
    src = docs.select(F.col("doc_id"), F.col("source"))
    return (
        pairs.join(
            F.broadcast(src.select(F.col("doc_id").alias("l_id"),
                                   F.col("source").alias("sa"))), "l_id")
        .join(
            F.broadcast(src.select(F.col("doc_id").alias("r_id"),
                                   F.col("source").alias("sb"))), "r_id")
        .groupBy(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
            F.when(F.col("sa") != F.col("sb"), 1).otherwise(0)
            .cast("bigint")
            .alias("is_cross"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select("src_a", "src_b", "n_pairs", "is_cross")
        .orderBy("src_a", "src_b")
    )
