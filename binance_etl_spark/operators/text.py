"""Text-analysis operators for training-data pipelines (SURVEY.md
§2.12): language-ID, quality scoring, token counting, fingerprinting.
All built-in expressions (split/regexp/agg) — zero Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny function-word list used for quality scoring (documents fixture
# vocabulary includes these).
STOPWORDS = ("the", "a", "and", "of")

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space marks.
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, tok, cnt) — the shared exploded-term view."""
    return (
        docs.select(id_col, F.explode(F.split(text_col, " ")).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lang_profiles(docs: DataFrame, top_n: int = 5) -> DataFrame:
    """Per-language profile: top-N tokens by (count desc, token) —
    the n-gram-profile method (Cavnar-Trenkle) at token granularity."""
    tc = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("tok"))
    return tc.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= top_n).select(
        "lang", "tok", "rn"
    )


def classify_lang(docs: DataFrame, profiles: DataFrame) -> DataFrame:
    """Predict language by profile-token overlap, count-weighted;
    deterministic tie-break on lang string."""
    terms = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    hits = (
        terms.join(F.broadcast(profiles), "tok")
        .groupBy("doc_id", F.col("lang").alias("cand_lang"))
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("overlap").desc(), F.col("cand_lang"))
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "overlap")
    )


def quality_features(docs: DataFrame) -> DataFrame:
    """Deterministic quality heuristics per doc: token count, mean token
    length, stopword ratio, repetition (1 - type/token ratio)."""
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return docs.select(
        "doc_id",
        "lang",
        n_toks.alias("n_tokens"),
        ((F.length("text") - n_toks + 1).cast("double") / n_toks).alias("mean_tok_len"),
        (n_stop.cast("double") / n_toks).alias("stopword_ratio"),
        (F.lit(1.0) - n_distinct.cast("double") / n_toks).alias("repetition"),
    )


def fingerprint(docs: DataFrame, shingle_col: Column) -> DataFrame:
    """Winnowing-style document fingerprint: min/max md5 over shingles
    + distinct-shingle count (content-defined, order-invariant).

    Array-native (one projection, no explode/groupBy): the shingle set
    is already per-row, so a grouped aggregation would only add two
    shuffles and sort-aggregate passes for identical results."""
    hashes = F.transform(shingle_col, F.md5)
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        F.size(shingle_col).cast("long").alias("n_shingles"),
    )


# --- count-min sketch -------------------------------------------------
# Engine-portable CMS (plans/llm_ops11.py registers the batch query;
# streaming/cms_stream.py merges sketches across micro-batches). The
# bucket hash is an md5 hex byte — identical in Spark, DuckDB, and any
# other engine that needs to read the sketch.

CMS_D = 4  # hash rows
CMS_W = 256  # buckets per row (one md5 byte, no modulo bias)


def cms_bucket(d: int, tok_col: str = "tok") -> Column:
    """Row-d bucket of a token: int(md5('<d>#<tok>')[0:2], 16)."""
    h = F.md5(F.concat(F.lit(f"{d}#"), F.col(tok_col)).cast("binary"))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def _cells_expr(tok_col: str) -> Column:
    return F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("d"), cms_bucket(d, tok_col).alias("bucket"))
                for d in range(CMS_D)
            ]
        )
    )


def cms_cells(toks: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Build the sketch: (d, bucket, c) counters over a token stream.
    At most CMS_D * CMS_W live groups — partial aggregation collapses
    everything map-side, the shuffle moves <= 1024 rows regardless of
    corpus size, and two sketches merge by summing c cellwise."""
    return (
        toks.select(_cells_expr(tok_col).alias("cell"))
        .select("cell.d", "cell.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cellwise sum — the mergeability that makes CMS a streaming /
    map-reduce sketch (cells absent from one side count 0)."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def cms_estimate(cand: DataFrame, cells: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Point estimates for candidate tokens: min over the D counters
    each token hits. `cells` is tiny (<= 1024 rows) and broadcast.

    LEFT join, not inner: a sketch cell with no entry holds count 0, so
    a probe token hashing to an unpopulated cell must see 0 (and a token
    absent from the sketched corpus reports est = 0, not a dropped row).
    An inner join would silently drop absent tokens and take min over
    only the populated subset of its D counters — an overestimate."""
    probes = cand.select(tok_col, _cells_expr(tok_col).alias("cell")).select(
        tok_col, "cell.d", "cell.bucket"
    )
    return (
        probes.join(F.broadcast(cells), ["d", "bucket"], "left")
        .groupBy(tok_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0)).cast("long")).alias("est"))
    )
