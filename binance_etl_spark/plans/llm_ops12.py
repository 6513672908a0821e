"""Twelfth LLM-pipeline batch: training-set ASSEMBLY — the last mile
between a curated corpus and the files a trainer reads.

- corpus_shuffle_shards: deterministic global shuffle into N training
  shards. Trainers need the corpus order decorrelated from crawl /
  ingestion order (adjacent same-domain docs bias gradients), split
  into evenly-sized shards, and — critically — REPRODUCIBLE: re-running
  assembly on the same corpus must yield byte-identical shards. A
  random shuffle has none of these; hash-ordering has all of them.
- sample_mixture_weights: weighted domain mixture. Training mixes are
  specified as per-source weights (e.g. up-weight books, down-weight
  crawl); the op turns weights into per-source quotas and fills each
  quota with that source's deterministic bottom-by-hash sample.

Both are pure JVM expression work (md5 + conv + window/agg): no UDFs,
no driver collect. Cross-engine determinism uses the same md5-hex
ordering discipline as sample_bottom_k (llm_ops10): md5 is identical
in every engine, so the shard assignment, the within-shard order, and
the quota fill are bit-reproducible between Spark and the DuckDB
oracle — and between any two production runs.

Reference parity note: the reference ETL (binance_etl, ~539 LoC) has
no corpus surface; these are north-star extension operators per
SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

_N_SHARDS = 8
_MIX_BUDGET = 200


def _hk(col):
    """Deterministic engine-portable shuffle key: md5 of the salted id.
    The salt decouples THIS shuffle from every other md5-of-id use
    (bottom-k sampling, split assignment) so samples drawn by one op
    are not correlated with shard boundaries drawn by another."""
    return F.md5(F.concat(F.lit("shard:"), col.cast("string")))


@register(
    "corpus_shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             md5('shard:' || CAST(doc_id AS VARCHAR)) AS hk
      FROM documents
    ), s AS (
      SELECT doc_id, n_chars, hk,
             CAST(((instr('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16
                   + instr('0123456789abcdef', substr(hk, 2, 1)) - 1)
                  % {_N_SHARDS} AS INT) AS shard
      FROM h
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           arg_min(doc_id, hk) AS first_doc,
           arg_max(doc_id, hk) AS last_doc
    FROM s GROUP BY shard ORDER BY shard
    """,
    doc="Deterministic global shuffle into training shards: shard = "
    "first-4-md5-bytes mod N, within-shard order = full md5 — one "
    "hash-partitioned shuffle (the single unavoidable global exchange "
    "of training-set assembly; everything downstream is map-side), "
    "shards statistically even with no skew key, and the whole "
    "layout a pure function of doc_id, so re-assembly is byte-"
    "reproducible. The audit returns per-shard counts, byte mass, and "
    "the first/last doc in shard order (pinning the deterministic "
    "within-shard ordering, not just membership). At 100 TB the "
    "writer pairs this with maxRecordsPerFile to bound shard file "
    "sizes.",
    tags=("llm", "sampling", "layout"),
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    hk = _hk(F.col("doc_id"))
    # first md5 BYTE via the instr-nibble idiom — the exact text the
    # oracle runs, so assignment is engine-portable by construction
    byte = (
        (F.expr("instr('0123456789abcdef', substr(hk, 1, 1))") - 1) * 16
        + F.expr("instr('0123456789abcdef', substr(hk, 2, 1))")
        - 1
    )
    s = d.select("doc_id", "n_chars", hk.alias("hk")).select(
        "doc_id", "n_chars", "hk", (byte % _N_SHARDS).cast("int").alias("shard")
    )
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min_by("doc_id", "hk").alias("first_doc"),
            F.max_by("doc_id", "hk").alias("last_doc"),
        )
        .orderBy("shard")
    )


@register(
    "sample_mixture_weights",
    oracle=f"""
    WITH w AS (
      SELECT source,
             1 + (CAST(substr(source, 4) AS INT) % 3) AS weight
      FROM (SELECT DISTINCT source FROM documents)
    ), tot AS (SELECT SUM(weight) AS tw FROM w),
    q0 AS (
      SELECT source, weight,
             CAST(floor({_MIX_BUDGET} * weight / tw) AS BIGINT) AS base,
             ({_MIX_BUDGET} * weight / tw)
               - floor({_MIX_BUDGET} * weight / tw) AS rem
      FROM w, tot
    ), leftover AS (SELECT {_MIX_BUDGET} - SUM(base) AS k FROM q0),
    quotas AS (
      SELECT source, weight,
             base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                              <= k THEN 1 ELSE 0 END AS quota
      FROM q0, leftover
    ), ranked AS (
      SELECT d.doc_id, d.source,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rn
      FROM documents d
    )
    SELECT q.source, CAST(q.weight AS INT) AS weight, q.quota,
           COUNT(*) AS n_kept,
           MIN(r.doc_id) AS min_kept_id,
           MAX(r.doc_id) AS max_kept_id
    FROM quotas q JOIN ranked r ON r.source = q.source AND r.rn <= q.quota
    GROUP BY q.source, q.weight, q.quota
    ORDER BY q.source
    """,
    doc="Weighted domain mixture assembly with EXACT largest-remainder "
    "apportionment: per-source weights become floor quotas, then the "
    "unfilled budget slots go to the sources with the largest "
    "fractional remainders (ties to source asc), so sum(quota) == "
    "budget exactly — the Hamilton method training mixes use. Each "
    "quota is filled by that source's deterministic bottom-by-hash "
    "sample (md5 order — uniform within source, reproducible across "
    "runs and engines). The plan is a k-row weight/remainder table "
    "(broadcast), one window pass partitioned by source (the shuffle "
    "key), and a broadcast quota join — no skew, no collect; at "
    "100 TB the ranked window is the only data-sized exchange.",
    tags=("llm", "sampling"),
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    w = d.select("source").distinct().select(
        "source",
        (1 + F.substring("source", 4, 10).cast("int") % 3).alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("tw"))
    exact = F.lit(_MIX_BUDGET) * F.col("weight") / F.col("tw")
    q0 = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "weight",
        F.floor(exact).alias("base"),
        (exact - F.floor(exact)).alias("rem"),
    )
    leftover = q0.agg((F.lit(_MIX_BUDGET) - F.sum("base")).alias("k"))
    # single-partition window is fine: q0 is a k-row table by definition
    topup_rank = F.row_number().over(
        W.partitionBy().orderBy(F.col("rem").desc(), F.col("source"))
    )
    quotas = (
        q0.crossJoin(F.broadcast(leftover))
        .withColumn("tr", topup_rank)
        .select(
            "source",
            "weight",
            (
                F.col("base")
                + F.when(F.col("tr") <= F.col("k"), F.lit(1)).otherwise(F.lit(0))
            ).alias("quota"),
        )
    )
    ranked = d.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        ),
    )
    kept = ranked.join(F.broadcast(quotas), "source").where(
        F.col("rn") <= F.col("quota")
    )
    return (
        kept.groupBy("source", "weight", "quota")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_kept_id"),
            F.max("doc_id").cast("bigint").alias("max_kept_id"),
        )
        .select(
            "source",
            F.col("weight").cast("int").alias("weight"),
            "quota",
            "n_kept",
            "min_kept_id",
            "max_kept_id",
        )
        .orderBy("source")
    )


# --- sink_snapshot_changes -------------------------------------------


@register(
    "sink_snapshot_changes",
    oracle="""
    SELECT '1->2' AS step, 'insert' AS change_type, lang,
           COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 3 = 2 GROUP BY lang
    UNION ALL
    SELECT '2->3', 'delete', lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM documents WHERE doc_id % 7 = 3 GROUP BY lang
    ORDER BY step, change_type, lang
    """,
    doc="Row-level CDC over the snapshot commit log (operators/"
    "snapshots.py::read_changes — the Iceberg changelog-scan / Delta "
    "CDF read): the corpus commits in two appends (v1 = doc_id%3<>2, "
    "v2 = the rest), then delete_where erases doc_id%7=3 as v3. The "
    "changes(1,2) read touches ONLY v2's added files and yields pure "
    "inserts; changes(2,3) opens only the files the delete rewrote "
    "and derives exactly the erased rows as deletes (survivors "
    "cancel via EXCEPT ALL on the touched-file rows). Scale: I/O and "
    "the diff shuffle are bounded by the files the delta touched, "
    "never the table — the property that makes incremental "
    "downstream consumers (index refresh, aggregate maintenance, "
    "replication) affordable at 100 TB. Value-checked per language "
    "on both legs.",
    tags=("sink", "versioning", "llm"),
)
def sink_snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_cdc_") + "/docs_versioned"
    SNAP.write_version(
        d.where(F.col("doc_id") % 3 != 2).repartitionByRange(4, "doc_id"),
        table, mode="append",
    )
    SNAP.write_version(
        d.where(F.col("doc_id") % 3 == 2).repartitionByRange(2, "doc_id"),
        table, mode="append",
    )
    SNAP.delete_where(spark, table, "doc_id % 7 = 3")

    def leg(from_v: int, to_v: int) -> DataFrame:
        ch = SNAP.read_changes(spark, table, from_v, to_v)
        return ch.groupBy("change_type", "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        ).select(
            F.lit(f"{from_v}->{to_v}").alias("step"),
            "change_type", "lang", "n_docs", "sum_chars",
        )

    return leg(1, 2).unionByName(leg(2, 3)).orderBy("step", "change_type", "lang")


# --- sink_snapshot_merge ---------------------------------------------


@register(
    "sink_snapshot_merge",
    oracle="""
    WITH merged AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END
               AS n_chars
      FROM documents WHERE doc_id % 10 <> 5
      UNION ALL
      SELECT doc_id + 1000000, 'xx', doc_id % 97
      FROM documents WHERE doc_id % 10 = 7
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM merged GROUP BY lang ORDER BY lang
    """,
    doc="MERGE INTO / CDC-apply over the snapshot log (operators/"
    "snapshots.py::merge_into — the Delta MERGE upsert + DLT APPLY "
    "CHANGES shape): the corpus commits as v1, then ONE change batch "
    "applies updates (doc_id%10=0 grows n_chars by 1000), deletes "
    "(doc_id%10=5, via the source-side delete condition), and inserts "
    "(new 'xx' docs keyed doc_id+1000000) in a single new version. "
    "Scale: only files holding a matched key rewrite (input_file_name "
    "scan + key semi-join); untouched files carry by name with zero "
    "I/O; unmatched-key inserts never touch existing files. The "
    "query value-checks the merged table per language; minimal-"
    "rewrite and the CDC view of the merge are pinned in "
    "tests/test_snapshots.py.",
    tags=("sink", "versioning", "llm"),
)
def sink_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_merge_") + "/docs_versioned"
    SNAP.write_version(d.repartitionByRange(4, "doc_id"), table, mode="append")

    updates = d.where(F.col("doc_id") % 10 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    deletes = d.where(F.col("doc_id") % 10 == 5)
    inserts = d.where(F.col("doc_id") % 10 == 7).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.lit("xx").alias("lang"),
        (F.col("doc_id") % 97).cast("bigint").alias("n_chars"),
    )
    # merge source must match the target schema, so the delete op is a
    # sentinel the delete_condition reads: n_chars = -1 (never a valid
    # length) marks the key for tombstoning.
    src = updates.unionByName(
        deletes.withColumn("n_chars", F.lit(-1).cast("bigint"))
    ).unionByName(inserts)
    SNAP.merge_into(
        spark, table, src, key_cols=["doc_id"], delete_condition="n_chars = -1",
        source_unique=True,  # disjoint %10 slices of unique doc_ids
    )
    return (
        SNAP.read_version(spark, table)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


# --- sink_cdc_incremental_agg ----------------------------------------


@register(
    "sink_cdc_incremental_agg",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
                         ELSE n_chars END) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 10 <> 5
    GROUP BY lang ORDER BY lang
    """,
    doc="Incremental view maintenance WITH RETRACTIONS, driven by the "
    "CDC feed: a per-language aggregate follows the table through an "
    "append (v2) AND a merge carrying updates + deletes (v3) by "
    "applying read_changes deltas — inserts contribute +1/+n_chars, "
    "deletes -1/-n_chars, so an update (delete+insert pair) nets its "
    "difference. The manifest-diff pattern "
    "(sink_incremental_manifest_agg) only survives appends; this is "
    "the general maintenance loop a derived table needs once DELETE "
    "and MERGE exist. Scale: each step scans only the files the delta "
    "touched (read_changes' contract) plus the lang-sized state — "
    "never history; the oracle is the full recompute, proving "
    "delta-apply == recompute across all three versions.",
    tags=("sink", "versioning", "incremental", "llm"),
)
def sink_cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_cdcivm_") + "/docs_versioned"

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )

    v1 = SNAP.write_version(
        d.where(F.col("doc_id") % 3 != 2).repartitionByRange(4, "doc_id"), table
    )
    state = agg(SNAP.read_version(spark, table, v1)).localCheckpoint(eager=True)
    SNAP.write_version(
        d.where(F.col("doc_id") % 3 == 2).repartitionByRange(2, "doc_id"), table
    )
    src = (
        d.where(F.col("doc_id") % 10 == 0)
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .unionByName(
            d.where(F.col("doc_id") % 10 == 5).withColumn(
                "n_chars", F.lit(-1).cast("bigint")
            )
        )
    )
    v3 = SNAP.merge_into(
        spark, table, src, key_cols=["doc_id"], delete_condition="n_chars = -1",
        source_unique=True,  # disjoint %10 slices of unique doc_ids
    )
    for a, b in [(1, 2), (2, v3)]:
        ch = SNAP.read_changes(spark, table, a, b)
        sgn = F.when(F.col("change_type") == "insert", 1).otherwise(-1)
        delta = ch.groupBy("lang").agg(
            F.sum(sgn).cast("bigint").alias("n_docs"),
            F.sum(sgn * F.col("n_chars")).cast("bigint").alias("sum_chars"),
        )
        state = (
            state.unionByName(delta)
            .groupBy("lang")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("sum_chars").cast("bigint").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )
    return state.where(F.col("n_docs") > 0).orderBy("lang")


_TOKEN_BUDGET = 20_000


@register(
    "sample_token_budget_mixture",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS toks
      FROM documents
    ), w AS (
      SELECT source,
             1 + (CAST(substr(source, 4) AS INT) % 3) AS weight
      FROM (SELECT DISTINCT source FROM t)
    ), tot AS (SELECT SUM(weight) AS tw FROM w),
    budgets AS (
      SELECT source, weight,
             CAST(floor({_TOKEN_BUDGET} * weight / tw) AS BIGINT) AS token_budget
      FROM w, tot
    ), cum AS (
      SELECT t.doc_id, t.source, t.toks,
             SUM(t.toks) OVER (
               PARTITION BY t.source
               ORDER BY md5(CAST(t.doc_id AS VARCHAR)), t.doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS running
      FROM t
    )
    SELECT b.source, b.token_budget,
           COUNT(*) AS n_kept,
           CAST(SUM(c.toks) AS BIGINT) AS kept_tokens,
           CAST(MAX(c.running) AS BIGINT) AS max_running
    FROM budgets b JOIN cum c
      ON c.source = b.source AND c.running <= b.token_budget
    GROUP BY b.source, b.token_budget
    ORDER BY b.source
    """,
    doc="TOKEN-budget domain mixture: training mixes are specified in "
    "tokens, not document counts — per-source weights become token "
    "budgets (floor of the proportional share), and each budget fills "
    "GREEDILY in deterministic md5 order: a doc is kept while the "
    "running token total stays within budget (strict fill — the "
    "crossing doc is excluded, so kept_tokens <= budget is an "
    "invariant the query itself proves via max_running). Token counts "
    "are whitespace tokens, consistent with text_token_count. Same "
    "plan shape as sample_mixture_weights: k-row broadcast budget "
    "table + ONE window pass partitioned by source (running sum in "
    "the same pass as the ordering) — no skew, no collect; the ranked "
    "window is the only data-sized exchange at 100 TB.",
    tags=("llm", "sampling"),
)
def sample_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("toks")
    )
    w = d.select("source").distinct().select(
        "source",
        (1 + F.substring("source", 4, 10).cast("int") % 3).alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("tw"))
    budgets = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(F.lit(_TOKEN_BUDGET) * F.col("weight") / F.col("tw"))
        .cast("bigint")
        .alias("token_budget"),
    )
    cum = d.withColumn(
        "running",
        F.sum("toks").over(
            W.partitionBy("source")
            .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    kept = cum.join(F.broadcast(budgets), "source").where(
        F.col("running") <= F.col("token_budget")
    )
    return (
        kept.groupBy("source", "token_budget")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("toks").cast("bigint").alias("kept_tokens"),
            F.max("running").cast("bigint").alias("max_running"),
        )
        .orderBy("source")
    )


_DSIR_B = 1024  # hashed feature buckets (16^4 = 64 * 1024 -> uniform mod)
_DSIR_TOPK = 50


def _dsir_bucket(tok):
    """Engine-portable hashed n-gram feature: first 4 md5 hex chars of
    the salted token -> 0..65535, mod the bucket count (65536 is an
    exact multiple of _DSIR_B, so the fold is uniform)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), tok)), 1, 4), 16, 10)
        .cast("long")
        % _DSIR_B
    )


@register(
    "sample_dsir_select",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok
      FROM documents
    ), tb AS (
      SELECT doc_id, lang,
             CAST((
               (instr('0123456789abcdef', substr(md5('dsir:' || tok), 1, 1)) - 1) * 4096
             + (instr('0123456789abcdef', substr(md5('dsir:' || tok), 2, 1)) - 1) * 256
             + (instr('0123456789abcdef', substr(md5('dsir:' || tok), 3, 1)) - 1) * 16
             + (instr('0123456789abcdef', substr(md5('dsir:' || tok), 4, 1)) - 1)
             ) % {_DSIR_B} AS BIGINT) AS b
      FROM tok
    ), counts AS (
      SELECT b, COUNT(*) AS raw_n,
             COUNT(*) FILTER (WHERE lang = 'en') AS tgt_n
      FROM tb GROUP BY b
    ), tot AS (
      SELECT SUM(raw_n) AS raw_total, SUM(tgt_n) AS tgt_total FROM counts
    ), w AS (
      SELECT b, (1000000 * tgt_n) // nullif(tgt_total, 0)
               - (1000000 * raw_n) // nullif(raw_total, 0) AS w_ppm
      FROM counts, tot
    )
    SELECT t.doc_id, t.lang,
           COUNT(*) AS n_tokens,
           CAST(SUM(w.w_ppm) AS BIGINT) AS dsir_score_ppm
    FROM tb t JOIN w USING (b)
    WHERE t.lang <> 'en'
    GROUP BY t.doc_id, t.lang
    ORDER BY dsir_score_ppm DESC, t.doc_id
    LIMIT {_DSIR_TOPK}
    """,
    doc="DSIR-style importance selection (Xie et al. 2023, 'Data "
    "Selection for Language Models via Importance Resampling'): score "
    "every candidate doc by how target-like its HASHED n-gram feature "
    "profile is, using the per-bucket frequency gap between the "
    "target distribution (here the lang='en' slice) and the raw "
    "corpus; return the top-k most target-like candidates from "
    "OUTSIDE the target. Weights are exact integer ppm (tgt ppm - raw "
    "ppm via DIV), so scores are bigint-exact in both engines - the "
    "published method's log-ratio becomes a frequency-gap linear "
    "score, keeping the oracle bit-stable (no libm log). Scale shape: "
    "the feature space is FIXED at 1024 buckets, so both target and "
    "raw distributions come out of ONE map-side-combinable groupBy "
    "(count + filtered count in the same pass), the weight table is a "
    "<=1024-row broadcast, and the per-doc score is one more combinable "
    "aggregate ending in TakeOrderedAndProject - two bounded shuffles "
    "at any corpus size, no vocab-sized state, no collect, no UDF.",
    tags=("llm", "sampling", "quality"),
)
def sample_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.dedup import tokenize

    # no fanout(): shuffling the full text column to spread a sub-MB
    # single-file scan costs more than the single-threaded tokenize
    # pass it parallelizes (0.58s vs 0.30s per pass at sf0.1); any
    # at-scale input scans as many partitions natively
    d = load(spark, sf_dir, "documents")
    tokb = d.select(
        "doc_id",
        "lang",
        F.explode(tokenize(F.col("text"))).alias("tok"),
    ).select("doc_id", "lang", _dsir_bucket(F.col("tok")).alias("b"))
    # Per-doc bucket histogram: map-side partial aggregation collapses
    # each doc's token stream to <=1024 rows BEFORE any exchange, so
    # both consumers below shuffle histogram rows, never token rows.
    # The two legs still each run the tokenize+md5 scan (ReuseExchange
    # cannot dedupe them — the scoring leg's lang<>'en' filter is on a
    # grouping column, so Catalyst pushes it below the aggregate and
    # the subtrees diverge); persist() was measured and REJECTED: at
    # sf0.1 cache write+read costs more than the second 0.3s scan
    # (1.58s persisted vs 0.89s recomputed, best-of-3 grid in
    # PERFORMANCE.md). At 100 TB the same shape holds per-partition:
    # the shuffled histogram is ~1% of the tokenized stream.
    hist = tokb.groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).alias("n_b")
    )
    counts = hist.groupBy("b").agg(
        F.sum("n_b").alias("raw_n"),
        F.sum(
            F.when(F.col("lang") == "en", F.col("n_b")).otherwise(F.lit(0))
        ).alias("tgt_n"),
    )
    tot = counts.agg(
        F.sum("raw_n").alias("raw_total"), F.sum("tgt_n").alias("tgt_total")
    )
    weights = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.expr("(1000000 * tgt_n) DIV nullif(tgt_total, 0)")
            - F.expr("(1000000 * raw_n) DIV nullif(raw_total, 0)")
        ).alias("w_ppm"),
    )
    return (
        hist.where(F.col("lang") != "en")
        .join(F.broadcast(weights), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("n_b").cast("bigint").alias("n_tokens"),
            F.sum(F.col("n_b") * F.col("w_ppm"))
            .cast("bigint")
            .alias("dsir_score_ppm"),
        )
        .orderBy(F.desc("dsir_score_ppm"), "doc_id")
        .limit(_DSIR_TOPK)
    )


def _epoch_hk(epoch: int, col):
    """Per-epoch deterministic shuffle key: md5 of the epoch-salted id.
    Same id, different epoch -> independent hash -> independent order."""
    return F.md5(F.concat(F.lit(f"epoch:{epoch}:"), col.cast("string")))


@register(
    "corpus_epoch_order",
    oracle=f"""
    WITH d AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT doc_id, md5('epoch:0:' || CAST(doc_id AS VARCHAR)) AS hk FROM d
    ), s0 AS (
      SELECT doc_id, hk,
             CAST(((instr('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16
                   + instr('0123456789abcdef', substr(hk, 2, 1)) - 1)
                  % {_N_SHARDS} AS INT) AS shard
      FROM e0
    ), p0 AS (
      SELECT doc_id AS a,
             lead(doc_id) OVER (PARTITION BY shard ORDER BY hk, doc_id) AS b
      FROM s0
    ), e1 AS (
      SELECT doc_id, md5('epoch:1:' || CAST(doc_id AS VARCHAR)) AS hk FROM d
    ), s1 AS (
      SELECT doc_id, hk,
             CAST(((instr('0123456789abcdef', substr(hk, 1, 1)) - 1) * 16
                   + instr('0123456789abcdef', substr(hk, 2, 1)) - 1)
                  % {_N_SHARDS} AS INT) AS shard
      FROM e1
    ), p1 AS (
      SELECT doc_id AS a,
             lead(doc_id) OVER (PARTITION BY shard ORDER BY hk, doc_id) AS b
      FROM s1
    ), shared AS (
      SELECT COUNT(*) AS c
      FROM (SELECT a, b FROM p0 WHERE b IS NOT NULL) x
      JOIN (SELECT a, b FROM p1 WHERE b IS NOT NULL) y USING (a, b)
    )
    SELECT 0 AS epoch, COUNT(*) AS n_docs,
           CAST(COUNT(*) - COUNT(DISTINCT shard) AS BIGINT) AS n_pairs,
           arg_min(doc_id, hk) AS first_doc, arg_max(doc_id, hk) AS last_doc,
           (SELECT c FROM shared) AS shared_adjacencies
    FROM s0
    UNION ALL
    SELECT 1, COUNT(*),
           CAST(COUNT(*) - COUNT(DISTINCT shard) AS BIGINT),
           arg_min(doc_id, hk), arg_max(doc_id, hk),
           (SELECT c FROM shared)
    FROM s1
    ORDER BY epoch
    """,
    doc="Epoch-reshuffled training order: each epoch orders the corpus "
    "by an epoch-salted md5 (shard = first-byte mod N, within-shard "
    "order = full hash — corpus_shuffle_shards' layout, re-keyed per "
    "epoch), so every epoch's order is byte-REPRODUCIBLE given "
    "(corpus, epoch) while any two epochs are statistically "
    "independent — repeating one fixed order every epoch is a known "
    "convergence harm, and this is the deterministic alternative to "
    "an unseeded shuffle. The audit emits per-epoch doc counts, "
    "adjacency-pair counts, hash-order first/last docs (pinning the "
    "ORDER, not just membership), and the cross-epoch count of SHARED "
    "adjacent pairs — the decorrelation statement (expected ~n/256 "
    "shared pairs by chance; a correlated reshuffle would score near "
    "n). Scale: per epoch one hash exchange + one shard-keyed window "
    "(identical to the shard-assembly plan), then an equi-join on "
    "pair keys — no global-order single-partition window anywhere.",
    tags=("llm", "sampling", "layout"),
)
def corpus_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id")
    legs = []
    pairs = []
    for e in (0, 1):
        hk = _epoch_hk(e, F.col("doc_id"))
        s = d.select(
            "doc_id",
            hk.alias("hk"),
            (
                F.conv(F.substring(hk, 1, 2), 16, 10).cast("int") % _N_SHARDS
            ).alias("shard"),
        )
        w = W.partitionBy("shard").orderBy("hk", "doc_id")
        pairs.append(
            s.select(
                F.col("doc_id").alias("a"), F.lead("doc_id").over(w).alias("b")
            ).where(F.col("b").isNotNull())
        )
        legs.append(
            s.agg(
                F.lit(e).alias("epoch"),
                F.count(F.lit(1)).alias("n_docs"),
                (F.count(F.lit(1)) - F.countDistinct("shard"))
                .cast("bigint")
                .alias("n_pairs"),
                F.min_by("doc_id", "hk").alias("first_doc"),
                F.max_by("doc_id", "hk").alias("last_doc"),
            )
        )
    shared = pairs[0].join(pairs[1], ["a", "b"]).agg(
        F.count(F.lit(1)).alias("shared_adjacencies")
    )
    return (
        legs[0]
        .unionByName(legs[1])
        .crossJoin(F.broadcast(shared))
        .orderBy("epoch")
    )


@register(
    "assemble_training_run",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), w AS (
      SELECT source, 1 + (CAST(substr(source, 4) AS INT) % 3) AS weight
      FROM (SELECT DISTINCT source FROM toks)
    ), tot AS (SELECT SUM(weight) AS tw FROM w),
    q0 AS (
      SELECT source, weight,
             CAST(floor({_MIX_BUDGET} * weight / tw) AS BIGINT) AS base,
             ({_MIX_BUDGET} * weight / tw)
               - floor({_MIX_BUDGET} * weight / tw) AS rem
      FROM w, tot
    ), leftover AS (SELECT {_MIX_BUDGET} - SUM(base) AS k FROM q0),
    quotas AS (
      SELECT source,
             base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                              <= k THEN 1 ELSE 0 END AS quota
      FROM q0, leftover
    ), ranked AS (
      SELECT t.doc_id, t.source, t.n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY t.source
               ORDER BY md5(CAST(t.doc_id AS VARCHAR)), t.doc_id
             ) AS rn
      FROM toks t
    ), kept AS (
      SELECT r.doc_id, r.source, r.n_tokens
      FROM ranked r JOIN quotas q ON r.source = q.source AND r.rn <= q.quota
    ), ordered AS (
      SELECT doc_id, source, n_tokens,
             md5('epoch:0:' || CAST(doc_id AS VARCHAR)) AS hk,
             CAST(((instr('0123456789abcdef',
                          substr(md5('epoch:0:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                   + instr('0123456789abcdef',
                           substr(md5('epoch:0:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                  % {_N_SHARDS} AS INT) AS shard
      FROM kept
    ), packed AS (
      SELECT shard, source, n_tokens,
             CAST(floor((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY hk, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                        / 512) AS BIGINT) AS pack_id
      FROM ordered
    )
    SELECT 'shard ' || CAST(shard AS VARCHAR) AS grp,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM packed GROUP BY shard
    UNION ALL
    SELECT 'source ' || source, COUNT(*), CAST(0 AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT)
    FROM packed GROUP BY source
    ORDER BY grp
    """,
    doc="Training-run ASSEMBLY flagship — the last-mile composite in "
    "ONE plan: (1) exact largest-remainder domain mixture fills "
    "per-source quotas with deterministic bottom-by-hash samples "
    "(sample_mixture_weights), (2) the kept docs take the epoch-0 "
    "reshuffled order (corpus_epoch_order's salted-hash shard + "
    "within-shard order), (3) each shard greedy-packs into 512-token "
    "training sequences (text_pack_sequences' cumulative idiom). The "
    "audit reports per-shard doc/pack/token mass AND per-source kept "
    "mass — proving the mixture held through assembly. Every stage "
    "is engine-portable md5 arithmetic, so the whole run is "
    "byte-reproducible. Scale shape: a k-row broadcast quota table, "
    "one source-keyed window (the mixture rank), one shard-keyed "
    "window (order + packing in the same exchange), and combinable "
    "final aggregates — three bounded shuffles for the full pipeline, "
    "no collect, no UDF.",
    tags=("llm", "sampling", "pack", "layout"),
)
def assemble_training_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = toks.select("source").distinct().select(
        "source",
        (1 + F.substring("source", 4, 10).cast("int") % 3).alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("tw"))
    exact = F.lit(_MIX_BUDGET) * F.col("weight") / F.col("tw")
    q0 = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(exact).alias("base"),
        (exact - F.floor(exact)).alias("rem"),
    )
    leftover = q0.agg((F.lit(_MIX_BUDGET) - F.sum("base")).alias("k"))
    quotas = (
        q0.crossJoin(F.broadcast(leftover))
        .withColumn(
            "tr",
            F.row_number().over(
                W.partitionBy().orderBy(F.col("rem").desc(), F.col("source"))
            ),
        )
        .select(
            "source",
            (F.col("base") + F.when(F.col("tr") <= F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("quota"),
        )
    )
    ranked = toks.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        ),
    )
    kept = ranked.join(F.broadcast(quotas), "source").where(
        F.col("rn") <= F.col("quota")
    )
    hk = _epoch_hk(0, F.col("doc_id"))
    ordered = kept.select(
        "doc_id",
        "source",
        "n_tokens",
        hk.alias("hk"),
        (F.conv(F.substring(hk, 1, 2), 16, 10).cast("int") % _N_SHARDS).alias(
            "shard"
        ),
    )
    wsh = (
        W.partitionBy("shard")
        .orderBy("hk", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = ordered.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(wsh) - F.col("n_tokens")) / 512).cast(
            "bigint"
        ),
    )
    by_shard = packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("pack_id").cast("bigint").alias("n_packs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    ).select(
        F.concat(F.lit("shard "), F.col("shard").cast("string")).alias("grp"),
        "n_docs",
        "n_packs",
        "sum_tokens",
    )
    by_source = packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.lit(0).cast("bigint").alias("n_packs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    ).select(
        F.concat(F.lit("source "), F.col("source")).alias("grp"),
        "n_docs",
        "n_packs",
        "sum_tokens",
    )
    return by_shard.unionByName(by_source).orderBy("grp")
