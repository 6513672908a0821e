"""Thirteenth LLM-pipeline batch: the published pre-training FILTER
batteries — Gopher's repetition/format rules and C4's line-level
cleaning — as pure-codegen per-document operators.

- text_gopher_rules: the Gopher quality battery (Rae et al. 2021,
  Appendix A): word-count bounds, mean-word-length bounds,
  symbol-to-word ratio (# and ellipses), bullet-start and
  ellipsis-end line fractions, alphabetic-word fraction, duplicate-
  line fraction — each metric plus the composite pass flag. These are
  the rules virtually every web-scale corpus (MassiveText, RefinedWeb,
  Dolma, FineWeb) applies before anything model-based runs.
- text_c4_clean: C4's line-level cleaning (Raffel et al. 2020): keep
  only lines that end in terminal punctuation and have >= 5 words;
  drop whole documents carrying code/boilerplate markers ('{',
  'lorem ipsum') — reported as kept/dropped line counts, retained
  char length, and the doc-drop flag.

Scale posture: both are single-pass projections over pre-split arrays
— no shuffle, no UDF, fully inside WholeStageCodegen; at 100 TB they
run at scan speed, which is exactly why these batteries are the FIRST
stage of real pipelines. The line/word splits bind ONCE into named
intermediate columns so interpreted HOF lambdas don't re-split per
predicate (the operators/dedup.py::shingles lesson).

Reference parity note: the reference ETL (binance_etl, ~539 LoC) has
no corpus surface; north-star extension per SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

# Gopher thresholds (Rae et al. 2021, Table A1)
_G_MIN_WORDS, _G_MAX_WORDS = 50, 100_000
_G_MIN_MWL, _G_MAX_MWL = 3.0, 10.0
_G_MAX_SYMBOL_RATIO = 0.1
_G_MAX_BULLET_FRAC = 0.9
_G_MAX_ELLIPSIS_FRAC = 0.3
_G_MIN_ALPHA_FRAC = 0.8
_G_MAX_DUP_LINE_FRAC = 0.3


@register(
    "text_gopher_rules",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             string_split(text, chr(10)) AS lines,
             length(text) AS n_chars,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell
      FROM documents WHERE doc_id < 500
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CAST(n_chars - len(toks) + 1 AS DOUBLE) / len(toks) AS mean_word_len,
             CAST(n_hash + n_ell AS DOUBLE) / len(toks) AS symbol_ratio,
             CAST(len(list_filter(lines,
                    l -> starts_with(ltrim(l), '-') OR starts_with(ltrim(l), '*')))
                  AS DOUBLE) / len(lines) AS bullet_frac,
             CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...')))
                  AS DOUBLE) / len(lines) AS ellipsis_frac,
             CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
                  AS DOUBLE) / len(toks) AS alpha_frac,
             1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
               AS dup_line_frac
      FROM d
    )
    SELECT *,
           (n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}
            AND mean_word_len BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL}
            AND symbol_ratio <= {_G_MAX_SYMBOL_RATIO}
            AND bullet_frac <= {_G_MAX_BULLET_FRAC}
            AND ellipsis_frac <= {_G_MAX_ELLIPSIS_FRAC}
            AND alpha_frac >= {_G_MIN_ALPHA_FRAC}
            AND dup_line_frac <= {_G_MAX_DUP_LINE_FRAC}) AS passes
    FROM m
    """,
    doc="The Gopher quality-filter battery (Rae et al. 2021 App. A): "
    "word-count and mean-word-length bounds, symbol-to-word ratio "
    "(# + '...'), bullet-start / ellipsis-end line fractions, "
    "alphabetic-word fraction, duplicate-line fraction, and the "
    "composite pass flag. Single-pass codegen projection — splits "
    "bind once, every rule is a filter/size over the same arrays; no "
    "shuffle, no UDF, scan-speed at 100 TB.",
    tags=("text",),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    n_ell = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / 3
    base = d.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.split("text", "\n").alias("lines"),
        F.length("text").alias("n_chars"),
        (n_hash + n_ell).cast("bigint").alias("n_sym"),
    )
    n_words = F.size("toks")
    n_lines = F.size("lines")
    bullet = F.size(
        F.filter(
            "lines",
            lambda line: F.ltrim(line).startswith("-")
            | F.ltrim(line).startswith("*"),
        )
    )
    ellip = F.size(F.filter("lines", lambda line: F.rtrim(line).endswith("...")))
    alpha = F.size(F.filter("toks", lambda t: t.rlike("[A-Za-z]")))
    m = base.select(
        "doc_id",
        n_words.alias("n_words"),
        ((F.col("n_chars") - n_words + 1).cast("double") / n_words).alias(
            "mean_word_len"
        ),
        (F.col("n_sym").cast("double") / n_words).alias("symbol_ratio"),
        (bullet.cast("double") / n_lines).alias("bullet_frac"),
        (ellip.cast("double") / n_lines).alias("ellipsis_frac"),
        (alpha.cast("double") / n_words).alias("alpha_frac"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct("lines")).cast("double") / n_lines
        ).alias("dup_line_frac"),
    )
    return m.withColumn(
        "passes",
        F.col("n_words").between(_G_MIN_WORDS, _G_MAX_WORDS)
        & F.col("mean_word_len").between(_G_MIN_MWL, _G_MAX_MWL)
        & (F.col("symbol_ratio") <= _G_MAX_SYMBOL_RATIO)
        & (F.col("bullet_frac") <= _G_MAX_BULLET_FRAC)
        & (F.col("ellipsis_frac") <= _G_MAX_ELLIPSIS_FRAC)
        & (F.col("alpha_frac") >= _G_MIN_ALPHA_FRAC)
        & (F.col("dup_line_frac") <= _G_MAX_DUP_LINE_FRAC),
    )


@register(
    "text_c4_clean",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, string_split(text, chr(10)) AS lines
      FROM documents WHERE doc_id < 500
    ), k AS (
      SELECT doc_id, text, len(lines) AS n_lines,
             list_filter(lines, l ->
               (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
                OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"'))
               AND len(string_split(trim(l), ' ')) >= 5) AS kept
      FROM d
    )
    SELECT doc_id,
           n_lines,
           len(kept) AS n_kept,
           n_lines - len(kept) AS n_dropped,
           -- DuckDB: array_to_string([]) is NULL; Spark's array_join
           -- gives '' — coalesce to the empty-doc answer 0
           CAST(COALESCE(length(array_to_string(kept, chr(10))), 0) AS BIGINT)
             AS kept_chars,
           (contains(lower(text), 'lorem ipsum') OR contains(text, '{')) AS doc_dropped
    FROM k
    """,
    doc="C4 line-level cleaning (Raffel et al. 2020): keep lines that "
    "end in terminal punctuation ('.', '!', '?', '\"') AND have >= 5 "
    "words; drop whole docs containing code/boilerplate markers "
    "('{', 'lorem ipsum'). Reports kept/dropped line counts, retained "
    "char length, and the doc-drop flag — one codegen projection, "
    "line split bound once.",
    tags=("text",),
)
def text_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    base = d.select(
        "doc_id", "text", F.split("text", "\n").alias("lines")
    )
    term = lambda line: (  # noqa: E731
        F.rtrim(line).endswith(".")
        | F.rtrim(line).endswith("!")
        | F.rtrim(line).endswith("?")
        | F.rtrim(line).endswith('"')
    )
    kept = F.filter(
        "lines",
        lambda line: term(line) & (F.size(F.split(F.trim(line), " ")) >= 5),
    )
    k = base.select(
        "doc_id",
        "text",
        F.size("lines").alias("n_lines"),
        kept.alias("kept"),
    )
    return k.select(
        "doc_id",
        "n_lines",
        F.size("kept").alias("n_kept"),
        (F.col("n_lines") - F.size("kept")).alias("n_dropped"),
        F.length(F.array_join("kept", "\n")).cast("bigint").alias("kept_chars"),
        (
            F.contains(F.lower("text"), F.lit("lorem ipsum"))
            | F.contains("text", F.lit("{"))
        ).alias("doc_dropped"),
    )
