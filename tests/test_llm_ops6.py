"""Semantic invariants for the chunk/quantize/novelty/temperature ops —
properties the DuckDB oracle can't express (it only proves both engines
agree; these prove the shared answer means what it claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

SF = "/root/testdata/sf0.001"


def test_quantize_int8_bounds(spark):
    out = REGISTRY["emb_quantize_int8"].fn(spark, SF)
    bad = out.where(
        (F.col("max_abs_q") > 127)
        | (F.col("max_abs_q") < 0)
        | (F.col("sum_abs_err_units") < 0)
        # floor-truncation error is < 1 unit of scale (amax/127) per
        # element, so the per-vector total is < n_dims * amax/127 + n_dims
        | (
            F.col("sum_abs_err_units")
            > (F.col("n_dims") * F.col("amax_units")) / 127 + F.col("n_dims")
        )
    )
    assert bad.count() == 0


def test_chunks_cover_and_rebuild_text(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    chunks = REGISTRY["text_chunk_overlap"].fn(spark, SF)
    # stride-60 prefixes of each 80-char chunk, concatenated in order,
    # must rebuild the original text exactly (the overlap is redundant)
    rebuilt = (
        chunks.withColumn("piece", F.expr("substr(chunk_text, 1, 60)"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("chunk_no", "piece"))), lambda s: s["piece"])
            ).alias("rebuilt")
        )
    )
    joined = docs.join(rebuilt, "doc_id")
    assert joined.where(F.col("rebuilt") != F.col("text")).count() == 0


def test_novelty_conserves_distinct_grams(spark):
    out = REGISTRY["text_ngram_novelty"].fn(spark, SF)
    # every distinct gram in the corpus is novel for exactly one doc
    total_novel = out.agg(F.sum("n_novel")).first()[0]
    from binance_etl_spark.operators.dedup import shingles

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    distinct_grams = (
        docs.select(F.explode(shingles(F.col("text"), 3)).alias("g"))
        .distinct()
        .count()
    )
    assert total_novel == distinct_grams


def test_temperature_quota_sums_to_budget(spark):
    out = REGISTRY["sample_temperature"].fn(spark, SF).collect()
    total_quota = sum(r["quota_docs"] for r in out)
    # floor division undershoots by < 1 per source
    assert 10_000 - len(out) < total_quota <= 10_000
    for r in out:
        assert 0 <= r["share_ppm"] <= 1_000_000
