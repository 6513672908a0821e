"""Training-set assembly properties (plans/llm_ops12.py) beyond the
value-level oracle: shard balance/partition-ness and exact mixture
apportionment."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_etl_spark.plans.llm_ops12 import _MIX_BUDGET, _N_SHARDS
from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_shards_partition_the_corpus_evenly(spark, sf_dir):
    audit = REGISTRY["corpus_shuffle_shards"].fn(spark, sf_dir).collect()
    assert sorted(r["shard"] for r in audit) == list(range(_N_SHARDS))
    total = sum(r["n_docs"] for r in audit)
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert total == n_docs, "shards partition the corpus: no doc lost or doubled"
    counts = [r["n_docs"] for r in audit]
    # md5 is uniform: no shard more than 2x any other at 500+ docs
    assert max(counts) <= 2 * min(counts), f"skewed shards: {counts}"


def test_shard_assignment_is_reproducible(spark, sf_dir):
    a = REGISTRY["corpus_shuffle_shards"].fn(spark, sf_dir).collect()
    b = REGISTRY["corpus_shuffle_shards"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), (
        "assembly must be a pure function of the corpus"
    )


def test_mixture_quotas_apportion_budget_exactly(spark, sf_dir):
    rows = REGISTRY["sample_mixture_weights"].fn(spark, sf_dir).collect()
    assert sum(r["quota"] for r in rows) == _MIX_BUDGET, (
        "largest-remainder apportionment must spend the budget exactly"
    )
    for r in rows:
        assert r["n_kept"] == r["quota"], (
            f"{r['source']}: quota {r['quota']} not filled ({r['n_kept']})"
        )
    # heavier sources get at least the quota of lighter ones
    by_weight = {}
    for r in rows:
        by_weight.setdefault(r["weight"], []).append(r["quota"])
    ws = sorted(by_weight)
    for lo, hi in zip(ws, ws[1:]):
        assert min(by_weight[hi]) >= max(by_weight[lo]) - 1, (
            "quotas must be monotone in weight (within one top-up slot)"
        )
