"""k-means operator invariants: partition of input, determinism,
assignment optimality against the final centroids."""

from __future__ import annotations

from binance_etl_spark.catalog import load
from binance_etl_spark.operators.kmeans import kmeans_fit_assign

SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_partitions_input_and_is_deterministic(spark):
    e = load(spark, SF_DIR, "embeddings")
    a1 = kmeans_fit_assign(e, k=4, n_iter=2).collect()
    a2 = kmeans_fit_assign(e.repartition(7), k=4, n_iter=2).collect()
    m1 = {r.vec_id: (r.cluster, round(r.dist, 9)) for r in a1}
    m2 = {r.vec_id: (r.cluster, round(r.dist, 9)) for r in a2}
    assert m1 == m2, "assignment depends on partitioning"
    assert len(m1) == e.count()
    assert {c for c, _ in m1.values()} <= set(range(4))


def test_kmeans_reduces_cost_vs_init(spark):
    e = load(spark, SF_DIR, "embeddings")
    cost0 = sum(r.dist for r in kmeans_fit_assign(e, k=4, n_iter=0).collect())
    cost3 = sum(r.dist for r in kmeans_fit_assign(e, k=4, n_iter=3).collect())
    assert cost3 <= cost0 + 1e-9, f"Lloyd iterations increased cost: {cost0} -> {cost3}"
