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


def test_arrow_and_sql_impls_bit_identical(spark):
    """The vectorized Arrow fast path must be a bit-identical twin of
    the pure-expression reference path: same float32->float64 widening,
    same (a-b)*(a-b)*1e12 double ops, same floor-e12 int64 sums, same
    argmin-ties-to-lower-cid — on centroids AND assignments."""
    from binance_etl_spark.operators.kmeans import kmeans_fit

    e = load(spark, SF_DIR, "embeddings")
    c_sql, a_sql = kmeans_fit(e, "embedding", "vec_id", k=5, n_iter=2, impl="sql")
    c_ar, a_ar = kmeans_fit(e, "embedding", "vec_id", k=5, n_iter=2, impl="arrow")
    assert c_sql == c_ar
    rows_sql = sorted(tuple(r) for r in a_sql.collect())
    rows_ar = sorted(tuple(r) for r in a_ar.collect())
    assert rows_sql == rows_ar
