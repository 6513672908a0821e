"""connected_components: multi-hop propagation + isolated nodes."""

from __future__ import annotations

from binance_etl_spark.operators.dedup import connected_components


def test_cc_chain_and_singleton(spark):
    # chain 1-2-3-4 (diameter 3), pair 7-5, isolated 9
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (7, 5)], "src BIGINT, dst BIGINT"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 7, 9)], "node BIGINT")
    got = {r.node: r.cluster_id for r in connected_components(edges, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 7: 5, 9: 9}


def test_cc_edges_only_no_nodes_df(spark):
    edges = spark.createDataFrame([(10, 20), (20, 30)], "src BIGINT, dst BIGINT")
    got = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {10: 10, 20: 10, 30: 10}


def test_cc_random_graphs_match_union_find(spark):
    """Property: distributed min-label CC == driver union-find on random
    graphs (including deeper chains than near-dup graphs produce)."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: min(y for y in range(n) if find(y) == find(x)) for x in range(n)}

        edf = spark.createDataFrame(edges or [(0, 0)], "src BIGINT, dst BIGINT")
        ndf = spark.createDataFrame([(i,) for i in range(n)], "node BIGINT")
        got = {
            r.node: r.cluster_id
            for r in __import__(
                "binance_etl_spark.operators.dedup", fromlist=["connected_components"]
            ).connected_components(edf, nodes=ndf).collect()
        }
        assert got == want, f"trial {trial} mismatch"


def test_cc_string_node_ids(spark):
    # Round-1 advisory: the old SUM(lbl) fixpoint was NULL for string
    # ids, so NULL == NULL "converged" after one hop and a diameter-3
    # chain came back unconverged. md5/content-hash doc ids are the
    # natural key in the dedup pipeline, so string ids must work.
    edges = spark.createDataFrame(
        [("bb", "aa"), ("bb", "cc"), ("cc", "dd"), ("zz", "yy")],
        "src STRING, dst STRING",
    )
    got = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {"aa": "aa", "bb": "aa", "cc": "aa", "dd": "aa", "yy": "yy", "zz": "yy"}


def test_cc_deep_chain_converges_via_pointer_jumping(spark):
    # A 200-node path has diameter 199: edge propagation alone would
    # need 199 rounds (max_iter=20 would silently truncate before the
    # round-2 convergence guard). Pointer jumping closes it in
    # O(log n) rounds.
    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src BIGINT, dst BIGINT"
    )
    got = {r.node: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(n)}


def test_cc_raises_when_not_converged(spark, monkeypatch):
    import pytest

    from binance_etl_spark.operators import dedup as DED

    # the non-convergence contract belongs to the DISTRIBUTED path —
    # the driver union-find (which would absorb this tiny chain)
    # always converges, so force the distributed loop
    monkeypatch.setattr(DED, "_CC_DRIVER_EDGES_MAX", 0)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(49)], "src BIGINT, dst BIGINT"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_driver_path_equals_distributed(spark, monkeypatch):
    """The round-11 size-adaptive switch: the driver union-find path
    and the distributed min-label loop must return IDENTICAL rows on
    the same graph — seeded and unseeded, string and long ids, dup
    edges, self-loops, isolated seeds, and a component with no seed
    (seeded case: it must not emit)."""
    import random

    from binance_etl_spark.operators import dedup as DED

    rng = random.Random(7)
    cases = []
    # random long graphs, unseeded
    for _ in range(2):
        cases.append(
            (
                [(rng.randrange(30), rng.randrange(30)) for _ in range(25)],
                "src BIGINT, dst BIGINT",
                None,
            )
        )
    # dup edges + self loop, unseeded
    cases.append(([(1, 2), (2, 1), (1, 2), (3, 3)], "src BIGINT, dst BIGINT", None))
    # string ids, unseeded
    cases.append(
        ([("b", "a"), ("b", "c"), ("z", "y")], "src STRING, dst STRING", None)
    )
    # seeded: isolated seed 9, component {5,6} with NO seed must not emit
    cases.append(
        (
            [(1, 2), (2, 3), (5, 6)],
            "src BIGINT, dst BIGINT",
            [1, 2, 3, 9],
        )
    )
    for i, (edges, schema, seeds) in enumerate(cases):
        edf = spark.createDataFrame(edges, schema)
        ndf = (
            spark.createDataFrame([(s,) for s in seeds], "node BIGINT")
            if seeds is not None
            else None
        )
        monkeypatch.setattr(DED, "_CC_DRIVER_EDGES_MAX", 100_000)
        drv = {
            (r.node, r.cluster_id)
            for r in connected_components(edf, nodes=ndf).collect()
        }
        monkeypatch.setattr(DED, "_CC_DRIVER_EDGES_MAX", 0)
        dist = {
            (r.node, r.cluster_id)
            for r in connected_components(edf, nodes=ndf).collect()
        }
        assert drv == dist, f"case {i}: driver {drv} != distributed {dist}"


def test_leakage_safe_split_never_splits_a_cluster(spark):
    """The invariant the op exists for: every near-dup cluster lands
    entirely on one side; and on this fixture (built with cross-doc
    near-dup chains) the naive doc-hash rule WOULD have leaked."""
    from pyspark.sql import functions as F

    from binance_etl_spark.plans.llm_ops3 import dedup_cluster_cc

    sf = "/root/testdata/sf0.01"
    clusters = dedup_cluster_cc(spark, sf)
    nib = F.expr(
        "instr('0123456789abcdef', substr(md5(CAST(cluster_id AS STRING)), 1, 1)) - 1"
    )
    assigned = clusters.select(
        "cluster_id", F.when(nib < 12, "train").otherwise("val").alias("split")
    )
    split_across = (
        assigned.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_sides"))
        .where(F.col("n_sides") > 1)
        .count()
    )
    assert split_across == 0, "a near-dup cluster crossed the split boundary"

    from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["split_leakage_safe"].fn(spark, sf).collect()
    assert sum(r["n_naive_leaks"] for r in rows) > 0, (
        "fixture has multi-doc near-dup clusters, so naive id-hash "
        "splitting must show non-zero would-be leakage"
    )
