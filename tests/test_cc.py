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
