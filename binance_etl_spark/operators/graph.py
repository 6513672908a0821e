"""Iterative graph analytics beyond connected components
(operators/dedup.py::connected_components): PageRank.

Spark-first shape: each iteration is one equi-join (rank ⋈ edges on
src) + one map-side-combinable aggregate (sum of contributions per
dst) — O(iterations) shuffles, no driver-side adjacency. Like the CC
loop, every iteration `localCheckpoint`s (lazily since round 11 —
the next round's job materializes the blocks) so the plan does not
snowball across iterations (lineage of iteration k would otherwise
re-execute iterations 1..k-1 at every action).

Cross-engine determinism (the DuckDB oracle unrolls the same
iterations): ranks are BIGINT e-12 units; the only non-integer steps
are `floor(rank / degree)` and `floor(0.85 * in_sum)`, both IEEE
double ops on integers < 2^53 — bit-identical on every engine. A
float PageRank would accumulate summation-order drift instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 1_000_000_000_000  # 1.0 rank mass in e-12 integer units
DAMPING = 0.85


def pagerank(
    edges: DataFrame, n_iters: int = 3, seed: int | None = None
) -> DataFrame:
    """PageRank over `edges(src, dst)`, returning (node, rank_units).

    Simplified (no dangling-mass redistribution): nodes without
    out-edges leak their mass, as in the classic power-iteration
    demos. rank_0 = 1.0 per node; each iteration sends
    floor(rank/out_degree) along every edge and re-ranks as
    base + 0.85 * incoming, base = 0.15 in units.

    ``seed`` switches to PERSONALIZED PageRank: the restart mass
    (both rank_0 and the per-iteration base) concentrates entirely on
    the seed node instead of spreading uniformly — random walk with
    restart, the recommendation/relatedness primitive.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edges ⋈ degree is loop-invariant: materialize once.
    ed = edges.join(deg, "src").localCheckpoint(eager=True)

    if seed is None:
        rank = nodes.withColumn("r", F.lit(UNIT).cast("bigint"))
        base_col = F.lit(int(round((1 - DAMPING) * UNIT)))
    else:
        rank = nodes.withColumn(
            "r",
            F.when(F.col("node") == seed, F.lit(UNIT))
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
        base_col = F.when(
            F.col("node") == seed, F.lit(int(round((1 - DAMPING) * UNIT)))
        ).otherwise(F.lit(0))
    for _ in range(n_iters):
        contrib = (
            ed.join(rank, ed["src"] == rank["node"])
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("r") / F.col("deg")).cast("bigint").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        rank = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    base_col
                    + F.floor(F.lit(DAMPING) * F.coalesce("in_sum", F.lit(0)))
                ).cast("bigint").alias("r"),
            )
            # lazy (round-11): the next iteration's job — or the final
            # consumer — materializes the blocks; plan stays flat
            # (LogicalRDD) with one Spark action for the whole loop
            .localCheckpoint(eager=False)
        )
    return rank.select("node", F.col("r").alias("rank_units"))


def label_propagation(und_edges: DataFrame, n_iters: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection over
    undirected `und_edges(u, v)`, returning (node, community).

    Deterministic variant (no randomness, so the DuckDB oracle can
    unroll it): labels start as the node id; each iteration every node
    adopts the MOST FREQUENT label among its neighbours, ties broken
    by the SMALLEST label. Same Spark-first shape as pagerank: per
    iteration one labels⋈edges equi-join, one (node, label) count
    aggregate, one per-node argmax window — O(iters) shuffles, eager
    localCheckpoint per iteration to keep lineage flat. The argmax is
    `max_by(label, (count, -label))`: max count first, then the
    smallest label, with no ROW_NUMBER sort over the whole graph.
    """
    nb = (
        und_edges.select(F.col("u").alias("node"), F.col("v").alias("neigh"))
        .union(und_edges.select(F.col("v").alias("node"), F.col("u").alias("neigh")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nb.select("node").distinct().withColumn(
        "label", F.col("node").cast("bigint")
    )
    for _ in range(n_iters):
        neigh_lbl = nb.join(
            labels.withColumnRenamed("node", "neigh"), "neigh"
        ).select("node", "label")
        cnt = neigh_lbl.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = (
            cnt.groupBy("node")
            .agg(
                F.expr("max_by(label, struct(c, -label))").alias("label")
            )
            .localCheckpoint(eager=False)  # lazy: see pagerank note
        )
    return labels.select("node", F.col("label").alias("community"))


def bfs_distances(
    und_edges: DataFrame, seed_expr: str, n_iters: int = 4
) -> DataFrame:
    """Multi-source BFS over `und_edges(u, v)` (undirected): hop
    distance from the nearest seed node (rows where `seed_expr` holds
    on the node id), bounded to `n_iters` relaxation rounds — the
    frontier-expansion layer under shortest-path / k-hop-neighborhood
    queries. Returns (node, dist) for REACHED nodes only.

    Per iteration: one dist ⋈ edges equi-join + one min-combine per
    node — map-side combinable, O(iterations) shuffles, eager
    localCheckpoint keeping lineage flat (same discipline as the
    PageRank/LPA loops above). Fixed iteration count keeps the DuckDB
    oracle an exact unroll; distances are BIGINT so min() is
    order-free on every engine."""
    nb = (
        und_edges.select(F.col("u").alias("node"), F.col("v").alias("neigh"))
        .unionByName(
            und_edges.select(
                F.col("v").alias("node"), F.col("u").alias("neigh")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = (
        nb.select("node")
        .distinct()
        .where(F.expr(seed_expr))
        .select("node", F.lit(0).cast("bigint").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iters):
        dist = (
            dist.unionByName(
                dist.join(nb, "node")
                .select(
                    F.col("neigh").alias("node"),
                    (F.col("dist") + 1).alias("dist"),
                )
            )
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)  # lazy: see pagerank note
        )
    return dist
