"""Graph analytics queries: PageRank over a deterministic event graph.

The link graph derives from `events` by pure arithmetic (src=user_id,
dst=(user_id*13 + len(event_type)) % 100) so both engines construct
the identical edge set with no randomness — what is under test is the
iterative join+aggregate machinery, not the graph construction.
Connected-components clustering (the other iterative graph op) lives
in plans/llm_ops3.py::dedup_cluster_cc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

_DST = "(user_id * 13 + length(event_type)) % 100"

# One PageRank iteration as a DuckDB CTE body: rank table `{prev}` ->
# new rank per node. Mirrors operators/graph.py::pagerank exactly:
# floor(r/deg) contributions, base + floor(0.85 * in_sum).
_SQL_ITER = """
  SELECT n.node,
         CAST(150000000000 + floor(0.85 * COALESCE(s.c, 0)) AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(CAST(floor(CAST(r.r AS DOUBLE) / d.d) AS BIGINT)) AS c
    FROM edges e
    JOIN deg d ON d.src = e.src
    JOIN {prev} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
"""


@register(
    "graph_pagerank",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT user_id AS src, {_DST} AS dst
      FROM events WHERE user_id <> {_DST}
    ), nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
      )
    ), deg AS (
      SELECT src, COUNT(*) AS d FROM edges GROUP BY src
    ), r0 AS (
      SELECT node, CAST(1000000000000 AS BIGINT) AS r FROM nodes
    ), it1 AS ({_SQL_ITER.format(prev="r0")}
    ), it2 AS ({_SQL_ITER.format(prev="it1")}
    ), it3 AS ({_SQL_ITER.format(prev="it2")})
    SELECT node, r AS rank_units FROM it3
    """,
    doc="PageRank, 3 power iterations over the deterministic event "
    "link graph (operators/graph.py): per iteration one rank⋈edges "
    "equi-join plus one map-side-combinable sum per dst — O(iters) "
    "shuffles, lazy per-iteration localCheckpoint so lineage stays "
    "flat (same discipline as dedup_cluster_cc). Ranks are BIGINT "
    "e-12 units; the two floor(double) steps operate on integers "
    "< 2^53, so the unrolled DuckDB oracle matches bit-for-bit. "
    "Dangling-node mass intentionally leaks (classic simplified PR).",
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.graph import pagerank

    e = load(spark, sf_dir, "events")
    dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
    edges = (
        e.select(F.col("user_id").alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return pagerank(edges, n_iters=3)


def triangle_counts(und: DataFrame) -> DataFrame:
    """Degree-oriented per-node triangle counts over canonical
    undirected edges (u < v, distinct) — the edge-parameterized core
    of graph_triangles, reused by scale_probe --graph10x on
    node-scaled synthetic graphs."""
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    j = und.join(
        deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    low_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = j.select(
        F.when(low_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(low_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(low_first, F.col("dv")).otherwise(F.col("du")).alias("dd"),
    )
    o1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"), F.col("dd").alias("db"))
    o2 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"), F.col("dd").alias("dc"))
    wedges = o1.join(o2, "a").where(
        (F.col("db") < F.col("dc")) | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("node")
    )


@register(
    "graph_triangles",
    oracle=f"""
    WITH und AS (  -- canonical undirected edges over the same link graph
      SELECT DISTINCT least(user_id, {_DST}) AS u, greatest(user_id, {_DST}) AS v
      FROM events WHERE user_id <> {_DST}
    ), deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und
      ) GROUP BY node
    ), o AS (  -- orient low-(degree, id) -> high: bounds wedge fan-out
      SELECT CASE WHEN (du.d, und.u) < (dv.d, und.v) THEN und.u ELSE und.v END AS src,
             CASE WHEN (du.d, und.u) < (dv.d, und.v) THEN und.v ELSE und.u END AS dst,
             CASE WHEN (du.d, und.u) < (dv.d, und.v) THEN dv.d ELSE du.d END AS dd
      FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v
    ), tri AS (  -- wedge at the low-degree apex + closing-edge lookup
      SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
      FROM o o1 JOIN o o2
        ON o2.src = o1.src
       AND ((o1.dd < o2.dd) OR (o1.dd = o2.dd AND o1.dst < o2.dst))
      JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst
    )
    SELECT node, COUNT(*) AS n_triangles
    FROM (SELECT UNNEST([a, b, c]) AS node FROM tri)
    GROUP BY node ORDER BY node
    """,
    doc="Per-node triangle counts via degree-oriented node-iterator "
    "(the compact-forward algorithm): orient every edge from its "
    "lower-(degree, id) endpoint, enumerate wedges only at the LOW-"
    "degree apex, and close each wedge with one equi-join. The "
    "orientation bounds per-node wedge fan-out by O(sqrt(|E|)) "
    "(arboricity), so a celebrity node with 10^6 neighbours generates "
    "no 10^12-wedge explosion — the difference between a plan that "
    "survives a power-law 100 TB graph and one that dies on its first "
    "hot vertex. Three shuffles total (degree agg, wedge self-join, "
    "closing join), all equi-keyed.",
    tags=("graph",),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
    und = (
        e.select(
            F.least(F.col("user_id"), dst).alias("u"),
            F.greatest(F.col("user_id"), dst).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return triangle_counts(und)


# One synchronous LPA iteration as a DuckDB CTE body: labels `{prev}`
# -> new label per node (mode of neighbour labels, ties -> smallest).
# ROW_NUMBER ordered by (count DESC, label ASC) == Spark's
# max_by(label, struct(c, -label)).
_LPA_ITER = """
  SELECT node, label FROM (
    SELECT nb2.node, l2.label,
           ROW_NUMBER() OVER (PARTITION BY nb2.node
                              ORDER BY COUNT(*) DESC, l2.label ASC) AS rn
    FROM nb nb2 JOIN {prev} l2 ON l2.node = nb2.neigh
    GROUP BY nb2.node, l2.label
  ) WHERE rn = 1
"""


@register(
    "graph_label_prop",
    oracle=f"""
    WITH und AS (
      SELECT DISTINCT least(user_id, {_DST}) AS u, greatest(user_id, {_DST}) AS v
      FROM events WHERE user_id <> {_DST}
    ), nb AS (
      SELECT u AS node, v AS neigh FROM und
      UNION
      SELECT v AS node, u AS neigh FROM und
    ), l0 AS (
      SELECT DISTINCT node, CAST(node AS BIGINT) AS label FROM nb
    ), it1 AS ({_LPA_ITER.format(prev="l0")}
    ), it2 AS ({_LPA_ITER.format(prev="it1")}
    ), it3 AS ({_LPA_ITER.format(prev="it2")})
    SELECT node, label AS community FROM it3 ORDER BY node
    """,
    doc="Community detection by synchronous label propagation, 3 "
    "iterations over the undirected event link graph "
    "(operators/graph.py::label_propagation): every node adopts the "
    "most frequent neighbour label, ties to the smallest — the "
    "deterministic LPA variant, so the DuckDB oracle unrolls the "
    "exact iterations (arg_max == max_by, integer labels, no "
    "randomness). Per iteration one labels-to-edges equi-join, one "
    "map-side-combinable (node, label) count, one argmax aggregate — "
    "O(iters) shuffles, lineage kept flat with lazy localCheckpoint "
    "like pagerank/CC; no per-node sort and no driver-side adjacency, "
    "so the plan survives a power-law 100 TB graph the same way the "
    "degree-oriented triangle count does.",
    tags=("graph", "iterative"),
)
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.graph import label_propagation

    e = load(spark, sf_dir, "events")
    dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
    und = (
        e.select(
            F.least(F.col("user_id"), dst).alias("u"),
            F.greatest(F.col("user_id"), dst).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return label_propagation(und, n_iters=3).orderBy("node")


_BFS_ITER = """
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM {prev}
    UNION ALL
    SELECT nb.neigh AS node, r.dist + 1 AS dist
    FROM nb JOIN {prev} r ON r.node = nb.node
  ) GROUP BY node
"""


@register(
    "graph_bfs_distances",
    oracle=f"""
    WITH und AS (
      SELECT DISTINCT least(user_id, {_DST}) AS u,
             greatest(user_id, {_DST}) AS v
      FROM events WHERE user_id <> {_DST}
    ), nb AS (
      SELECT u AS node, v AS neigh FROM und
      UNION
      SELECT v AS node, u AS neigh FROM und
    ), d0 AS (
      SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist
      FROM nb WHERE node % 50 = 0
    ), it1 AS ({_BFS_ITER.format(prev="d0")}
    ), it2 AS ({_BFS_ITER.format(prev="it1")}
    ), it3 AS ({_BFS_ITER.format(prev="it2")}
    ), it4 AS ({_BFS_ITER.format(prev="it3")})
    SELECT node, dist FROM it4 ORDER BY node
    """,
    doc="Multi-source BFS hop distances (4 relaxation rounds) from "
    "the seed set node%50=0 over the undirected event link graph — "
    "the frontier layer under shortest-path / k-hop-neighborhood "
    "queries (operators/graph.py::bfs_distances). Per iteration one "
    "dist-to-edges equi-join plus a map-side-combinable MIN per node "
    "— O(iters) shuffles, lazy localCheckpoint per round; BIGINT "
    "distances make MIN order-free, so the DuckDB oracle is an exact "
    "4-step unroll. Unreached nodes stay absent (no sentinel rows).",
    tags=("graph", "iterative", "join"),
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.graph import bfs_distances

    e = load(spark, sf_dir, "events")
    dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
    und = (
        e.select(
            F.least(F.col("user_id"), dst).alias("u"),
            F.greatest(F.col("user_id"), dst).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return bfs_distances(und, "node % 50 = 0", n_iters=4).orderBy("node")


_SQL_PPR_ITER = """
  SELECT n.node,
         CAST((CASE WHEN n.node = 0 THEN 150000000000 ELSE 0 END)
              + floor(0.85 * COALESCE(s.c, 0)) AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(floor(CAST(r.r AS DOUBLE) / d.d) AS BIGINT)) AS c
    FROM edges e
    JOIN deg d ON d.src = e.src
    JOIN {prev} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
"""


@register(
    "graph_ppr",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT user_id AS src, {_DST} AS dst
      FROM events WHERE user_id <> {_DST}
    ), nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
      )
    ), deg AS (
      SELECT src, COUNT(*) AS d FROM edges GROUP BY src
    ), r0 AS (
      SELECT node,
             CAST(CASE WHEN node = 0 THEN 1000000000000 ELSE 0 END
                  AS BIGINT) AS r
      FROM nodes
    ), it1 AS ({_SQL_PPR_ITER.format(prev="r0")}
    ), it2 AS ({_SQL_PPR_ITER.format(prev="it1")}
    ), it3 AS ({_SQL_PPR_ITER.format(prev="it2")})
    SELECT node, r AS rank_units FROM it3
    WHERE r > 0 ORDER BY node
    """,
    doc="Personalized PageRank (random walk with restart) from seed "
    "node 0 over the same deterministic event link graph as "
    "graph_pagerank: the restart mass — rank_0 AND the per-iteration "
    "base — concentrates entirely on the seed, so after 3 power "
    "iterations the nonzero ranks are exactly the seed's 3-hop "
    "relatedness neighborhood (the recommendation primitive; nodes "
    "the walk cannot reach stay at zero and are filtered). Same "
    "machinery and exactness as graph_pagerank: one rank-edges "
    "equi-join plus a map-side-combinable per-dst sum per iteration, "
    "BIGINT e-12 units, lazy localCheckpoint keeping lineage flat — "
    "the unrolled DuckDB oracle matches bit-for-bit.",
    tags=("graph", "iterative", "rag"),
)
def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.graph import pagerank

    e = load(spark, sf_dir, "events")
    dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
    edges = (
        e.select(F.col("user_id").alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return (
        pagerank(edges, n_iters=3, seed=0)
        .where(F.col("rank_units") > 0)
        .orderBy("node")
    )


# --- k-core decomposition (unrolled peeling) ----------------------------

_UE_SQL = f"""
      SELECT DISTINCT a, b FROM (
        SELECT user_id AS a, {_DST} AS b FROM events
        UNION ALL
        SELECT {_DST} AS a, user_id AS b FROM events
      ) WHERE a <> b
"""

_PEEL_SQL = """
  SELECT a, b FROM {edges}
  WHERE a IN (SELECT a FROM {edges} GROUP BY a HAVING COUNT(*) >= {k})
    AND b IN (SELECT a FROM {edges} GROUP BY a HAVING COUNT(*) >= {k})
"""


@register(
    "graph_kcore",
    oracle=f"""
    WITH ue AS ({_UE_SQL}
    ), e1 AS ({_PEEL_SQL.format(edges="ue", k=3)}
    ), e2 AS ({_PEEL_SQL.format(edges="e1", k=3)}
    ), e3 AS ({_PEEL_SQL.format(edges="e2", k=3)})
    SELECT a AS node, COUNT(*) AS core_degree
    FROM e3 GROUP BY a ORDER BY node
    """,
    doc="3-core decomposition by unrolled peeling over the undirected "
    "event link graph: each round drops every node of degree < 3 and "
    "the edges touching it (a degree aggregate + two semi-joins — the "
    "standard distributed k-core round, Quick/Wilkinson/Heasley "
    "shape); 3 rounds unrolled, same fixed-depth discipline as "
    "graph_bfs_distances, and the surviving nodes' degrees are "
    "exact integers. 100 TB shape: per round one combinable degree "
    "count and two hash semi-joins on the edge list — no all-pairs "
    "work, no driver adjacency; rounds-to-converge is bounded by "
    "graph depth, not data size. Each round's survivor set is "
    "localCheckpoint-ed (same discipline as pagerank/dedup_cluster_cc"
    "): both per-round references to `edges` would otherwise inline "
    "the whole prior lineage, re-scanning + re-distincting the edge "
    "list ~2^rounds times.",
    tags=("graph", "iterative"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
    fwd = e.select(F.col("user_id").alias("a"), dst.alias("b"))
    rev = e.select(dst.alias("a"), F.col("user_id").alias("b"))
    ue = fwd.unionAll(rev).where(F.col("a") != F.col("b")).distinct()
    return kcore_degrees(ue)


def kcore_degrees(
    ue: DataFrame, min_degree: int = 3, rounds: int = 3
) -> DataFrame:
    """The graph_kcore peel loop over both-orientation undirected
    edges (a, b) — edge-parameterized for scale_probe --graph10x.
    Per-round localCheckpoint keeps the iterative lineage flat (the
    round-9 fix: without it each peel re-ran ~2^rounds times)."""
    edges = ue.localCheckpoint(eager=True)
    for _ in range(rounds):
        keep = (
            edges.groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= min_degree)
            .select("a")
        )
        edges = (
            edges.join(keep, "a", "semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "semi")
            # lazy (round-11): the next peel's degree count — or the
            # final agg — materializes the blocks; one action total
            .localCheckpoint(eager=False)
        )
    return (
        edges.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .orderBy("node")
    )


# --- common-neighbor similarity (wedge join) ----------------------------


def common_neighbors_topk(ue: DataFrame, hub_cap: int, k: int = 20) -> DataFrame:
    """The wedge-join core over an undirected edge list (columns a, b;
    both orientations present, no self-loops): hub-capped shared-
    neighbor screen, one equi self-join, combinable pair count, two
    broadcast degree joins, TakeOrdered top-k."""
    full_deg = ue.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    # super-node screen: drop wedges THROUGH hub shared-neighbors
    # before the self-join (hub list is tiny by power-law — broadcast)
    hubs = full_deg.where(F.col("d") > hub_cap).select(F.col("a").alias("b"))
    screened = ue.join(F.broadcast(hubs), "b", "left_anti")
    # degrees come from the SCREENED edge list so numerator and
    # denominator live in the same universe (N'(v) = N(v) \\ hubs):
    # when the cap binds, full degrees would downward-bias Jaccard by
    # counting hub neighbors `common` can never include. Identical to
    # full degrees whenever the cap doesn't bind (bench scale).
    deg = screened.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    e1 = screened.select(F.col("a").alias("x"), "b")
    e2 = screened.select(F.col("a").alias("y"), "b")
    wedges = (
        e1.join(e2, "b")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    dx = deg.select(F.col("a").alias("x"), F.col("d").alias("deg_x"))
    dy = deg.select(F.col("a").alias("y"), F.col("d").alias("deg_y"))
    return (
        wedges.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .select(
            "x",
            "y",
            "common",
            F.col("deg_x").cast("bigint").alias("deg_x"),
            F.col("deg_y").cast("bigint").alias("deg_y"),
            F.expr(
                "CAST((1000000 * common) DIV (deg_x + deg_y - common) "
                "AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(F.desc("common"), "x", "y")
        .limit(k)
    )




@register(
    "graph_common_neighbors",
    oracle=f"""
    WITH ue AS ({_UE_SQL}
    ), deg AS (
      SELECT a, COUNT(*) AS d FROM ue GROUP BY a
    ), wedges AS (
      SELECT e1.a AS x, e2.a AS y, COUNT(*) AS common
      FROM ue e1 JOIN ue e2 ON e1.b = e2.b AND e1.a < e2.a
      GROUP BY e1.a, e2.a
    )
    SELECT w.x, w.y, w.common,
           CAST(dx.d AS BIGINT) AS deg_x, CAST(dy.d AS BIGINT) AS deg_y,
           CAST((1000000 * w.common) // (dx.d + dy.d - w.common)
                AS BIGINT) AS jaccard_ppm
    FROM wedges w JOIN deg dx ON dx.a = w.x JOIN deg dy ON dy.a = w.y
    ORDER BY w.common DESC, w.x, w.y LIMIT 20
    """,
    doc="Top-20 most-similar node pairs by common-neighbor count with "
    "exact integer Jaccard (|N(x) n N(y)| / |N(x) u N(y)| in ppm): "
    "ONE self-equi-join on the shared neighbor (the wedge join — "
    "never a node-pair cartesian; work is sum of squared neighbor "
    "degrees, the graph_triangles cost model), a combinable pair "
    "count, two broadcast degree joins, TakeOrderedAndProject for the "
    "top-k. The wedge join is HUB-CAPPED: shared-neighbor nodes with "
    "degree > hub_cap are screened out by a broadcast anti-join "
    "BEFORE the self-join (a node of degree d contributes d^2 wedge "
    "pairs — one 10^6-degree celebrity is a 10^12-pair explosion at "
    "100 TB). The default cap (100k) exceeds every degree at bench "
    "scale (~200 max), so the oracle stays exact; at scale the cap "
    "is the deliberate hubs-excluded approximation, like "
    "triangle-counting's degree orientation but lossy-by-choice. "
    "Degrees feeding jaccard_ppm are computed on the SCREENED edge "
    "list so numerator and denominator share the hubs-excluded "
    "universe when the cap binds (identical to full degrees when it "
    "doesn't).",
    tags=("graph", "join"),
)
def graph_common_neighbors(
    spark: SparkSession, sf_dir: str, hub_cap: int = 100_000
) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
    fwd = e.select(F.col("user_id").alias("a"), dst.alias("b"))
    rev = e.select(dst.alias("a"), F.col("user_id").alias("b"))
    ue = fwd.unionAll(rev).where(F.col("a") != F.col("b")).distinct()
    return common_neighbors_topk(ue, hub_cap)


# --- graph_assortativity ---------------------------------------------------


@register(
    "graph_assortativity",
    oracle=f"""
    WITH ue AS ({_UE_SQL}
    ), deg AS (
      SELECT a, COUNT(*) AS d FROM ue GROUP BY a
    ), inc AS (
      SELECT da.d AS dx, db.d AS dy
      FROM ue JOIN deg da ON da.a = ue.a JOIN deg db ON db.a = ue.b
    ), s AS (
      SELECT COUNT(*) AS n, SUM(dx) AS sx,
             SUM(dx * dy) AS sxy, SUM(dx * dx) AS sxx
      FROM inc
    )
    SELECT CAST(n // 2 AS BIGINT) AS n_edges,
           CAST(sx AS BIGINT) AS sum_deg,
           CAST(sxy AS BIGINT) AS sum_ddprod,
           CAST(sxx AS BIGINT) AS sum_degsq,
           CAST((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                AS DOUBLE) AS assortativity
    FROM s
    """,
    doc="Degree assortativity coefficient (Newman 2002): Pearson "
    "correlation of endpoint degrees over every ordered incidence of "
    "the undirected event graph. Because the incidence set is "
    "symmetric, sy = sx and syy = sxx EXACTLY, so r collapses to the "
    "sqrt-free rational (n*sxy - sx^2)/(n*sxx - sx^2) — one division "
    "on exact integer sums (positive/negative r = hubs attach to "
    "hubs/leaves; the mixing fingerprint that decides whether degree "
    "capping is needed before wedge joins). 100 TB shape: one "
    "distinct, one combinable degree count, two broadcast degree "
    "joins, one aggregate to a single row — never a node-pair join.",
    tags=("graph", "agg", "join"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dst = F.expr(_DST)
    fwd = e.select(F.col("user_id").alias("a"), dst.alias("b"))
    rev = e.select(dst.alias("a"), F.col("user_id").alias("b"))
    ue = fwd.unionAll(rev).where(F.col("a") != F.col("b")).distinct()
    deg = ue.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("a").alias("ja"), F.col("d").alias("dx"))
    db = deg.select(F.col("a").alias("jb"), F.col("d").alias("dy"))
    inc = (
        ue.join(F.broadcast(da), ue.a == da.ja)
        .join(F.broadcast(db), ue.b == db.jb)
        .select("dx", "dy")
    )
    s = inc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum(F.expr("dx * dy")).alias("sxy"),
        F.sum(F.expr("dx * dx")).alias("sxx"),
    )
    return s.selectExpr(
        "CAST(n DIV 2 AS BIGINT) AS n_edges",
        "CAST(sx AS BIGINT) AS sum_deg",
        "CAST(sxy AS BIGINT) AS sum_ddprod",
        "CAST(sxx AS BIGINT) AS sum_degsq",
        "CAST((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)"
        " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        " AS DOUBLE) AS assortativity",
    )


# --- graph_modularity --------------------------------------------------------


@register(
    "graph_modularity",
    oracle=f"""
    WITH und AS (
      SELECT DISTINCT least(user_id, {_DST}) AS u, greatest(user_id, {_DST}) AS v
      FROM events WHERE user_id <> {_DST}
    ), nb AS (
      SELECT u AS node, v AS neigh FROM und
      UNION
      SELECT v AS node, u AS neigh FROM und
    ), l0 AS (
      SELECT DISTINCT node, CAST(node AS BIGINT) AS label FROM nb
    ), it1 AS ({_LPA_ITER.format(prev="l0")}
    ), it2 AS ({_LPA_ITER.format(prev="it1")}
    ), it3 AS ({_LPA_ITER.format(prev="it2")}
    ), m AS (
      SELECT COUNT(*) AS m FROM und
    ), intra AS (
      SELECT COUNT(*) AS a
      FROM und e JOIN it3 lu ON lu.node = e.u JOIN it3 lv ON lv.node = e.v
      WHERE lu.label = lv.label
    ), deg AS (
      SELECT node, COUNT(*) AS d FROM nb GROUP BY node
    ), dc AS (
      SELECT l.label, SUM(d.d) AS d_c
      FROM it3 l JOIN deg d ON d.node = l.node
      GROUP BY l.label
    ), b AS (
      SELECT COUNT(*) AS n_comm, SUM(d_c * d_c) AS b FROM dc
    )
    SELECT CAST(m.m AS BIGINT) AS n_edges,
           CAST(b.n_comm AS BIGINT) AS n_communities,
           CAST(intra.a AS BIGINT) AS intra_edges,
           CAST(b.b AS BIGINT) AS sum_dc2,
           CAST(CAST(intra.a AS DOUBLE) / m.m
                - CAST(b.b AS DOUBLE) / (4e0 * m.m * m.m)
                AS DOUBLE) AS modularity
    FROM m, intra, b
    """,
    doc="Newman modularity Q of the label-propagation communities "
    "(the quality score community detection is judged by): Q = "
    "(intra-community edge fraction) - (expected fraction under the "
    "degree-preserving null) = A/m - B/(4m^2) where A = intra edges "
    "and B = sum of squared community degree totals — both EXACT "
    "integer aggregates, so the variable-cardinality sum over "
    "communities never touches doubles (the reassociation trap) and Q "
    "derives in one shared division tree. Composes graph_label_prop's "
    "unrolled 3-iteration LPA (same deterministic tie rule). 100 TB "
    "shape: O(iters) label joins, then two edge-keyed equi-joins and "
    "one community rollup — never a node-pair join.",
    tags=("graph", "iterative", "join"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dst = (F.col("user_id") * 13 + F.length("event_type")) % 100
    und = (
        e.select(
            F.least(F.col("user_id"), dst).alias("u"),
            F.greatest(F.col("user_id"), dst).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    return modularity_summary(und)


def modularity_summary(und: DataFrame) -> DataFrame:
    """LPA labels + Newman modularity Q over canonical undirected
    edges — the edge-parameterized core of graph_modularity, reused
    by scale_probe --graph10x."""
    from binance_etl_spark.operators.graph import label_propagation

    labels = label_propagation(und, n_iters=3)
    lu = labels.select(
        F.col("node").alias("u"), F.col("community").alias("cu")
    )
    lv = labels.select(
        F.col("node").alias("v"), F.col("community").alias("cv")
    )
    # one lazy plan: every scalar is a 1-row aggregate cross-joined in
    # (the stats-pattern crossJoin — never data-sized)
    m_df = und.agg(F.count(F.lit(1)).alias("m"))
    intra_df = (
        und.join(F.broadcast(lu), "u")
        .join(F.broadcast(lv), "v")
        .where(F.col("cu") == F.col("cv"))
        .agg(F.count(F.lit(1)).alias("a"))
    )
    nb = (
        und.select(F.col("u").alias("node"), F.col("v").alias("neigh"))
        .unionAll(und.select(F.col("v").alias("node"), F.col("u").alias("neigh")))
        .distinct()
    )
    deg = nb.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    dc = (
        labels.join(F.broadcast(deg), "node")
        .groupBy("community")
        .agg(F.sum("d").alias("d_c"))
    )
    b = dc.agg(
        F.count(F.lit(1)).alias("n_comm"),
        F.sum(F.expr("d_c * d_c")).alias("b"),
    )
    return (
        m_df.crossJoin(intra_df)
        .crossJoin(b)
        .selectExpr(
            "CAST(m AS BIGINT) AS n_edges",
            "CAST(n_comm AS BIGINT) AS n_communities",
            "CAST(a AS BIGINT) AS intra_edges",
            "CAST(b AS BIGINT) AS sum_dc2",
            "CAST(CAST(a AS DOUBLE) / m"
            " - CAST(b AS DOUBLE) / (4e0 * m * m) AS DOUBLE) AS modularity",
        )
    )
