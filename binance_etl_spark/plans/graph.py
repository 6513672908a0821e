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
    "shuffles, eager localCheckpoint per iteration so lineage stays "
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
