"""Subquery surface: EXISTS / NOT EXISTS / IN / scalar (correlated and
uncorrelated) / LATERAL.

The reference has no query language at all (SURVEY.md §3 — its "queries"
are hard-coded pipelines), so this whole module is DATA/NS surface: the
query shapes an analyst runs over the emitted trades/depth tables
(TPC-H Q4/Q17/Q18/Q22 shapes on the driver's star schema).

Each query here is ONE shared ANSI text executed verbatim by BOTH
spark.sql (over catalog.register_all temp views) and the DuckDB oracle —
the strongest possible parity statement, and it exercises Catalyst's
subquery machinery (RewritePredicateSubquery turns EXISTS/IN into
semi/anti joins; correlated scalar subqueries are decorrelated into
aggregate+join). At 100 TB every one of these plans is a join Catalyst
already knows how to distribute — no driver-side loops anywhere.

Determinism: all aggregates go through exact integer/decimal units
(spark-graft parity rules); scalar-subquery thresholds are derived as
`CAST(exact-int-sum AS DOUBLE)/COUNT(*)`, identical IEEE arithmetic on
both engines.
"""

from __future__ import annotations

from binance_etl_spark.functions.parity import sql_dsum
from binance_etl_spark.plans.registry import register_sql as _sql_query


_sql_query(
    "sub_exists",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    GROUP BY c.c_mktsegment
    """,
    doc="Correlated EXISTS (TPC-H Q4 shape): customers holding at least "
    "one finished order, counted per segment. Catalyst rewrites to a "
    "left-semi hash join — fully distributed, no per-row subquery "
    "execution. Same ANSI text runs on both engines.",
    tags=("subquery", "semi"),
)

_sql_query(
    "sub_not_exists",
    """
    SELECT c.c_nationkey, COUNT(*) AS n_without_pending
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    GROUP BY c.c_nationkey
    """,
    doc="Correlated NOT EXISTS (TPC-H Q22 shape): customers with no "
    "pending order, per nation. Catalyst rewrites to a left-anti join.",
    tags=("subquery", "anti"),
)

_sql_query(
    "sub_in_groups",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_big_orders
    FROM orders o
    WHERE o.o_orderkey IN (
      SELECT l.l_orderkey FROM lineitem l
      GROUP BY l.l_orderkey
      HAVING SUM(CAST(round(l.l_quantity * 100) AS BIGINT)) > 15000)
    GROUP BY o.o_orderpriority
    """,
    doc="IN over an aggregated subquery (TPC-H Q18 shape): orders whose "
    "total line quantity exceeds 150 units (exact e-2 integer-unit sum). "
    "Catalyst: aggregate then left-semi join on the IN key.",
    tags=("subquery", "semi", "agg"),
)

_sql_query(
    "sub_scalar_uncorr",
    f"""
    SELECT COUNT(*) AS n_above_avg,
           {sql_dsum('o.o_totalprice')} AS total_above
    FROM orders o
    WHERE o.o_totalprice > (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
             / COUNT(*)
      FROM orders o2)
    """,
    doc="Uncorrelated scalar subquery: orders priced above the global "
    "mean. The threshold is exact-decimal-sum / count, so both engines "
    "compute the identical double. Catalyst evaluates the scalar "
    "subquery once and broadcasts the value into the filter.",
    tags=("subquery", "scalar"),
)

_sql_query(
    "sub_scalar_corr",
    f"""
    SELECT COUNT(*) AS n_small,
           {sql_dsum('l.l_extendedprice')} AS small_revenue
    FROM lineitem l
    WHERE CAST(round(l.l_quantity * 100) AS BIGINT) < (
      SELECT 0.5 * CAST(SUM(CAST(round(l2.l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / COUNT(*)
      FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="Correlated scalar aggregate subquery (TPC-H Q17 shape): line "
    "items below half their part's mean quantity. Catalyst decorrelates "
    "into a per-part aggregate joined back to the fact — one shuffle on "
    "l_partkey, not a per-row loop; the 100 TB plan. Quantities compare "
    "in exact e-2 integer units.",
    tags=("subquery", "scalar", "agg"),
)

_sql_query(
    "sub_lateral_topn",
    """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n,
         LATERAL (SELECT c.c_name, c.c_acctbal
                  FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c.c_acctbal DESC, c.c_custkey
                  LIMIT 2) t
    """,
    doc="LATERAL correlated subquery with ORDER BY/LIMIT: top-2 "
    "customers by balance per nation. Ties broken by c_custkey so the "
    "row set is deterministic. Spark plans a per-group "
    "TakeOrderedAndProject under a join, equivalent to the window "
    "row_number<=2 top-n pattern.",
    tags=("subquery", "lateral", "topn"),
)
