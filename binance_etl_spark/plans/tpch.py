"""TPC-H completion batch: the 13 query shapes not yet in the registry
(Q4, Q6, Q8, Q9, Q11, Q12, Q13, Q14, Q15, Q16, Q17, Q19, Q20), giving
the engine all 22 TPC-H shapes as oracle-checked queries.

The catalog (TESTDATA.md) has no partsupp table and lineitem lacks
l_commitdate / l_receiptdate / l_shipmode, so — exactly like the existing
`sql_q2_min_cost` — each shape is adapted: lineitem plays the offers /
availability role, l_returnflag plays the ship-mode/late-line role, and
p_retailprice proxies supply cost. What is PINNED is the Catalyst plan
shape each query exists to exercise (EXISTS->semi decorrelation,
correlated scalar aggregates, CTE reuse, NOT IN null-aware anti join,
two-level aggregation, OR-of-ANDs join residuals), not TPC-H's exact
business constants.

Parity policy (registry.py): shared ANSI text on both engines; money
sums either go through DECIMAL casts (sql_dsum) or floor-e6 integer
units so no comparison or output ever depends on double summation
order; ratios divide two exact sums cast to double (bit-identical in
both engines); every ORDER BY ... LIMIT has a unique tie-break.

These all run on the reference's consumer side: the reference stores
trades/depth tables for downstream SQL (reference storage.py:63-75);
this module is the downstream-SQL surface at TPC-H shape coverage.
"""

from __future__ import annotations

from binance_etl_spark.functions.parity import sql_dsum
from binance_etl_spark.plans.registry import register_sql

# Exact floor-e6 integer revenue units: floor() on identical doubles is
# bit-identical across engines, and BIGINT sums are order-independent.
_REV_UNITS = "CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)"


register_sql(
    "sql_q4_priority_exists",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking): EXISTS correlated on "
    "the fact table under a date-window filter, counted per priority. "
    "Pins the EXISTS -> left-semi rewrite: lineitem is scanned once "
    "with the returnflag filter pushed down, semi-joined to orders — "
    "never a per-order probe. (No l_commitdate/l_receiptdate in the "
    "catalog; the returned-line flag plays the late-line role.)",
    tags=("sql", "subquery", "agg"),
)

register_sql(
    "sql_q6_forecast_revenue",
    f"""
    SELECT COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): pure scan-filter-"
    "aggregate with three range predicates and no join or GROUP BY. "
    "Pins full predicate pushdown (all three filters reach the parquet "
    "scan as PushedFilters) and a 2-column ReadSchema after the date "
    "column — the minimal-IO plan a 100 TB scan depends on. The "
    "discount band compares the same stored doubles to the same "
    "literals in both engines, so membership is deterministic.",
    tags=("sql", "agg", "scan"),
)

register_sql(
    "sql_q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_units ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev_units) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             n2.n_name AS supp_nation,
             {_REV_UNITS} AS rev_units
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): 7-table star join with "
    "the nation dim in two roles (customer region gate, supplier "
    "nation share), then a conditional-share ratio per year. Pins the "
    "all-dims-broadcast plan (one fact shuffle for the year agg) and "
    "exact ratio parity: both sums are exact integer units, cast to "
    "double and divided once — bit-identical across engines.",
    tags=("sql", "join", "agg"),
)

register_sql(
    "sql_q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(floor(
             (l.l_extendedprice * (1 - l.l_discount)
              - p.p_retailprice * l.l_quantity * 0.1) * 1000000
           ) AS BIGINT)) AS BIGINT) AS profit_units
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit): part-name LIKE gate over "
    "a 5-table join, profit expression mixing fact and dim columns, "
    "grouped by supplier nation x order year. No partsupp in the "
    "catalog, so p_retailprice*quantity*0.1 proxies supply cost — the "
    "pinned behavior is the contains-LIKE (not prefix) staying as a "
    "post-scan filter while the join order still broadcasts all dims. "
    "Profit aggregates in exact floor-e6 units.",
    tags=("sql", "join", "agg"),
)

register_sql(
    "sql_q11_important_parts",
    """
    SELECT l.l_partkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS part_value
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY l.l_partkey
    HAVING SUM(CAST(l.l_extendedprice AS DECIMAL(20,6))) > (
      SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(20,6))) * 0.001
      FROM lineitem l2
      JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
      WHERE n2.n_name = 'NATION_7'
    )
    ORDER BY part_value DESC, l.l_partkey
    """,
    doc="TPC-H Q11 shape (important stock identification): grouped "
    "HAVING against an uncorrelated scalar subquery over the SAME "
    "filtered join (value concentration above a global fraction). "
    "Pins the scalar-subquery-as-broadcast plan: the total is computed "
    "once and broadcast into the HAVING filter, not re-evaluated per "
    "group. Both sides of the comparison are exact decimals (the "
    "0.001 literal is decimal in both engines), so group membership "
    "cannot flip on summation order. Lineitem value plays the "
    "partsupp supplycost*availqty role.",
    tags=("sql", "join", "subquery", "agg"),
)

register_sql(
    "sql_q12_shipclass_priority",
    """
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY ship_class
    """,
    doc="TPC-H Q12 shape (shipping modes and priority): fact-fact "
    "equi-join with a pushed date window, conditional counts by "
    "priority class per ship class (l_returnflag plays l_shipmode — "
    "not in the catalog). Pins map-side-combinable conditional "
    "aggregation: the CASE sums fold into the partial aggregate "
    "before the single group-by exchange.",
    tags=("sql", "join", "agg"),
)

register_sql(
    "sql_q13_custdist",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (customer order-count distribution): left outer join "
    "with an ON-clause (not WHERE) residual so customers with zero "
    "qualifying orders survive as c_count=0, then a second aggregation "
    "over the first's output. Pins two-level aggregation: COUNT(col) "
    "null-skipping on the outer join's unmatched side, and the second "
    "group-by reusing the first's hash-partitioned output where "
    "possible.",
    tags=("sql", "join", "agg", "outer"),
)

register_sql(
    "sql_q14_promo_share",
    f"""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN li.rev_units ELSE 0 END) AS DOUBLE)
             * 100.0
             / CAST(SUM(li.rev_units) AS DOUBLE) AS promo_share_pct
    FROM (
      SELECT l_partkey, {_REV_UNITS} AS rev_units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    ) li
    JOIN part p ON p.p_partkey = li.l_partkey
    """,
    doc="TPC-H Q14 (promotion effect): one-month fact slice joined to "
    "part, conditional-share percentage. Pins that the date filter is "
    "pushed below the join (the slice, not the full fact table, is "
    "the probe side) and exact ratio parity via integer units.",
    tags=("sql", "join", "agg"),
)

register_sql(
    "sql_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS total_units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_units
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_units = (SELECT MAX(total_units) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 (top supplier, view rewritten as CTE per the "
    "official variant): the revenue CTE is referenced twice — once "
    "joined to supplier, once under MAX in a scalar subquery. Pins "
    "CTE handling: Spark may inline or reuse the exchange, but the "
    "scalar MAX must not force a per-row re-aggregation; all ties at "
    "the max are returned so no LIMIT is needed for determinism.",
    tags=("sql", "subquery", "cte", "agg"),
)

register_sql(
    "sql_q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): COUNT DISTINCT "
    "grouped by three part attributes, with a NOT IN exclusion "
    "subquery (negative-balance suppliers play the complaints role). "
    "Pins the null-aware anti-join NOT IN rewrite (s_suppkey is "
    "non-null here, so Catalyst may degrade it to a plain anti join) "
    "and distinct-aggregate planning (expand + two-phase agg).",
    tags=("sql", "join", "subquery", "agg"),
)

register_sql(
    "sql_q17_small_qty_revenue",
    """
    SELECT COUNT(*) AS n_small,
           CAST(CAST(SUM(CAST(floor(l.l_extendedprice * 1000000) AS BIGINT)) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly_units
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < 0.2 * (
        SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*)
        FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): correlated "
    "scalar AVG subquery on the fact table, correlated on the outer "
    "part key. Pins Catalyst decorrelation to a per-partkey aggregate "
    "joined back (one extra pass over lineitem, NOT a per-row "
    "re-scan). The average is computed as exact-decimal-sum -> double "
    "-> divide-by-count in both engines, so the 0.2x threshold is "
    "bit-identical and row membership cannot flip.",
    tags=("sql", "join", "subquery", "agg"),
)

register_sql(
    "sql_q19_discounted_revenue",
    f"""
    SELECT COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
    "an OR-of-ANDs residual mixing columns from BOTH join sides, so "
    "it cannot be pushed below the join — but Catalyst should still "
    "derive and push the single-side implied filters (brand IN (...), "
    "size <= 35, quantity <= 30) to each scan. Pins exactly that "
    "constraint-propagation behavior over a broadcast join.",
    tags=("sql", "join", "agg"),
)

register_sql(
    "sql_q20_promotable_suppliers",
    """
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_5', 'NATION_6')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(20,6))) > 30
      )
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape (potential part promotion): IN nested inside "
    "IN — the inner prefix-LIKE part filter feeds a grouped-HAVING "
    "per (supplier, part) shipped-quantity threshold, whose supplier "
    "set semi-joins the outer supplier x nation join. Pins nested "
    "IN -> stacked left-semi rewrite with the prefix LIKE pushed as a "
    "scan range. Lineitem shipped quantity plays partsupp availqty; "
    "the exact-decimal HAVING threshold keeps membership stable.",
    tags=("sql", "join", "subquery", "agg"),
)
