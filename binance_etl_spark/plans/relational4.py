"""Fifth relational batch: bucketed co-located joins, unpivot (wide ->
long reshaping), and histogram binning.

Bucketing is the flagship 100 TB technique here: a fact table written
once with `bucketBy(N, key)` + `sortBy(key)` joins against any other
table bucketed the same way with NO exchange on either side — the
shuffle is paid once at write time and amortized over every subsequent
join (tests/test_bucketed.py asserts the exchange-free plan). The
reference's per-(symbol, market) file layout (storage.py:57-59) is the
degenerate single-bucket version of the same idea.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.functions.parity import dsum, sql_dsum
from binance_etl_spark.plans.registry import register, register_sql

_N_BUCKETS = 8


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = _N_BUCKETS
) -> None:
    """Write `df` as a bucketed+sorted parquet table (external path)."""
    path = tempfile.mkdtemp(prefix=f"besk_bucket_{table}_") + f"/{table}"
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """orders+lineitem as co-bucketed tables on the join key."""
    write_bucketed(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        "orders_b",
        "o_orderkey",
    )
    write_bucketed(
        load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        ),
        "lineitem_b",
        "l_orderkey",
    )
    return spark.table("orders_b"), spark.table("lineitem_b")


@register(
    "join_bucketed_colocate",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS n, {sql_dsum('l.l_extendedprice')} AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Co-located bucketed join: both sides written with bucketBy(8, "
    "orderkey) + sortBy, so the fact-fact join runs as a bucket-wise "
    "sort-merge with ZERO exchange on either side (asserted in "
    "tests/test_bucketed.py). At 100 TB this converts the dominant "
    "fact-fact shuffle (both sides re-partitioned per query) into a "
    "one-time write-side cost — the single biggest lever for repeated "
    "joins on the same key. Results oracle against the plain join.",
    tags=("join", "bucketing", "layout"),
)
def join_bucketed_colocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = bucketed_tables(spark, sf_dir)
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("revenue")
    )


@register(
    "project_unpivot",
    oracle=f"""
    SELECT 'l_quantity' AS measure, COUNT(*) AS n, {sql_dsum('l_quantity')} AS total
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*), {sql_dsum('l_extendedprice')} FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), {sql_dsum('l_discount')} FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), {sql_dsum('l_tax')} FROM lineitem
    """,
    doc="Unpivot (wide -> long melt) via the native df.unpivot operator: "
    "four measure columns become (measure, value) rows, then a per-"
    "measure aggregate. Catalyst plans unpivot as Expand — one scan, "
    "not four (the UNION ALL oracle text is the semantic spec, not the "
    "plan). Expand keeps the scan single-pass at 100 TB.",
    tags=("project", "reshape"),
)
def project_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("total")
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           MIN(o_orderkey) AS min_key
    FROM orders GROUP BY 1
    """,
    doc="Histogram binning: fixed-width buckets via floor(x / width) — "
    "IEEE double division + floor are bit-identical across engines. The "
    "scalable histogram plan: one map-side-combinable groupBy on the "
    "bin id, O(bins) output regardless of input rows.",
    tags=("agg", "stats"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("min_key"))
    )


register_sql(
    "sql_q5_region_volume",
    f"""
    SELECT n.n_name, COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape (local-supplier volume): 6-table join with the "
    "customer=supplier nation equality, through the spark.sql front end "
    "— identical ANSI text is the DuckDB oracle. Catalyst broadcasts "
    "the dim chain (nation/region/supplier) and leaves one fact "
    "shuffle; AQE would demote any misjudged build side.",
    tags=("sql", "join", "agg"),
)

register_sql(
    "sql_q10_returned",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name, COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): fact filter + "
    "3-dim enrichment + top-20 by revenue with a unique key tie-break. "
    "Same ANSI text on both engines; the final ORDER BY/LIMIT plans as "
    "TakeOrderedAndProject (per-partition top-k, no global sort).",
    tags=("sql", "join", "agg", "topn"),
)

register_sql(
    "sql_cte_window_daily",
    """
    WITH daily AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             COUNT(*) AS n_events,
             SUM(CAST(floor(value * 1000000) AS BIGINT)) AS v_units
      FROM events
      GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
    )
    SELECT user_id, CAST(d AS STRING) AS d, n_events,
           CAST(SUM(n_events) OVER (PARTITION BY user_id ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events,
           CAST(SUM(v_units) OVER (PARTITION BY user_id ORDER BY d
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 1e6 AS v_7d
    FROM daily
    """,
    doc="CTE + windowed rolling metrics through the SQL front end "
    "(identical ANSI text on both engines): daily per-user activity, "
    "lifetime cumulative count, and a 7-day rolling value sum. Values "
    "aggregate in exact floor-e6 integer units (portable across "
    "engines; round() half-up vs half-even differences never arise). "
    "date_trunc is evaluated under an explicitly-UTC session so "
    "Spark's tz-aware timestamps match DuckDB's naive ones.",
    tags=("sql", "window", "cte"),
)

register_sql(
    "fn_null_suite",
    """
    WITH t AS (
      SELECT o_orderkey,
             nullif(o_orderstatus, 'P') AS st,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS px
      FROM orders
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(st) AS n_nonnull_st,
           COUNT(*) - COUNT(px) AS n_null_px,
           CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
           CAST(SUM(CASE WHEN coalesce(st, 'X') = 'X' THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesced,
           CAST(SUM(CAST(floor(ifnull(px, 0) * 100) AS BIGINT)) AS BIGINT) AS px_units
    FROM t
    """,
    doc="Null-semantics suite (shared ANSI text): nullif/ifnull/"
    "coalesce, COUNT(col) vs COUNT(*) null skipping, null-safe "
    "comparison via IS NOT DISTINCT FROM, and null-absorbing arithmetic "
    "— the reference never emits nulls (its schemas are total, "
    "SURVEY.md §1.3), so this is engine DATA surface for querying "
    "enriched/outer-joined outputs.",
    tags=("scalar", "null"),
)

register_sql(
    "sort_nulls_last",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS px
    FROM orders
    ORDER BY px DESC NULLS LAST, o_orderkey
    LIMIT 10
    """,
    doc="Explicit null ordering: DESC NULLS LAST with a unique "
    "tie-break key, top-10. Both engines honor the ANSI null-ordering "
    "clause; Spark plans TakeOrderedAndProject.",
    tags=("sort", "null"),
)

register_sql(
    "join_cross_dims",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE n.n_regionkey <> r.r_regionkey
    """,
    doc="Explicit CROSS JOIN of two bounded dims with a non-equi "
    "residual (every nation paired with every FOREIGN region). Spark "
    "plans BroadcastNestedLoopJoin — acceptable exactly because both "
    "sides are dimension-sized; the engine's guard for fact-sized "
    "inputs is the non-equi interval/bucketed join family "
    "(operators/interval.py).",
    tags=("join", "cross"),
)

register_sql(
    "sql_q2_min_cost",
    """
    SELECT DISTINCT p.p_partkey, p.p_brand, s.s_name, n.n_name,
           l.l_extendedprice AS best_price
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND p.p_size <= 5
      AND l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    """,
    doc="TPC-H Q2 shape (min-cost supplier): correlated scalar MIN "
    "subquery over a 4-table join, correlated on the outer part key — "
    "no partsupp table in the catalog, so lineitem plays the offers "
    "role. Pins Catalyst's decorrelation: the subquery must plan as a "
    "per-partkey aggregate joined back (one pass over lineitem), not a "
    "per-row re-execution; all ties at the min price are returned so "
    "the result is deterministic without a LIMIT. MIN needs no "
    "decimal-cast (no summation).",
    tags=("sql", "join", "subquery"),
)

register_sql(
    "sql_q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7 shape (volume shipping): the nation dim joined TWICE "
    "under different roles (supplier nation vs customer nation) with a "
    "symmetric two-nation disjunction, grouped by year. Pins the "
    "self-joined-dim pattern: both nation sides broadcast, the "
    "OR-of-ANDs residual stays on the broadcast join, one fact "
    "shuffle for the final aggregate.",
    tags=("sql", "join", "agg"),
)

register_sql(
    "sql_q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(20,6))) > 180
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume orders): grouped-HAVING IN "
    "subquery over the fact table feeding a 3-table detail aggregate "
    "with top-20. Pins Catalyst's IN->left-semi rewrite (the subquery "
    "aggregates lineitem once, semi-joins orders — no per-row "
    "evaluation) and TakeOrderedAndProject for the final top-k. The "
    "HAVING threshold compares an exact decimal sum, so group "
    "membership cannot flip on double summation order.",
    tags=("sql", "join", "subquery", "topn"),
)

register_sql(
    "sql_q21_waiting_supplier",
    """
    SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_orders
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY n_orders DESC, s.s_name
    LIMIT 15
    """,
    doc="TPC-H Q21 shape (suppliers who kept the order waiting): "
    "EXISTS and NOT EXISTS correlated on the SAME fact table with "
    "inequality residuals — the hardest decorrelation pattern in the "
    "TPC-H suite. Catalyst must rewrite to a left-semi plus a left-"
    "anti join against per-order aggregates, never per-row "
    "re-execution; top-15 with name tie-break.",
    tags=("sql", "join", "subquery", "topn"),
)

register_sql(
    "sql_q22_idle_customers",
    """
    WITH thresh AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE)
               / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(20,6))) AS DOUBLE) AS total_bal
    FROM customer c, thresh
    WHERE c.c_acctbal > thresh.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape (well-funded customers gone idle): "
    "uncorrelated scalar aggregate threshold (exact decimal mean — a "
    "double AVG would be summation-order-dependent) + correlated NOT "
    "EXISTS anti-join against the orders fact, scoped to a recent "
    "window (every synthetic customer has SOME order, so the "
    "unwindowed form is vacuously empty). Pins the scalar-subquery "
    "broadcast + left-anti rewrite with the date filter pushed below "
    "the anti join.",
    tags=("sql", "join", "subquery", "agg"),
)


@register(
    "join_skew_salted",
    oracle=f"""
    SELECT n.n_name,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="Skew-salted equi-join (operators/skew.py::salted_join): the "
    "supplier+nation side is replicated 8x, lineitem shards per key "
    "via xxhash64(orderkey, linenumber) % 8, and the join runs on "
    "(suppkey, salt) — row-identical to the plain join the oracle "
    "runs, which IS the correctness claim. For the 100 TB case where "
    "the dim exceeds broadcast threshold and one hot key would "
    "straggle a plain shuffle join; AQE skew-split is the runtime "
    "alternative (tests/test_aqe.py), salting the plan-level one.",
    tags=("join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.functions.parity import dsum
    from binance_etl_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    ).withColumnRenamed("l_suppkey", "s_suppkey")
    dim = (
        load(spark, sf_dir, "supplier")
        .join(
            load(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    joined = salted_join(li, dim, "s_suppkey", ["l_orderkey", "l_linenumber"])
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("n_name")
    )


register_sql(
    "agg_equidepth_hist",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(ceil(4.0 * rn / n) AS INT) AS bucket,
           COUNT(*) AS n_rows,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM ranked
    GROUP BY o_orderpriority, CAST(ceil(4.0 * rn / n) AS INT)
    ORDER BY o_orderpriority, bucket
    """,
    doc="EQUI-DEPTH histogram (quartiles per priority class), the "
    "companion to agg_histogram's equi-width bins: bucket = "
    "ceil(4*rank/count) under a unique ordering, so each bucket holds "
    "~n/4 rows and the (lo, hi) bounds ARE the empirical quartile "
    "boundaries. The window is PARTITIONED (per priority class) — the "
    "scalable shape; a global ntile would serialize the sort on one "
    "partition at 100 TB. 4.0*rn/n is one IEEE double divide on exact "
    "integers, bit-identical across engines.",
    tags=("agg", "stats", "sql", "window"),
)


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="EXACT distinct counting via bitmap aggregates "
    "(bitmap_bucket_number / bitmap_bit_position / "
    "bitmap_construct_agg): per (group, bucket) bitmaps OR-merge "
    "map-side, then per-group popcounts sum — the mergeable exact "
    "alternative to COUNT(DISTINCT)'s expand-shuffle when the key "
    "space is dense integers (user/customer ids). Bitmaps are "
    "fixed-size per bucket, so shuffle bytes scale with id-space/32k "
    "buckets, not with row count; HLL (agg_approx_distinct) remains "
    "the sparse/huge-key-space path. Oracle is the plain COUNT "
    "DISTINCT — value identity IS the claim.",
    tags=("agg", "distinct", "bitmap"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.catalog import register_all

    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS n_custs
        FROM (
          SELECT o_orderpriority,
                 bitmap_count(bitmap_construct_agg(bitmap_bit_position(o_custkey))) AS cnt
          FROM orders
          GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey)
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )
