"""Second relational batch: remaining join types, cube, wide pivot,
and the pure-SQL entry path (spark.sql over registered catalog views —
the same ANSI text the DuckDB oracle runs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load, register_all
from binance_etl_spark.functions.parity import dsum, sql_dsum
from binance_etl_spark.plans.registry import register


@register(
    "join_right_outer",
    oracle="""
    SELECT n_name, c_custkey
    FROM customer RIGHT JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey = 0
    """,
    doc="RIGHT OUTER: every nation of region 0 kept, customers "
    "nullable. Scale: the filtered dim side is broadcast-sized; the "
    "customer fact streams through without a shuffle.",
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0)
    return c.join(n, c.c_nationkey == n.n_nationkey, "right").select("n_name", "c_custkey")


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.k, sn.k) AS nationkey, n_cust, n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    """,
    doc="FULL OUTER: nation-level customer/supplier counts, either side "
    "may miss. Full-outer SMJ shuffles both sides once on the key.",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.k == sn.k, "full").select(
        F.coalesce(cn.k, sn.k).alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           {sql_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE: all 4 grouping combinations in one pass (Catalyst expands "
    "then hash-aggregates with map-side partials).",
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        dsum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_pivot_wide",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")} AS qty_F,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")} AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot to wide format via df.groupBy().pivot() with explicit "
    "value list (explicit values avoid the extra distinct-scan job).",
    tags=("agg", "pivot"),
)
def agg_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum(F.coalesce(F.col("l_quantity"), F.lit(0.0))))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"),
        F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
    )


# One ANSI text, two engines: runs verbatim under spark.sql AND DuckDB.
_Q3_SQL = f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@register(
    "sql_q3_topk",
    oracle=_Q3_SQL,
    doc="TPC-H Q3 shape through the spark.sql SQL front end — the exact "
    "same ANSI text is the DuckDB oracle. Demonstrates the engine's SQL "
    "API over the registered catalog (catalog.register_all). Scale: "
    "probed at 10x in scripts/scale_probe.py --stages — shuffle bytes "
    "grow exactly linearly with rows (PERFORMANCE.md).",
    tags=("sql", "join", "agg"),
)
def sql_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir)
    return spark.sql(_Q3_SQL)


@register(
    "join_interval_bucketed",
    oracle="""
    SELECT p.event_id AS purchase_id, COUNT(c.event_id) AS n_clicks_before
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
    GROUP BY p.event_id
    """,
    doc="Same semantics as join_interval, executed through "
    "operators.interval.interval_join_bucketed: the join key becomes "
    "(user_id, time_bucket) so the range residual only scans +/-1 bucket "
    "per row — the 100 TB plan for time-range joins (a plain equi-key "
    "range join concentrates hot users into single post-filter tasks).",
    tags=("join", "range"),
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.interval import interval_join_bucketed

    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    c = e.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    j = interval_join_bucketed(p, c, "user_id", "ts", "ts", "30 minutes", how="left")
    return j.groupBy(F.col("event_id").alias("purchase_id")).agg(
        F.count(F.col("r_event_id")).alias("n_clicks_before")
    )
