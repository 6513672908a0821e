"""Fourth relational batch: statistical aggregates (exact-moment
formulation), bitwise/boolean aggregates, ordered string_agg, GROUPING
SETS, value window functions, time-range window frames, INTERSECT/
EXCEPT ALL, posexplode.

Cross-engine determinism for the statistics: corr/stddev/covar are
order-DEPENDENT under each engine's native streaming implementations,
so we compute exact integer-unit moments (values have <= 2 decimal
digits -> x*100 is an exact integer; sums of products go through
DECIMAL(38,0)) and derive the statistics with ONE shared formula string
evaluated identically by Spark and DuckDB. Decimal partial sums are
map-side combinable and codegen'd — this is also the right 100 TB plan
(a second pass is never needed; one shuffle of 6 numbers per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.functions.parity import sql_dsum
from binance_etl_spark.plans.registry import register, register_sql

# Shared moment formulas (identical text on both engines). Inputs are
# the exact e-2-unit moments: n, sx, sy, sxx, syy, sxy.
_NF = "CAST(n AS DOUBLE)"
_SX, _SY = "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
_SXX, _SYY, _SXY = "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)", "CAST(sxy AS DOUBLE)"
_MEAN_Q = f"{_SX} / {_NF} / 100.0"
_VAR_Q = f"({_NF} * {_SXX} - {_SX} * {_SX}) / ({_NF} * ({_NF} - 1.0)) / 10000.0"
_STD_Q = f"sqrt({_VAR_Q})"
_COV_QP = f"({_NF} * {_SXY} - {_SX} * {_SY}) / ({_NF} * ({_NF} - 1.0)) / 10000.0"
_CORR_QP = (
    f"({_NF} * {_SXY} - {_SX} * {_SY}) / "
    f"(sqrt({_NF} * {_SXX} - {_SX} * {_SX}) * sqrt({_NF} * {_SYY} - {_SY} * {_SY}))"
)


@register(
    "agg_stats_suite",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
      FROM (SELECT l_returnflag,
                   CAST(round(l_quantity * 100) AS BIGINT) AS x,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem)
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           {_MEAN_Q} AS mean_qty,
           {_VAR_Q} AS var_qty,
           {_STD_Q} AS std_qty,
           {_COV_QP} AS covar_qty_price,
           {_CORR_QP} AS corr_qty_price
    FROM m
    """,
    doc="Statistical aggregates — mean/var_samp/stddev_samp/covar_samp/"
    "corr — via exact integer-unit moments + shared derivation formula "
    "(module docstring). Single-pass, map-side-combinable; the 100 TB "
    "statistics plan.",
    tags=("agg", "stats"),
)
def agg_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = F.expr("CAST(round(l_quantity * 100) AS BIGINT)")
    y = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    d38 = lambda c: F.sum(c.cast("decimal(38,0)")).cast("decimal(38,0)")  # noqa: E731
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        d38(x).alias("sx"),
        d38(y).alias("sy"),
        d38(x * x).alias("sxx"),
        d38(y * y).alias("syy"),
        d38(x * y).alias("sxy"),
    )
    return m.selectExpr(
        "l_returnflag",
        "n",
        f"{_MEAN_Q} AS mean_qty",
        f"{_VAR_Q} AS var_qty",
        f"{_STD_Q} AS std_qty",
        f"{_COV_QP} AS covar_qty_price",
        f"{_CORR_QP} AS corr_qty_price",
    )


@register(
    "agg_median_mode",
    oracle="""
    WITH u AS (
      SELECT l_returnflag AS flag, CAST(round(l_quantity * 100) AS BIGINT) AS units
      FROM lineitem
    ),
    med AS (SELECT flag, CAST(median(units) AS DOUBLE) AS median_units FROM u GROUP BY flag),
    c AS (SELECT flag, units, COUNT(*) AS cnt FROM u GROUP BY flag, units),
    m AS (
      SELECT flag, units AS mode_units FROM (
        SELECT flag, units, row_number() OVER (PARTITION BY flag ORDER BY cnt DESC, units) AS rn
        FROM c
      ) WHERE rn = 1
    )
    SELECT flag AS l_returnflag, median_units, mode_units
    FROM med JOIN m USING (flag)
    """,
    doc="Median (exact, interpolated on integer units — (a+b)/2 on "
    "bigints is float-exact in both engines) and mode with an explicit "
    "deterministic tie-break (highest count, then smallest value). "
    "Native mode() has unspecified ties; this formulation is "
    "reproducible anywhere.",
    tags=("agg", "stats"),
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    u = li.select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(round(l_quantity * 100) AS BIGINT)").alias("units"),
    )
    med = u.groupBy("flag").agg(
        F.percentile("units", F.lit(0.5)).cast("double").alias("median_units")
    )
    c = u.groupBy("flag", "units").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("flag").orderBy(F.col("cnt").desc(), F.col("units"))
    m = (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("flag", F.col("units").alias("mode_units"))
    )
    return med.join(m, "flag").select(
        F.col("flag").alias("l_returnflag"), "median_units", "mode_units"
    )


@register(
    "agg_bitwise_bool",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_orderkey) AS key_and,
           bit_or(l_orderkey) AS key_or,
           bit_xor(l_orderkey) AS key_xor,
           bool_and(l_quantity < 50) AS all_small,
           bool_or(l_discount > 0.09) AS any_big_disc,
           CAST(count_if(l_tax = 0) AS BIGINT) AS n_tax_free
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Bitwise and boolean aggregates: bit_and/or/xor, bool_and/or, "
    "count_if. All exact integer/boolean — order-free by construction.",
    tags=("agg",),
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_orderkey").alias("key_and"),
        F.bit_or("l_orderkey").alias("key_or"),
        F.bit_xor("l_orderkey").alias("key_xor"),
        F.bool_and(F.col("l_quantity") < 50).alias("all_small"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
    )


@register(
    "agg_string_agg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
    doc="Ordered string aggregation (LISTAGG/string_agg). Spark side "
    "sorts the collected array before joining — collect_list order is "
    "nondeterministic under shuffle, so the explicit sort is REQUIRED "
    "for reproducibility (and is the portable formulation).",
    tags=("agg",),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.join(n, r.r_regionkey == n.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           {sql_dsum('o_totalprice')} AS sum_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
    doc="Explicit GROUPING SETS (finer than rollup/cube, already "
    "covered): per (status, priority), per status, and grand total in "
    "one pass — Spark expands to a single Expand + hash aggregate, one "
    "shuffle total.",
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.functions.parity import dsum

    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(dsum("o_totalprice").alias("sum_price"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "sum_price",
            "n_orders",
        )
    )


@register(
    "win_value_suite",
    oracle="""
    SELECT o_orderkey,
           first_value(o_orderkey) OVER w1 AS cheapest_so_far,
           nth_value(o_orderkey, 3) OVER w1 AS third_cheapest,
           last_value(o_orderkey) OVER w2 AS most_expensive
    FROM orders
    WINDOW
      w1 AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w2 AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Value window functions (first/last/nth) with explicit ROWS "
    "frames and a unique tie-break (o_orderkey) in the ordering — "
    "without it, frame contents are nondeterministic on any engine.",
    tags=("window",),
)
def win_value_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    order = [F.col("o_totalprice"), F.col("o_orderkey")]
    w1 = (
        Window.partitionBy("o_orderstatus")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w2 = (
        Window.partitionBy("o_orderstatus")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(w1).alias("cheapest_so_far"),
        F.nth_value("o_orderkey", 3).over(w1).alias("third_cheapest"),
        F.last("o_orderkey").over(w2).alias("most_expensive"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT event_id,
           user_id,
           COUNT(*) OVER w AS n_prev_1h,
           CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) OVER w AS BIGINT)
             AS vsum_units_1h
    FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-range window frame (RANGE BETWEEN INTERVAL): per-user "
    "rolling 1-hour count + sum, the sliding-window analytics primitive "
    "(rolling volume/VWAP). Value-based frames make ts-tie peers share "
    "a frame on every engine; the summed metric uses exact e-6 integer "
    "units so the rolling sum is order-free.",
    tags=("window", "range"),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    units = F.floor(F.col("value") * 1e6).cast("bigint")
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_prev_1h"),
        F.sum(units).over(w).alias("vsum_units_1h"),
    )


@register(
    "setop_intersect_all",
    oracle="""
    SELECT l_suppkey, l_quantity FROM lineitem WHERE l_linestatus = 'O'
    INTERSECT ALL
    SELECT l_suppkey, l_quantity FROM lineitem WHERE l_linestatus = 'F'
    """,
    doc="Bag-semantics INTERSECT ALL (duplicates kept up to the min "
    "multiplicity) — Spark intersectAll, one aggregate-style shuffle.",
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_linestatus") == "O").select("l_suppkey", "l_quantity")
    b = li.where(F.col("l_linestatus") == "F").select("l_suppkey", "l_quantity")
    return a.intersectAll(b)


@register(
    "setop_except_all",
    oracle="""
    SELECT l_suppkey, l_quantity FROM lineitem WHERE l_linestatus = 'O'
    EXCEPT ALL
    SELECT l_suppkey, l_quantity FROM lineitem WHERE l_linestatus = 'F'
    """,
    doc="Bag-semantics EXCEPT ALL (multiplicity subtraction) — Spark "
    "exceptAll.",
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_linestatus") == "O").select("l_suppkey", "l_quantity")
    b = li.where(F.col("l_linestatus") == "F").select("l_suppkey", "l_quantity")
    return a.exceptAll(b)


@register(
    "explode_posexplode",
    oracle="""
    SELECT vec_id, CAST(s['pos'] AS INT) AS pos, s['val'] AS val
    FROM (
      SELECT vec_id,
             unnest(list_transform(generate_series(1, least(4, len(embedding))),
                                   i -> {'pos': i - 1, 'val': embedding[i]})) AS s
      FROM embeddings WHERE vec_id < 50
    )
    """,
    doc="Positional explode (posexplode / UNNEST WITH ORDINALITY): "
    "array element + its index. The lateral-view primitive for "
    "embedding-dimension unpivots.",
    tags=("explode",),
)
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "val")
    )


register_sql(
    "agg_percentile_disc",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_quantity,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           MAX(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN l_quantity END) AS p50_qty,
           MAX(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN l_quantity END) AS p90_qty,
           MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN l_quantity END) AS p99_qty
    FROM ranked GROUP BY l_returnflag
    """,
    doc="DISCRETE percentiles (p50/p90/p99 per group) as an exact, "
    "engine-portable query: the value at sorted position ceil(p*n) "
    "under a UNIQUE ordering (quantity, orderkey, linenumber). Unlike "
    "interpolated percentile_cont (whose interpolation differs across "
    "engines — agg_percentile stays rows-only for that reason), "
    "percentile_disc picks an actual data value, so both engines agree "
    "bit-for-bit. ceil() is cast explicitly: Spark returns BIGINT, "
    "DuckDB DOUBLE. One window pass + grouped conditional max.",
    tags=("agg", "stats", "sql"),
)
