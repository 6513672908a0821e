"""Batch relational core (SURVEY.md §2.1-2.8 DATA ops).

Scans, projections/filters, set ops, the full join surface, hash
aggregations, sorts/top-k.  Everything here is built-in Catalyst: scans
push filters/prune columns, joins pick broadcast/SMJ via AQE, aggs run
partial+final hash aggregation inside whole-stage codegen.

Scale notes are inline per query — each one states why the plan survives
100 TB (broadcast sizing, shuffle keys, pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.functions.parity import davg, dsum, sql_davg, sql_dsum
from binance_etl_spark.plans.registry import register

# ---------------------------------------------------------------------------
# 2.1 Sources / scans
# ---------------------------------------------------------------------------


@register(
    "scan_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 10
    """,
    doc="Parquet scan with predicate pushdown + column pruning "
    "(reference reads every byte of every CSV row; Spark reads 4 of 11 "
    "columns and skips row groups via min/max stats).",
    tags=("scan",),
)
def scan_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "scan_csv_roundtrip",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="CSV sink + scan round-trip in the reference's output style "
    "(header once, reference storage.py:67-75). Writes lineitem to CSV, "
    "reads it back with an explicit schema, aggregates — proves the CSV "
    "source/sink preserves values exactly (shortest-round-trip doubles).",
    tags=("scan", "sink"),
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    path = tempfile.mkdtemp(prefix="besk_csv_rt_") + "/lineitem_csv"
    li.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.csv(
        path,
        header=True,
        schema="l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE",
    )
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "src_snapshot_fixture",
    oracle="""
    WITH snapshot(side, price, qty) AS (
      VALUES ('bid', '598.00000000', '1.00000000'),
             ('bid', '597.90000000', '2.50000000'),
             ('bid', '597.80000000', '0.75000000'),
             ('ask', '598.10000000', '1.20000000'),
             ('ask', '598.20000000', '3.00000000')
    )
    SELECT side,
           COUNT(*) AS n_levels,
           CAST(SUM(CAST(qty AS DECIMAL(38,18))) AS DOUBLE) AS total_qty
    FROM snapshot GROUP BY side
    """,
    doc="REST book snapshot as a static DataFrame (reference "
    "book_utils.py:26-33 fetches once and treats it as the static side). "
    "Decimal strings cast once to DECIMAL(38,18) — the engine-wide money "
    "type (reference keeps Binance decimal strings verbatim, "
    "spot_trades_etl.py:52-53).",
    tags=("scan", "streaming-adjacent"),
)
def src_snapshot_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        ("bid", "598.00000000", "1.00000000"),
        ("bid", "597.90000000", "2.50000000"),
        ("bid", "597.80000000", "0.75000000"),
        ("ask", "598.10000000", "1.20000000"),
        ("ask", "598.20000000", "3.00000000"),
    ]
    snap = spark.createDataFrame(rows, "side STRING, price STRING, qty STRING")
    return snap.groupBy("side").agg(
        F.count(F.lit(1)).alias("n_levels"),
        F.sum(F.col("qty").cast("decimal(38,18)"))
        .cast("double")
        .alias("total_qty"),
    )


# ---------------------------------------------------------------------------
# 2.2 Projection / filter / per-row transforms
# ---------------------------------------------------------------------------


@register(
    "filter_event_type",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
    FROM events WHERE event_type = 'click'
    """,
    doc="Event-type gate, the reference's first filter "
    "(spot_trades_etl.py:47: keep e=='trade'). Pushed to the parquet scan.",
    tags=("filter",),
)
def filter_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "value",
        )
    )


@register(
    "project_rename",
    oracle="""
    SELECT l_orderkey AS order_id, l_linenumber AS line_no,
           l_quantity AS quantity, l_extendedprice AS price
    FROM lineitem WHERE l_linenumber = 1
    """,
    doc="Rename/project, the reference's E->timestamp, t->id, p->price "
    "mapping (spot_trades_etl.py:48-55) as a select with aliases.",
    tags=("project",),
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_linenumber") == 1)
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").alias("line_no"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("price"),
        )
    )


@register(
    "project_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' THEN 'filled'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'partial' END AS status_label
    FROM orders
    """,
    doc="Conditional map, the reference's side = sell-if-m-else-buy "
    "(spot_trades_etl.py:54) as when/otherwise.",
    tags=("project",),
)
def project_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "filled")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_label"),
    )


@register(
    "project_lit_union",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'bid' AS side, FALSE AS is_snapshot
    FROM lineitem WHERE l_returnflag = 'A'
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'ask' AS side, FALSE AS is_snapshot
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="Literal-column injection + union, the reference's "
    "side='bid'/'ask', is_snapshot constants on exploded depth levels "
    "(spot_depth_etl.py:97-109).",
    tags=("project", "setop"),
)
def project_lit_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bids = li.where(F.col("l_returnflag") == "A").select(
        "l_orderkey",
        "l_linenumber",
        F.lit("bid").alias("side"),
        F.lit(False).alias("is_snapshot"),
    )
    asks = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        "l_linenumber",
        F.lit("ask").alias("side"),
        F.lit(False).alias("is_snapshot"),
    )
    return bids.unionByName(asks)


@register(
    "filter_corrupt_json",
    oracle="""
    WITH frames(frame) AS (
      VALUES ('{"e":"trade","E":1727000000123,"t":1001,"p":"598.10","q":"0.25","m":false}'),
             ('{"e":"trade","E":1727000000456,"t":1002,"p":"598.20","q":"1.00","m":true}'),
             ('{"result":null,"id":1}'),
             ('{"e":"trade","E":172700'),
             ('not json at all'),
             ('{"e":"depthUpdate","E":1727000000150}')
    )
    SELECT COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE json_valid(frame)) AS n_parsed,
           COUNT(*) FILTER (WHERE json_extract_string(
                CASE WHEN json_valid(frame) THEN frame END, '$.e') = 'trade') AS n_trades
    FROM frames
    """,
    doc="Malformed-record drop: the reference warns+drops rows that fail "
    "json.loads (spot_trades_etl.py:56-58). Engine: from_json PERMISSIVE "
    "yields null for corrupt frames -> filter, never crash.",
    tags=("filter", "json"),
)
def filter_corrupt_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = [
        ('{"e":"trade","E":1727000000123,"t":1001,"p":"598.10","q":"0.25","m":false}',),
        ('{"e":"trade","E":1727000000456,"t":1002,"p":"598.20","q":"1.00","m":true}',),
        ('{"result":null,"id":1}',),
        ('{"e":"trade","E":172700',),
        ("not json at all",),
        ('{"e":"depthUpdate","E":1727000000150}',),
    ]
    df = spark.createDataFrame(frames, "frame STRING")
    # PERMISSIVE mode yields an all-null struct for corrupt input; the
    # quarantine column (columnNameOfCorruptRecord) is the reliable flag.
    parsed = df.select(
        F.from_json(
            "frame",
            # 'E' (event ms) is omitted: field names resolve
            # case-insensitively and would clash with 'e'.
            "e STRING, t BIGINT, p STRING, q STRING, m BOOLEAN, _corrupt STRING",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("j")
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("j._corrupt").isNull(), 1)).alias("n_parsed"),
        F.count(
            F.when(F.col("j._corrupt").isNull() & (F.col("j.e") == "trade"), 1)
        ).alias("n_trades"),
    )


# ---------------------------------------------------------------------------
# 2.4 Set operations
# ---------------------------------------------------------------------------


@register(
    "setop_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus <> 'O'
    """,
    doc="UNION ALL (reference pd.concat of bid/ask frames, "
    "spot_depth_etl.py:111). unionByName is a zero-shuffle plan node.",
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return o.where(F.col("o_orderstatus") == "O").unionByName(
        o.where(F.col("o_orderstatus") != "O")
    )


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct): nations having both customers and suppliers.",
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT (distinct): nations with customers but no suppliers.",
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # subtract == EXCEPT DISTINCT


# ---------------------------------------------------------------------------
# 2.5 Joins
# ---------------------------------------------------------------------------


@register(
    "join_inner_broadcast",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    doc="5-table equi-join chain (TPC-H Q5 shape). Scale plan: fact table "
    "shuffles once on l_orderkey to meet orders; customer/nation/region "
    "are broadcast (dim tables stay under the broadcast threshold even at "
    "100 TB fact scale), so no additional shuffles. AQE demotes to SMJ if "
    "a 'dim' is unexpectedly huge.",
    tags=("join", "agg"),
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_spent
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    doc="LEFT OUTER dim enrichment with misses: customers with zero "
    "orders keep a row (COUNT of null join side = 0, SUM = NULL). "
    "Scale: fact shuffles once on the join key; the follow-on group-by "
    "reuses that partitioning (no second exchange).",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice").alias("total_spent"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
    doc="LEFT SEMI existence filter: customers with at least one large "
    "order. Semi-join never duplicates the left side and broadcasts the "
    "filter set when small.",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="LEFT ANTI: customers with no orders at all. Scale: one "
    "shuffled hash anti-join on the key; the anti side is key-only "
    "(column-pruned), never duplicated.",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_range_seq",
    oracle="""
    WITH last_seen(user_id, last_id) AS (
      SELECT user_id, MAX(event_id) AS last_id
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT e.user_id, COUNT(*) AS n_after,
           MIN(e.event_id) AS first_after_id
    FROM events e JOIN last_seen s
      ON e.user_id = s.user_id AND e.event_id > s.last_id
    GROUP BY e.user_id
    """,
    doc="Sequence-id range join, the book-sync bridge predicate shape "
    "(reference book_utils.py:34-44: keep deltas with u > lastUpdateId). "
    "Equi key (user_id) + range residual -> planned as a hash join with "
    "a post-filter, NOT a cartesian; scales as a normal shuffle join.",
    tags=("join", "range"),
)
def join_range_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    last_seen = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.max("event_id").alias("last_id"))
    )
    ev = e.alias("e")
    s = last_seen.alias("s")
    return (
        ev.join(
            s,
            (F.col("e.user_id") == F.col("s.user_id"))
            & (F.col("e.event_id") > F.col("s.last_id")),
        )
        .groupBy(F.col("e.user_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_after"),
            F.min("e.event_id").alias("first_after_id"),
        )
    )


@register(
    "join_interval",
    oracle="""
    SELECT p.event_id AS purchase_id, COUNT(c.event_id) AS n_clicks_before
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
    GROUP BY p.event_id
    """,
    doc="Interval/temporal join: clicks within 30 min before each "
    "purchase by the same user. Equi key (user_id) keeps it a hash join "
    "with a range residual; at 100 TB add time-bucket keys to both sides "
    "(see operators.asof for the bucketed pattern).",
    tags=("join", "range"),
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").alias("p")
    c = e.where(F.col("event_type") == "click").alias("c")
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c.ts") < F.col("p.ts"))
    )
    return (
        p.join(c, cond, "left")
        .groupBy(F.col("p.event_id").alias("purchase_id"))
        .agg(F.count(F.col("c.event_id")).alias("n_clicks_before"))
    )


# ---------------------------------------------------------------------------
# 2.6 Aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship: TPC-H Q1 pricing summary. Partial+final hash agg on "
    "2 low-cardinality keys — map-side combine means shuffle volume is "
    "O(partitions x groups), independent of fact rows: ideal at 100 TB. "
    "Filter pushed to parquet scan.",
    tags=("agg", "flagship"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="COUNT DISTINCT per group (expand+two-phase agg under the hood; "
    "exact, shuffles distinct pairs).",
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "agg_approx_distinct",
    oracle=None,  # approximate — rows-only check; exactness asserted in unit tests
    doc="approx_count_distinct (HyperLogLog++): the 100 TB path for "
    "distinct counts — fixed-size sketch, map-side combinable, no "
    "distinct-pair shuffle. rsd=0.01.",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx"))
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INT) AS gid,
           COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP multi-granularity totals (region, region+nation, grand) "
    "with GROUPING id to disambiguate real NULLs from subtotal rows.",
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "agg_pivot_case",
    oracle=f"""
    SELECT user_id,
           {sql_dsum("CASE WHEN event_type = 'click' THEN value ELSE 0 END")} AS click_value,
           {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS purchase_value,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors
    FROM events GROUP BY user_id
    """,
    doc="Filtered/conditional aggregation: one pass over events computes "
    "per-type metrics (reference consumers would make N passes over CSV).",
    tags=("agg",),
)
def agg_pivot_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        dsum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(F.lit(0.0))).alias(
            "click_value"
        ),
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0))
        ).alias("purchase_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )


@register(
    "agg_percentile",
    oracle=None,  # interpolation differs across engines — rows-only; bounds unit-tested
    doc="Percentiles: exact `percentile` locally; at 100 TB switch to "
    "percentile_approx (t-digest-style sketch, map-side combinable).",
    tags=("agg", "approx"),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("round(percentile(value, 0.5), 6)").alias("p50"),
        F.expr("round(percentile(value, 0.95), 6)").alias("p95"),
        F.expr("round(percentile_approx(value, 0.5), 6)").alias("p50_approx"),
    )


@register(
    "agg_percentile_exact",
    oracle="""
    SELECT event_type,
           CAST(quantile_disc(value, 0.25) AS DOUBLE) AS p25,
           CAST(quantile_disc(value, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_disc(value, 0.9) AS DOUBLE) AS p90,
           CAST(quantile_disc(value, 0.99) AS DOUBLE) AS p99,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="DISCRETE percentiles (percentile_disc / SQL-standard WITHIN "
    "GROUP): selects an actual element (smallest value with cume_dist "
    ">= p), so unlike interpolated percentile there is NO cross-engine "
    "float arithmetic to drift — the exact-oracle companion to the "
    "rows-only agg_percentile. Scale: per-group sort-based selection; "
    "at 100 TB the approx sketch path (percentile_approx, map-side "
    "combinable) remains the production default and agg_percentile's "
    "error-bound tests cover it.",
    tags=("agg",),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    e.createOrReplaceTempView("events_pdisc")
    return spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS p25,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY value) AS p90,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99,
               COUNT(*) AS n
        FROM events_pdisc GROUP BY event_type ORDER BY event_type
        """
    )


@register(
    "agg_min_by",
    oracle="""
    SELECT event_type,
           ARG_MIN(epoch_us(ts), event_id) AS first_ts_us,
           ARG_MAX(epoch_us(ts), event_id) AS last_ts_us,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events GROUP BY event_type
    """,
    doc="min_by/max_by row-at-extreme (the reference's bridge search, "
    "book_utils.py:40-44, is a min-by-sequence-id scan). Ordering key "
    "event_id is unique -> deterministic.",
    tags=("agg",),
)
def agg_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.min_by(F.unix_micros("ts"), "event_id").alias("first_ts_us"),
        F.max_by(F.unix_micros("ts"), "event_id").alias("last_ts_us"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# 2.8 Sorts / limits / top-k
# ---------------------------------------------------------------------------


@register(
    "sort_multikey",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, event_type, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 1000
    """,
    doc="Multi-key sort + limit (reference sorts each update frame by "
    "[timestamp, side], spot_depth_etl.py:111). Catalyst plans "
    "TakeOrderedAndProject: per-partition top-k then k-way merge — no "
    "global sort shuffle.",
    tags=("sort",),
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .select("event_id", F.unix_micros("ts").alias("ts_us"), "event_type", "value")
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(1000)
    )


@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    doc="Top-k (reference snapshot limit=1000, book_utils.py:29). "
    "TakeOrderedAndProject: O(k) memory per partition at any scale.",
    tags=("sort",),
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )
