"""Event/market analytics (SURVEY.md §2.7 windows, §3 composites):
window functions, gap detection, sessionization, OHLCV bars, as-of join,
order-book rebuild — the queries the reference's output tables were
designed to serve (reference README.md:86-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.functions.parity import dsum, sql_dsum
from binance_etl_spark.operators.asof import asof_join, asof_join_nearest
from binance_etl_spark.operators.book import rebuild_book, rebuild_book_pandas
from binance_etl_spark.plans.registry import register


@register(
    "win_lag_gap_detect",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts,
             lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE prev_id IS NOT NULL AND event_id - prev_id > 100) AS n_gaps,
           MAX(CASE WHEN prev_id IS NULL THEN 0 ELSE event_id - prev_id END) AS max_gap
    FROM seq GROUP BY user_id
    """,
    doc="Lag-based sequence-gap detection — the batch twin of the "
    "reference's depth contiguity gate U_t == u_{t-1}+1 "
    "(spot_depth_etl.py:78-90). Engine policy: flag gaps, never crash "
    "the pipeline (the reference raises, :42).",
    tags=("window",),
)
def win_lag_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_id", F.lag("event_id").over(w))
    gap = F.col("event_id") - F.col("prev_id")
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("prev_id").isNotNull() & (gap > 100), 1)).alias("n_gaps"),
        F.max(F.when(F.col("prev_id").isNull(), 0).otherwise(gap)).alias("max_gap"),
    )


@register(
    "win_rank_topn",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Ranking window: top-3 orders per customer. One shuffle on "
    "o_custkey; rank state is O(1) per partition stream.",
    tags=("window",),
)
def win_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "win_lead_lag",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id)  OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS since_prev_us,
           CAST(first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS first_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Analytic functions: lead/lag/first_value per user timeline.",
    tags=("window",),
)
def win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("since_prev_us"),
        F.first("event_id").over(wfull).cast("bigint").alias("first_event_id"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS rolling4_value
    FROM events
    """,
    doc="Frame aggregates: running + rolling-4 sums per user (rolling "
    "VWAP shape). DECIMAL accumulation keeps results order-exact.",
    tags=("window",),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dval = F.col("value").cast("decimal(20,6)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.sum(dval)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.sum(dval)
        .over(w.rowsBetween(-3, Window.currentRow))
        .cast("double")
        .alias("rolling4_value"),
    )


@register(
    "win_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, event_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) AS session_end_us
    FROM sessions GROUP BY user_id, session_no
    """,
    doc="Sessionization with a 30-minute inactivity gap (Spark "
    "session_window semantics: a gap >= 30min starts a new session). "
    "Expressed via lag+cumsum so the batch and streaming "
    "(session_window) paths share one oracle.",
    tags=("window", "session"),
)
def win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_us >= 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessions.groupBy("user_id", F.col("session_no").cast("bigint").alias("session_no")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
    )


@register(
    "stream_ohlcv_bars",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_ts, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type, epoch_us(bar_ts) AS bar_us,
           CAST(MAX(CASE WHEN rn_open = 1 THEN value END) AS DOUBLE) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           CAST(MAX(CASE WHEN rn_close = 1 THEN value END) AS DOUBLE) AS close,
           {sql_dsum('value')} AS volume,
           COUNT(*) AS n_trades
    FROM ranked GROUP BY event_type, bar_ts
    """,
    doc="Tumbling 1-hour OHLCV bars — the canonical market-data rollup "
    "over the reference's trades table. Batch analog of the streaming "
    "windowed agg (streaming twin: F.window + watermark). open/close "
    "picked by deterministic row_number over (ts, event_id).",
    tags=("window", "agg", "market"),
)
def stream_ohlcv_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").withColumn("bar_ts", F.date_trunc("hour", "ts"))
    w_open = Window.partitionBy("event_type", "bar_ts").orderBy("ts", "event_id")
    w_close = Window.partitionBy("event_type", "bar_ts").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = e.select(
        "event_type",
        "bar_ts",
        "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return ranked.groupBy("event_type", F.unix_micros("bar_ts").alias("bar_us")).agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).cast("double").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).cast("double").alias("close"),
        dsum("value").alias("volume"),
        F.count(F.lit(1)).alias("n_trades"),
    )


@register(
    "join_asof_events",
    oracle="""
    SELECT p.event_id, p.user_id,
           s.event_id AS asof_event_id,
           s.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join: each purchase matched to the user's latest view at "
    "or before it — the trade-vs-book-state query (SURVEY.md §2.5). "
    "Implemented via union + last(ignorenulls) window "
    "(operators/asof.py): ONE shuffle on the key, O(left+right) work, "
    "no range-join row explosion; verified against DuckDB's native "
    "ASOF JOIN.",
    tags=("join", "asof"),
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    views = e.where(F.col("event_type") == "view").select("user_id", "ts", "event_id", "value")
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_event_id").alias("asof_event_id"),
        F.col("asof_value").alias("asof_value"),
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id, p.user_id,
           s.event_id AS asof_event_id,
           s.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') s
      ON p.user_id = s.user_id AND p.ts <= s.ts
    """,
    doc="Forward as-of join: each purchase matched to the user's "
    "EARLIEST view at or after it — the 'next quote after the order' "
    "direction (impact/markout analysis). Same union + window plan as "
    "backward as-of (operators/asof.py) — one shuffle, no range "
    "explosion — with first(ignorenulls) over the following frame; "
    "verified against DuckDB's native forward ASOF JOIN.",
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        direction="forward",
    )
    return joined.select("event_id", "user_id", "asof_event_id", "asof_value")


@register(
    "join_asof_tolerance",
    oracle="""
    SELECT p.event_id, p.user_id,
           CASE WHEN s.ts >= p.ts - INTERVAL 30 MINUTE
                THEN s.event_id END AS asof_event_id,
           CASE WHEN s.ts >= p.ts - INTERVAL 30 MINUTE
                THEN s.value END AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join with a staleness bound: matches older than 30 "
    "minutes are nulled (a quote that old is not 'the prevailing "
    "quote'). The tolerance is applied inside the same single window "
    "pass — no second join, no second shuffle; oracle nulls DuckDB's "
    "native ASOF match by the same rule.",
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        tolerance="30 minutes",
    )
    return joined.select("event_id", "user_id", "asof_event_id", "asof_value")


def _depth_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events reshaped into the depth-update schema: (side, level, qty)
    keyed update stream where qty == 0 means delete (reference
    README.md:60 semantics; 'error' events play the delete role)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        (F.col("user_id") % 50).alias("level"),
        F.when(F.col("event_type").isin("click", "view"), "bid").otherwise("ask").alias("side"),
        F.when(F.col("event_type") == "error", F.lit(0.0)).otherwise(F.col("value")).alias(
            "quantity"
        ),
        "ts",
        "event_id",
    )


_BOOK_ORACLE = """
    WITH updates AS (
      SELECT user_id % 50 AS level,
             CASE WHEN event_type IN ('click','view') THEN 'bid' ELSE 'ask' END AS side,
             CASE WHEN event_type = 'error' THEN 0.0 ELSE value END AS quantity,
             ts, event_id
      FROM events
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY side, level
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM updates
    )
    SELECT side, level, quantity AS last_qty
    FROM ranked WHERE rn = 1 AND quantity > 0
"""


@register(
    "book_rebuild",
    oracle=_BOOK_ORACLE,
    doc="Order-book state rebuild: last quantity per (side, price-level) "
    "with qty=0 delete semantics (reference spot_depth_etl.py:100 + "
    "README.md:60) — pure window-function plan (operators/book.py).",
    tags=("window", "market"),
)
def book_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    updates = _depth_analog(spark, sf_dir)
    book = rebuild_book(updates, key_cols=["side", "level"], order_cols=["ts", "event_id"])
    return book.select("side", "level", F.col("quantity").alias("last_qty"))


@register(
    "book_top_of_book",
    oracle=f"""
    WITH updates AS (
      SELECT user_id % 50 AS level,
             CASE WHEN event_type IN ('click','view') THEN 'bid' ELSE 'ask' END AS side,
             CASE WHEN event_type = 'error' THEN 0.0 ELSE value END AS quantity,
             ts, event_id
      FROM events
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY side, level
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM updates
    ), book AS (
      SELECT side, level, quantity FROM ranked WHERE rn = 1 AND quantity > 0
    )
    SELECT MAX(CASE WHEN side = 'bid' THEN level END) AS best_bid,
           MIN(CASE WHEN side = 'ask' THEN level END) AS best_ask,
           MIN(CASE WHEN side = 'ask' THEN level END)
             - MAX(CASE WHEN side = 'bid' THEN level END) AS spread,
           COUNT(CASE WHEN side = 'bid' THEN 1 END) AS bid_depth,
           COUNT(CASE WHEN side = 'ask' THEN 1 END) AS ask_depth
    FROM book
    """,
    doc="Top-of-book + spread + depth from the rebuilt book (best bid = "
    "highest live bid level, best ask = lowest live ask level) — the "
    "canonical consumer query over the reference's depth table "
    "(README.md:86-94 points users at exactly this kind of EDA).",
    tags=("window", "market"),
)
def book_top_of_book(spark: SparkSession, sf_dir: str) -> DataFrame:
    updates = _depth_analog(spark, sf_dir)
    book = rebuild_book(updates, key_cols=["side", "level"], order_cols=["ts", "event_id"])
    return book.agg(
        F.max(F.when(F.col("side") == "bid", F.col("level"))).alias("best_bid"),
        F.min(F.when(F.col("side") == "ask", F.col("level"))).alias("best_ask"),
        (
            F.min(F.when(F.col("side") == "ask", F.col("level")))
            - F.max(F.when(F.col("side") == "bid", F.col("level")))
        ).alias("spread"),
        F.count(F.when(F.col("side") == "bid", 1)).alias("bid_depth"),
        F.count(F.when(F.col("side") == "ask", 1)).alias("ask_depth"),
    )


@register(
    "udf_grouped_book",
    oracle=_BOOK_ORACLE,
    doc="Same book rebuild via groupBy().applyInPandas — the grouped-map "
    "Pandas UDF surface (SURVEY.md §2.11); must agree with the "
    "window-function implementation and the oracle.",
    tags=("udf", "market"),
)
def udf_grouped_book(spark: SparkSession, sf_dir: str) -> DataFrame:
    updates = _depth_analog(spark, sf_dir)
    book = rebuild_book_pandas(updates, key_cols=["side", "level"], order_cols=["ts", "event_id"])
    return book.select("side", "level", F.col("quantity").alias("last_qty"))


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    v AS (SELECT * FROM events WHERE event_type = 'view'),
    b AS (
      SELECT p.event_id, p.user_id, p.ts,
             s.ts AS b_ts, s.event_id AS b_eid, s.value AS b_val
      FROM p ASOF LEFT JOIN v s ON p.user_id = s.user_id AND p.ts >= s.ts
    ), f AS (
      SELECT p.event_id,
             s.ts AS f_ts, s.event_id AS f_eid, s.value AS f_val
      FROM p ASOF LEFT JOIN v s ON p.user_id = s.user_id AND p.ts <= s.ts
    ), m AS (
      SELECT b.event_id, b.user_id,
             (f_ts IS NULL OR (b_ts IS NOT NULL AND
              epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts)))
               AS use_b,
             b_ts, b_eid, b_val, f_ts, f_eid, f_val
      FROM b JOIN f USING (event_id)
    )
    SELECT event_id, user_id,
           CASE WHEN use_b THEN b_eid ELSE f_eid END AS asof_event_id,
           CASE WHEN use_b THEN b_val ELSE f_val END AS asof_value,
           CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
                WHEN use_b THEN 'backward' ELSE 'forward' END AS asof_dir
    FROM m
    """,
    doc="NEAREST as-of join: each purchase matched to whichever view "
    "is closer in time (ties -> backward) — sensor/quote alignment "
    "semantics. Both directions ride windows over the SAME user_id "
    "partitioning, so the operator is still ONE shuffle of "
    "O(|L|+|R|) rows (two in-partition sorts); the oracle composes "
    "DuckDB's native backward + forward ASOF joins and picks the "
    "closer match by the identical rule. operators/asof.py:asof_join_nearest.",
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join_nearest(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "value"],
    )
    return joined.select(
        "event_id", "user_id", "asof_event_id", "asof_value", "asof_dir"
    )
