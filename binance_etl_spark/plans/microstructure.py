"""Market microstructure feature suite — the analysis layer the
reference's output tables exist to feed (its trades/depth CSVs are
exactly the tape these estimators consume; reference README.md:70-84).

A deterministic synthetic tape is derived from the `events` table
(event_id -> trade id, user_id%5 -> symbol, value -> price,
event_id%7+1 -> size, event_id parity -> aggressor side), so every
estimator has a stable parquet input and an exact DuckDB oracle.

Cross-engine float discipline (the repo's parity rules): returns and
price diffs use only IEEE-exact ops (subtract/divide — NO ln, whose
last ulp differs across libm builds); every order-sensitive SUM is
floored to integer units first (bigint adds are order-free across
partitionings AND engines); sqrt is IEEE-correctly-rounded, so Roll's
estimator is bit-stable.

Scale notes: every query is one window pass partitioned by symbol
(the shuffle key) + one map-side-combinable aggregate — no joins
beyond a broadcast-sized bucket self-lead, no collects; the 100 TB
shape is scan -> keyed window -> partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

# price > 0 guard in BOTH engines: a non-positive print is not a
# valid tape row (and a zero would divide the return computation to an
# ANSI error — sf0.1 carries a handful of zero-valued events).
_TAPE_SQL = """
      SELECT event_id AS tid, CAST(user_id % 5 AS INT) AS sym, ts,
             value AS price,
             CAST(event_id % 7 + 1 AS BIGINT) AS qty,
             CASE WHEN event_id % 2 = 0 THEN 1 ELSE -1 END AS side
      FROM events WHERE value > 0
"""


def _tape(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("value") > 0)
    return e.select(
        F.col("event_id").alias("tid"),
        (F.col("user_id") % 5).cast("int").alias("sym"),
        "ts",
        F.col("value").alias("price"),
        (F.col("event_id") % 7 + 1).cast("bigint").alias("qty"),
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(-1).alias("side"),
    )


def _wsym():
    return W.partitionBy("sym").orderBy("ts", "tid")


# --- ms_realized_vol ---------------------------------------------------


@register(
    "ms_realized_vol",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    r AS (
      SELECT sym, ts, tid,
             (price - lag(price) OVER w) / lag(price) OVER w AS ret
      FROM t WINDOW w AS (PARTITION BY sym ORDER BY ts, tid)
    ), rr AS (
      SELECT sym, ret,
             lag(ret) OVER (PARTITION BY sym ORDER BY ts, tid) AS pret
      FROM r
    )
    SELECT sym,
           COUNT(ret) AS n_returns,
           CAST(SUM(CAST(floor(ret * ret * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000 AS rv,
           CAST(SUM(CASE WHEN pret IS NOT NULL THEN
                  CAST(floor(abs(ret) * abs(pret) * 1000000) AS BIGINT)
                END) AS DOUBLE) / 1000000 AS bv
    FROM rr WHERE ret IS NOT NULL
    GROUP BY sym ORDER BY sym
    """,
    doc="Realized volatility + bipower variation per symbol: RV = sum "
    "of squared simple returns, BV = sum |r_t||r_(t-1)| (the "
    "jump-robust companion; RV >> BV flags jump days). One window "
    "pass partitioned by symbol (the shuffle key), floor-e6 integer "
    "partial sums (order-free, map-side combinable) — the 100 TB "
    "plan is scan -> keyed window -> partial agg, no joins.",
    tags=("market", "risk", "window"),
)
def ms_realized_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = _wsym()
    lagp = F.lag("price").over(w)
    r = t.select(
        "sym", "ts", "tid", ((F.col("price") - lagp) / lagp).alias("ret")
    )
    rr = r.select("sym", "ret", F.lag("ret").over(_wsym()).alias("pret"))
    e6 = lambda c: F.floor(c * F.lit(1_000_000)).cast("bigint")  # noqa: E731
    return (
        rr.where(F.col("ret").isNotNull())
        .groupBy("sym")
        .agg(
            F.count("ret").alias("n_returns"),
            (F.sum(e6(F.col("ret") * F.col("ret"))).cast("double") / 1e6).alias("rv"),
            (
                F.sum(
                    F.when(
                        F.col("pret").isNotNull(),
                        e6(F.abs("ret") * F.abs("pret")),
                    )
                ).cast("double")
                / 1e6
            ).alias("bv"),
        )
        .orderBy("sym")
    )


# --- ms_roll_spread ----------------------------------------------------


@register(
    "ms_roll_spread",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    d AS (
      SELECT sym, ts, tid, price - lag(price) OVER w AS dp
      FROM t WINDOW w AS (PARTITION BY sym ORDER BY ts, tid)
    ), pairs AS (
      SELECT sym, dp, lag(dp) OVER (PARTITION BY sym ORDER BY ts, tid) AS pdp
      FROM d
    ), s AS (
      SELECT sym, COUNT(*) AS m,
             SUM(CAST(floor(dp * pdp * 1000000) AS BIGINT)) AS sxy_e6,
             SUM(CAST(floor(dp * 1000) AS BIGINT)) AS sx_e3,
             SUM(CAST(floor(pdp * 1000) AS BIGINT)) AS sy_e3
      FROM pairs WHERE dp IS NOT NULL AND pdp IS NOT NULL
      GROUP BY sym
    )
    SELECT sym, m AS n_pairs,
           CAST(sxy_e6 AS DOUBLE) / 1000000 / m
             - (CAST(sx_e3 AS DOUBLE) / 1000 / m)
               * (CAST(sy_e3 AS DOUBLE) / 1000 / m) AS autocov,
           2 * sqrt(greatest(0,
             -(CAST(sxy_e6 AS DOUBLE) / 1000000 / m
               - (CAST(sx_e3 AS DOUBLE) / 1000 / m)
                 * (CAST(sy_e3 AS DOUBLE) / 1000 / m)))) AS roll_spread
    FROM s ORDER BY sym
    """,
    doc="Roll's implied effective spread: 2*sqrt(-cov(dp_t, dp_(t-1))) "
    "when the first-order autocovariance of price CHANGES is negative "
    "(bid-ask bounce), clamped at 0 otherwise. Covariance assembled "
    "from floor-scaled integer partial sums (order-free bigint adds; "
    "the final double arithmetic and the IEEE-correctly-rounded sqrt "
    "are bit-identical across engines). One keyed window pass + one "
    "map-side-combinable aggregate — no shuffle beyond the symbol key.",
    tags=("market", "risk", "window"),
)
def ms_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    d = t.select(
        "sym", "ts", "tid",
        (F.col("price") - F.lag("price").over(_wsym())).alias("dp"),
    )
    pairs = d.select("sym", "dp", F.lag("dp").over(_wsym()).alias("pdp")).where(
        F.col("dp").isNotNull() & F.col("pdp").isNotNull()
    )
    sxy = F.sum(F.floor(F.col("dp") * F.col("pdp") * 1_000_000).cast("bigint"))
    sx = F.sum(F.floor(F.col("dp") * 1_000).cast("bigint"))
    sy = F.sum(F.floor(F.col("pdp") * 1_000).cast("bigint"))
    s = pairs.groupBy("sym").agg(
        F.count(F.lit(1)).alias("m"),
        sxy.alias("sxy_e6"),
        sx.alias("sx_e3"),
        sy.alias("sy_e3"),
    )
    autocov = (
        F.col("sxy_e6").cast("double") / 1e6 / F.col("m")
        - (F.col("sx_e3").cast("double") / 1e3 / F.col("m"))
        * (F.col("sy_e3").cast("double") / 1e3 / F.col("m"))
    )
    return s.select(
        "sym",
        F.col("m").alias("n_pairs"),
        autocov.alias("autocov"),
        (2 * F.sqrt(F.greatest(F.lit(0.0), -autocov))).alias("roll_spread"),
    ).orderBy("sym")


# --- ms_ofi_forward_returns --------------------------------------------


@register(
    "ms_ofi_forward_returns",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    b AS (
      SELECT sym, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
             ts, tid, price, qty, side
      FROM t
    ), agg AS (
      SELECT sym, bucket,
             CAST(SUM(CASE WHEN side = 1 THEN qty ELSE 0 END) AS BIGINT) AS buy_qty,
             CAST(SUM(CASE WHEN side = -1 THEN qty ELSE 0 END) AS BIGINT) AS sell_qty
      FROM b GROUP BY sym, bucket
    ), closes AS (
      SELECT sym, bucket, price AS close FROM (
        SELECT sym, bucket, price,
               ROW_NUMBER() OVER (PARTITION BY sym, bucket
                                  ORDER BY ts DESC, tid DESC) AS rn
        FROM b
      ) WHERE rn = 1
    ), j AS (
      SELECT a.sym, a.bucket, a.buy_qty, a.sell_qty, c.close,
             lead(c.close) OVER (PARTITION BY a.sym ORDER BY a.bucket) AS next_close
      FROM agg a JOIN closes c ON a.sym = c.sym AND a.bucket = c.bucket
    )
    SELECT sym, bucket, buy_qty, sell_qty,
           CAST(buy_qty - sell_qty AS DOUBLE) / (buy_qty + sell_qty) AS imbalance,
           (next_close - close) / close AS fwd_ret
    FROM j ORDER BY sym, bucket
    """,
    doc="Order-flow imbalance with forward returns — the standard "
    "alpha-research frame: per (symbol, hour) signed-volume imbalance "
    "(buy-sell)/(buy+sell) joined to the NEXT hour's close-to-close "
    "return (lead over the per-symbol bucket series; the label the "
    "feature is evaluated against, NULL on the last bucket). Volumes "
    "are exact integer sums; the bucket lead runs over the tiny "
    "per-symbol bucket table. Shuffles once on (sym, bucket), then "
    "once on sym for the lead — both key-partitioned, no data-sized "
    "join.",
    tags=("market", "window", "agg"),
)
def ms_ofi_forward_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    b = t.select(
        "sym",
        F.floor(F.col("ts").cast("double").cast("long") / 3600).cast("bigint").alias("bucket"),
        "ts", "tid", "price", "qty", "side",
    )
    agg = b.groupBy("sym", "bucket").agg(
        F.sum(F.when(F.col("side") == 1, F.col("qty")).otherwise(0)).alias("buy_qty"),
        F.sum(F.when(F.col("side") == -1, F.col("qty")).otherwise(0)).alias("sell_qty"),
    )
    wb = W.partitionBy("sym", "bucket").orderBy(F.col("ts").desc(), F.col("tid").desc())
    closes = (
        b.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select("sym", "bucket", F.col("price").alias("close"))
    )
    j = agg.join(closes, ["sym", "bucket"]).withColumn(
        "next_close",
        F.lead("close").over(W.partitionBy("sym").orderBy("bucket")),
    )
    return j.select(
        "sym", "bucket", "buy_qty", "sell_qty",
        (
            (F.col("buy_qty") - F.col("sell_qty")).cast("double")
            / (F.col("buy_qty") + F.col("sell_qty"))
        ).alias("imbalance"),
        ((F.col("next_close") - F.col("close")) / F.col("close")).alias("fwd_ret"),
    ).orderBy("sym", "bucket")


# --- ms_amihud_illiq ---------------------------------------------------


@register(
    "ms_amihud_illiq",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    b AS (
      SELECT sym, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
             ts, tid, price, qty
      FROM t
    ), agg AS (
      SELECT sym, bucket,
             SUM(CAST(floor(price * qty * 1000000) AS BIGINT)) AS dv_e6
      FROM b GROUP BY sym, bucket
    ), closes AS (
      SELECT sym, bucket, price AS close FROM (
        SELECT sym, bucket, price,
               ROW_NUMBER() OVER (PARTITION BY sym, bucket
                                  ORDER BY ts DESC, tid DESC) AS rn
        FROM b
      ) WHERE rn = 1
    ), j AS (
      SELECT a.sym, a.bucket, a.dv_e6, c.close,
             lag(c.close) OVER (PARTITION BY a.sym ORDER BY a.bucket) AS prev_close
      FROM agg a JOIN closes c ON a.sym = c.sym AND a.bucket = c.bucket
    ), r AS (
      SELECT sym, bucket,
             abs((close - prev_close) / prev_close)
               / (CAST(dv_e6 AS DOUBLE) / 1000000) AS ratio
      FROM j WHERE prev_close IS NOT NULL
    )
    SELECT sym,
           COUNT(*) AS n_buckets,
           CAST(SUM(CAST(floor(ratio * 1000000000000) AS BIGINT)) AS DOUBLE)
             / 1000000000000 / COUNT(*) AS amihud
    FROM r GROUP BY sym ORDER BY sym
    """,
    doc="Amihud (2002) illiquidity: per (symbol, hour) the absolute "
    "close-to-close return divided by dollar volume, averaged over "
    "buckets per symbol — the standard price-impact-per-dollar proxy. "
    "Dollar volume is a floor-e6 integer partial sum (order-free, "
    "map-side combinable); the per-bucket ratios are floor-e12 "
    "integers before the cross-bucket sum, so the average is "
    "bit-identical across engines and partitionings. Shuffles once "
    "on (sym, bucket) then once on sym — the identical keyed 100 TB "
    "shape as ms_ofi_forward_returns; no data-sized join.",
    tags=("market", "risk", "agg"),
)
def ms_amihud_illiq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    b = t.select(
        "sym",
        F.floor(F.col("ts").cast("double").cast("long") / 3600).cast("bigint").alias("bucket"),
        "ts", "tid", "price", "qty",
    )
    agg = b.groupBy("sym", "bucket").agg(
        F.sum(F.floor(F.col("price") * F.col("qty") * 1_000_000).cast("bigint")).alias("dv_e6")
    )
    wb = W.partitionBy("sym", "bucket").orderBy(F.col("ts").desc(), F.col("tid").desc())
    closes = (
        b.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select("sym", "bucket", F.col("price").alias("close"))
    )
    j = agg.join(closes, ["sym", "bucket"]).withColumn(
        "prev_close", F.lag("close").over(W.partitionBy("sym").orderBy("bucket"))
    )
    r = j.where(F.col("prev_close").isNotNull()).select(
        "sym",
        (
            F.abs((F.col("close") - F.col("prev_close")) / F.col("prev_close"))
            / (F.col("dv_e6").cast("double") / 1e6)
        ).alias("ratio"),
    )
    return (
        r.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            (
                F.sum(F.floor(F.col("ratio") * 1_000_000_000_000).cast("bigint")).cast("double")
                / 1e12
                / F.count(F.lit(1))
            ).alias("amihud"),
        )
        .orderBy("sym")
    )


# --- ms_kyle_lambda ----------------------------------------------------


@register(
    "ms_kyle_lambda",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    b AS (
      SELECT sym, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
             ts, tid, price, qty, side
      FROM t
    ), flow AS (
      SELECT sym, bucket, SUM(side * qty) AS x
      FROM b GROUP BY sym, bucket
    ), ends AS (
      SELECT sym, bucket,
             max(CASE WHEN rn_a = 1 THEN price END) AS open,
             max(CASE WHEN rn_d = 1 THEN price END) AS close
      FROM (
        SELECT sym, bucket, price,
               ROW_NUMBER() OVER (PARTITION BY sym, bucket
                                  ORDER BY ts, tid) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY sym, bucket
                                  ORDER BY ts DESC, tid DESC) AS rn_d
        FROM b
      ) WHERE rn_a = 1 OR rn_d = 1
      GROUP BY sym, bucket
    ), xy AS (
      SELECT f.sym, f.x, (e.close - e.open) / e.open AS y
      FROM flow f JOIN ends e ON f.sym = e.sym AND f.bucket = e.bucket
    ), s AS (
      SELECT sym, COUNT(*) AS n,
             SUM(x) AS sx, SUM(x * x) AS sx2,
             SUM(CAST(floor(y * 1000000000) AS BIGINT)) AS sy_e9,
             SUM(CAST(floor(x * y * 1000000000) AS BIGINT)) AS sxy_e9
      FROM xy GROUP BY sym
    )
    SELECT sym, n AS n_buckets, CAST(sx AS BIGINT) AS net_signed_volume,
           (n * (CAST(sxy_e9 AS DOUBLE) / 1000000000)
             - sx * (CAST(sy_e9 AS DOUBLE) / 1000000000))
           / nullif(CAST(n * sx2 - sx * sx AS DOUBLE), 0) AS kyle_lambda
    FROM s ORDER BY sym
    """,
    doc="Kyle (1985) lambda: per symbol, the OLS slope of the "
    "within-bucket open-to-close return on the bucket's net signed "
    "volume — price impact per unit of order flow. Signed volume and "
    "its square are EXACT bigint partial sums; the return moments are "
    "floor-e9 integers, so the closed-form slope (n*Sxy - Sx*Sy) / "
    "(n*Sx2 - Sx^2) is assembled from identical integers in both "
    "engines (bit-stable doubles; NULL when flow has zero variance). "
    "Two keyed shuffles — (sym, bucket) then sym — all aggregates "
    "map-side combinable; scales like every other ms_* estimator.",
    tags=("market", "risk", "agg"),
)
def ms_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    b = t.select(
        "sym",
        F.floor(F.col("ts").cast("double").cast("long") / 3600).cast("bigint").alias("bucket"),
        "ts", "tid", "price", "qty", "side",
    )
    flow = b.groupBy("sym", "bucket").agg(F.sum(F.col("side") * F.col("qty")).alias("x"))
    wa = W.partitionBy("sym", "bucket").orderBy("ts", "tid")
    wd = W.partitionBy("sym", "bucket").orderBy(F.col("ts").desc(), F.col("tid").desc())
    ends = (
        b.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .where((F.col("rn_a") == 1) | (F.col("rn_d") == 1))
        .groupBy("sym", "bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("price"))).alias("open"),
            F.max(F.when(F.col("rn_d") == 1, F.col("price"))).alias("close"),
        )
    )
    xy = flow.join(ends, ["sym", "bucket"]).select(
        "sym", "x", ((F.col("close") - F.col("open")) / F.col("open")).alias("y")
    )
    s = xy.groupBy("sym").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.floor(F.col("y") * 1_000_000_000).cast("bigint")).alias("sy_e9"),
        F.sum(F.floor(F.col("x") * F.col("y") * 1_000_000_000).cast("bigint")).alias("sxy_e9"),
    )
    return s.select(
        "sym",
        F.col("n").alias("n_buckets"),
        F.col("sx").alias("net_signed_volume"),
        (
            (
                F.col("n") * (F.col("sxy_e9").cast("double") / 1e9)
                - F.col("sx") * (F.col("sy_e9").cast("double") / 1e9)
            )
            / F.nullif(
                (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double"),
                F.lit(0.0),
            )
        ).alias("kyle_lambda"),
    ).orderBy("sym")


# --- ms_tick_rule_autocorr ---------------------------------------------


@register(
    "ms_tick_rule_autocorr",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    ticks AS (
      SELECT sym, ts, tid,
             CAST(sign(price - lag(price) OVER w) AS INT) AS tick
      FROM t WINDOW w AS (PARTITION BY sym ORDER BY ts, tid)
    ), signs AS (
      SELECT sym, ts, tid,
             last_value(nullif(tick, 0) IGNORE NULLS)
               OVER (PARTITION BY sym ORDER BY ts, tid
                     ROWS UNBOUNDED PRECEDING) AS s
      FROM ticks
    ), pairs AS (
      SELECT sym, s, lag(s) OVER (PARTITION BY sym ORDER BY ts, tid) AS ps
      FROM signs
    )
    SELECT sym,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(s * ps AS BIGINT)) AS BIGINT) AS sum_prod,
           CAST(SUM(CAST(s * ps AS BIGINT)) AS DOUBLE) / COUNT(*) AS autocorr,
           CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS buy_fraction
    FROM pairs WHERE s IS NOT NULL AND ps IS NOT NULL
    GROUP BY sym ORDER BY sym
    """,
    doc="Tick-rule trade signing + sign persistence: each trade gets "
    "the sign of the last non-zero price tick (the classic Lee-Ready "
    "tick test's fallback chain), then lag-1 sign autocorrelation "
    "(E[s_t * s_(t-1)] over ±1 ints — exact integer sums, the "
    "order-splitting persistence measure) and the signed buy "
    "fraction. Two window passes over the symbol key, integer "
    "aggregates — map-side combinable, no joins.",
    tags=("market", "window"),
)
def ms_tick_rule_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    ticks = t.select(
        "sym", "ts", "tid",
        F.signum(F.col("price") - F.lag("price").over(_wsym())).cast("int").alias("tick"),
    )
    signs = ticks.select(
        "sym", "ts", "tid",
        F.last(F.nullif(F.col("tick"), F.lit(0)), ignorenulls=True)
        .over(_wsym().rowsBetween(W.unboundedPreceding, 0))
        .alias("s"),
    )
    pairs = signs.select("sym", "s", F.lag("s").over(_wsym()).alias("ps")).where(
        F.col("s").isNotNull() & F.col("ps").isNotNull()
    )
    prod = (F.col("s") * F.col("ps")).cast("bigint")
    return (
        pairs.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(prod).alias("sum_prod"),
            (F.sum(prod).cast("double") / F.count(F.lit(1))).alias("autocorr"),
            (
                F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("buy_fraction"),
        )
        .orderBy("sym")
    )


# --- ms_microprice -------------------------------------------------------

# Deterministic synthetic QUOTE stream from the same events spine the
# tape uses: mid = value, half-spread/sizes from event_id residues —
# a stable parquet input with an exact oracle, matching _TAPE_SQL's
# approach for trades.
_QUOTES_SQL = """
      SELECT event_id AS qid, CAST(user_id % 5 AS INT) AS sym, ts,
             value - (event_id % 5 + 1) AS bid,
             value + (event_id % 5 + 1) AS ask,
             CAST(event_id % 7 + 1 AS BIGINT) AS bq,
             CAST(event_id % 11 + 1 AS BIGINT) AS aq
      FROM events WHERE value > 0
"""


@register(
    "ms_microprice",
    oracle=f"""
    WITH q AS ({_QUOTES_SQL}),
    per AS (
      SELECT sym,
             CAST(floor((ask * bq + bid * aq) / (bq + aq) * 1000000000
                        - (bid + ask) / 2 * 1000000000) AS BIGINT)
               AS prem_e9,
             CAST(floor(CAST(bq AS DOUBLE) / (bq + aq) * 1000000000)
                  AS BIGINT) AS imb_e9
      FROM q
    )
    SELECT sym, COUNT(*) AS n_quotes,
           CAST(SUM(prem_e9) AS BIGINT) AS sum_premium_e9,
           CAST(SUM(imb_e9) AS BIGINT) AS sum_imbalance_e9
    FROM per GROUP BY sym ORDER BY sym
    """,
    doc="Stoikov microprice + depth imbalance over the synthetic quote "
    "stream: microprice = (ask*bq + bid*aq)/(bq+aq) — the "
    "size-weighted fair price that leans toward the heavier side of "
    "the book (the standard short-horizon price-direction feature) — "
    "reported as its premium over the mid, plus the bid-size "
    "imbalance bq/(bq+aq). Both are floor-scaled to integer "
    "nano-units PER ROW before summing (order-free bigint adds; "
    "per-row double division is IEEE-exact-rounded and bit-identical "
    "across engines — no ln anywhere, per the tier's parity "
    "discipline). Scale: pure codegen projection + ONE "
    "map-side-combinable aggregate keyed by symbol — no window, no "
    "join, no shuffle beyond the k-symbol group-by.",
    tags=("market", "risk"),
)
def ms_microprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("value") > 0)
    q = e.select(
        (F.col("user_id") % 5).cast("int").alias("sym"),
        (F.col("value") - (F.col("event_id") % 5 + 1)).alias("bid"),
        (F.col("value") + (F.col("event_id") % 5 + 1)).alias("ask"),
        (F.col("event_id") % 7 + 1).cast("bigint").alias("bq"),
        (F.col("event_id") % 11 + 1).cast("bigint").alias("aq"),
    )
    per = q.select(
        "sym",
        F.floor(
            (F.col("ask") * F.col("bq") + F.col("bid") * F.col("aq"))
            / (F.col("bq") + F.col("aq"))
            * 1000000000
            - (F.col("bid") + F.col("ask")) / 2 * 1000000000
        )
        .cast("bigint")
        .alias("prem_e9"),
        F.floor(
            F.col("bq").cast("double") / (F.col("bq") + F.col("aq")) * 1000000000
        )
        .cast("bigint")
        .alias("imb_e9"),
    )
    return (
        per.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n_quotes"),
            F.sum("prem_e9").alias("sum_premium_e9"),
            F.sum("imb_e9").alias("sum_imbalance_e9"),
        )
        .orderBy("sym")
    )
