"""Bar-level market analytics: OHLC volatility estimators and VWAP
execution benchmarks over the deterministic tape (see microstructure.py
— the analysis layer the reference's trade CSVs exist to feed,
reference README.md:70-84).

Cross-engine float discipline (same rules as microstructure.py): every
per-bar/per-trade term is an IEEE-exact expression tree (subtract,
multiply, divide by literals — no ln(): the classic log-range
estimators are computed on ARITHMETIC ranges (high-low)/high — the
small-return substitution with a bounded denominator, keeping every
per-bar term in [-3, 1] so floor-e12 integers can never overflow a
BIGINT sum — and no libm call whose last ulp varies across builds can
enter the hash); terms are floored to integer
e12/e6 units before any cross-row SUM, making aggregates order-free
across partitionings AND engines.

Scale notes: both queries are scan -> one shuffle keyed on
(sym, bucket) -> map-side-combinable per-sym aggregate. Bars compress
the tape ~3600x before the estimator math; the VWAP pass attaches the
bar VWAP with a partition window (no join) so the 100 TB shape is a
single keyed exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from binance_etl_spark.plans.microstructure import _TAPE_SQL, _tape
from binance_etl_spark.plans.registry import register

# 4*ln2 and (2*ln2 - 1) as literals: constants fold identically in both
# engines; only the per-bar arithmetic must be IEEE-exact.
_FOUR_LN2 = 2.772588722239781
_GK_CO = 0.3862943611198906


def _bars_sql() -> str:
    return f"""
    t AS ({_TAPE_SQL}),
    bars AS (
      SELECT sym, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
             first(price ORDER BY ts, tid) AS open,
             max(price) AS high,
             min(price) AS low,
             last(price ORDER BY ts, tid) AS close,
             COUNT(*) AS n_trades
      FROM t GROUP BY sym, CAST(floor(epoch(ts) / 3600) AS BIGINT)
    )"""


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    b = t.select(
        "sym",
        F.floor(F.col("ts").cast("double").cast("long") / 3600)
        .cast("bigint")
        .alias("bucket"),
        "ts",
        "tid",
        "price",
        "qty",
        "side",
    )
    return b.groupBy("sym", "bucket").agg(
        F.min_by("price", F.struct("ts", "tid")).alias("open"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max_by("price", F.struct("ts", "tid")).alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
    )


# --- ms_ohlc_vol_estimators --------------------------------------------


@register(
    "ms_ohlc_vol_estimators",
    oracle=f"""
    WITH {_bars_sql()},
    terms AS (
      SELECT sym,
             CAST(floor((high - low) / high * ((high - low) / high)
                        * 1000000000000) AS BIGINT) AS park_e12,
             CAST(floor((0.5 * ((high - low) / high) * ((high - low) / high)
                         - {_GK_CO} * ((close - open) / high)
                                    * ((close - open) / high))
                        * 1000000000000) AS BIGINT) AS gk_e12,
             CAST(floor(((high - close) * (high - open)
                         + (low - close) * (low - open)) / (high * high)
                        * 1000000000000) AS BIGINT) AS rs_e12
      FROM bars
    )
    SELECT sym,
           COUNT(*) AS n_bars,
           CAST(SUM(park_e12) AS DOUBLE) / 1000000000000 / COUNT(*)
             / {_FOUR_LN2} AS parkinson,
           CAST(SUM(gk_e12) AS DOUBLE) / 1000000000000 / COUNT(*)
             AS garman_klass,
           CAST(SUM(rs_e12) AS DOUBLE) / 1000000000000 / COUNT(*)
             AS rogers_satchell
    FROM terms GROUP BY sym ORDER BY sym
    """,
    doc="Range-based volatility estimators on hourly OHLC bars: "
    "Parkinson (1980), Garman-Klass (1980) and Rogers-Satchell (1991) "
    "per symbol, computed on arithmetic ranges (high-low)/high — the "
    "small-return substitution for the log ranges with a BOUNDED "
    "denominator (terms stay in [-3, 1]; floor-e12 sums can't overflow "
    "BIGINT on a synthetic tape whose bar open can sit 4 decades below "
    "its high), keeping every per-bar term an IEEE-exact expression "
    "(no libm ln whose last ulp differs across engines). Bars come "
    "from ONE groupBy on "
    "(sym, hour) using min_by/max_by over (ts, tid) for open/close "
    "(oracle: DuckDB ordered first/last aggregates); per-bar terms "
    "are floor-e12 integers before the per-sym sum, so results are "
    "bit-identical across engines and partitionings. 100 TB shape: "
    "scan -> keyed shuffle -> ~3600x bar compression -> tiny per-sym "
    "agg; no joins, no windows over the raw tape.",
    tags=("market", "risk", "agg"),
)
def ms_ohlc_vol_estimators(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = _bars(spark, sf_dir)
    rng = (F.col("high") - F.col("low")) / F.col("high")
    co = (F.col("close") - F.col("open")) / F.col("high")
    rs = (
        (F.col("high") - F.col("close")) * (F.col("high") - F.col("open"))
        + (F.col("low") - F.col("close")) * (F.col("low") - F.col("open"))
    ) / (F.col("high") * F.col("high"))
    terms = bars.select(
        "sym",
        F.floor(rng * rng * 1000000000000).cast("bigint").alias("park_e12"),
        F.floor((F.lit(0.5) * rng * rng - F.lit(_GK_CO) * co * co) * 1000000000000)
        .cast("bigint")
        .alias("gk_e12"),
        F.floor(rs * 1000000000000).cast("bigint").alias("rs_e12"),
    )
    n = F.count(F.lit(1))
    return (
        terms.groupBy("sym")
        .agg(
            n.alias("n_bars"),
            (
                F.sum("park_e12").cast("double") / 1000000000000 / n / _FOUR_LN2
            ).alias("parkinson"),
            (F.sum("gk_e12").cast("double") / 1000000000000 / n).alias(
                "garman_klass"
            ),
            (F.sum("rs_e12").cast("double") / 1000000000000 / n).alias(
                "rogers_satchell"
            ),
        )
        .orderBy("sym")
    )


# --- ms_vwap_execution -------------------------------------------------


@register(
    "ms_vwap_execution",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    b AS (
      SELECT sym, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket,
             price, qty, side,
             CAST(floor(price * 100) AS BIGINT) * qty AS pq_e2
      FROM t
    ), w AS (
      SELECT sym, bucket, price, qty, side,
             CAST(SUM(pq_e2) OVER (PARTITION BY sym, bucket) AS DOUBLE)
               / 100
               / SUM(qty) OVER (PARTITION BY sym, bucket) AS vwap
      FROM b
    ), c AS (
      SELECT sym, qty,
             CAST(floor(side * (price - vwap) * qty * 1000000) AS BIGINT)
               AS cost_e6,
             CASE WHEN side * (price - vwap) < 0 THEN 1 ELSE 0 END AS better
      FROM w
    )
    SELECT sym,
           COUNT(*) AS n_trades,
           CAST(SUM(qty) AS BIGINT) AS volume,
           CAST(SUM(cost_e6) AS BIGINT) AS shortfall_e6,
           CAST(SUM(better) AS BIGINT) AS n_beat_vwap
    FROM c GROUP BY sym ORDER BY sym
    """,
    doc="VWAP execution benchmark: per (symbol, hour) volume-weighted "
    "average price (integer e2 price-volume partials -> exact across "
    "partitionings), attached to every trade with a PARTITION window "
    "(no join), then per-symbol implementation shortfall "
    "side*(price-vwap)*qty — positive = paid through the benchmark — "
    "and the count of trades that beat it. Per-trade costs are "
    "floor-e6 integers before the sum. 100 TB shape: one keyed "
    "exchange on (sym, bucket) feeds both the window and the final "
    "map-side-combinable per-sym aggregate.",
    tags=("market", "window", "agg"),
)
def ms_vwap_execution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    b = t.select(
        "sym",
        F.floor(F.col("ts").cast("double").cast("long") / 3600)
        .cast("bigint")
        .alias("bucket"),
        "price",
        "qty",
        "side",
        (F.floor(F.col("price") * 100).cast("bigint") * F.col("qty")).alias(
            "pq_e2"
        ),
    )
    wb = W.partitionBy("sym", "bucket")
    w = b.select(
        "sym",
        "bucket",
        "price",
        "qty",
        "side",
        (
            F.sum("pq_e2").over(wb).cast("double")
            / 100
            / F.sum("qty").over(wb)
        ).alias("vwap"),
    )
    c = w.select(
        "sym",
        "qty",
        F.floor(
            F.col("side") * (F.col("price") - F.col("vwap")) * F.col("qty") * 1000000
        )
        .cast("bigint")
        .alias("cost_e6"),
        F.when(F.col("side") * (F.col("price") - F.col("vwap")) < 0, 1)
        .otherwise(0)
        .alias("better"),
    )
    return (
        c.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.sum("qty").alias("volume"),
            F.sum("cost_e6").cast("bigint").alias("shortfall_e6"),
            F.sum("better").cast("bigint").alias("n_beat_vwap"),
        )
        .orderBy("sym")
    )


# --- ms_var_cvar -------------------------------------------------------


@register(
    "ms_var_cvar",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    r AS (
      SELECT sym,
             CAST(floor((price - lag(price) OVER w) / lag(price) OVER w
                        * 1000000) AS BIGINT) AS r_e6
      FROM t WINDOW w AS (PARTITION BY sym ORDER BY ts, tid)
    ), rr AS (SELECT sym, r_e6 FROM r WHERE r_e6 IS NOT NULL),
    v AS (
      SELECT sym,
             COUNT(*) AS n_returns,
             CAST(quantile_disc(r_e6, 0.05) AS DOUBLE) AS var95_e6,
             CAST(quantile_disc(r_e6, 0.01) AS DOUBLE) AS var99_e6
      FROM rr GROUP BY sym
    )
    SELECT v.sym, v.n_returns, v.var95_e6, v.var99_e6,
           CAST(SUM(CASE WHEN rr.r_e6 <= v.var95_e6 THEN rr.r_e6 END)
                AS DOUBLE)
             / SUM(CASE WHEN rr.r_e6 <= v.var95_e6 THEN 1 ELSE 0 END)
             AS cvar95_e6
    FROM rr JOIN v ON rr.sym = v.sym
    GROUP BY v.sym, v.n_returns, v.var95_e6, v.var99_e6
    ORDER BY v.sym
    """,
    doc="Historical VaR and CVaR (expected shortfall) per symbol: "
    "returns floored to e6 integers (order-free), 95%/99% VaR as the "
    "DISCRETE 5%/1% quantile (percentile_disc selects an actual "
    "element — no interpolation arithmetic to drift, the "
    "agg_percentile_exact pairing), CVaR as the exact integer mean of "
    "the tail at-or-beyond VaR95. Shape: one keyed window pass for "
    "returns, a per-sym sort-based quantile, and a broadcast join of "
    "the 5-row VaR table back onto the returns for the tail mean — "
    "the returns shuffle once on sym and nothing else is data-sized.",
    tags=("market", "risk", "agg"),
)
def ms_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = W.partitionBy("sym").orderBy("ts", "tid")
    r = t.select(
        "sym",
        F.floor(
            (F.col("price") - F.lag("price").over(w))
            / F.lag("price").over(w)
            * 1000000
        )
        .cast("bigint")
        .alias("r_e6"),
    ).where(F.col("r_e6").isNotNull())
    r.createOrReplaceTempView("ms_var_returns")
    v = spark.sql(
        """
        SELECT sym,
               COUNT(*) AS n_returns,
               CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY r_e6)
                    AS DOUBLE) AS var95_e6,
               CAST(percentile_disc(0.01) WITHIN GROUP (ORDER BY r_e6)
                    AS DOUBLE) AS var99_e6
        FROM ms_var_returns GROUP BY sym
        """
    )
    tail = r.join(F.broadcast(v), "sym")
    return (
        tail.groupBy("sym", "n_returns", "var95_e6", "var99_e6")
        .agg(
            (
                F.sum(
                    F.when(F.col("r_e6") <= F.col("var95_e6"), F.col("r_e6"))
                ).cast("double")
                / F.sum(
                    F.when(F.col("r_e6") <= F.col("var95_e6"), 1).otherwise(0)
                )
            ).alias("cvar95_e6")
        )
        .orderBy("sym")
    )


# --- ms_cusum_alarms ---------------------------------------------------


@register(
    "ms_cusum_alarms",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    r AS (
      SELECT sym, ts, tid,
             CAST(floor((price - lag(price) OVER w) / lag(price) OVER w
                        * 1000000) AS BIGINT) AS y
      FROM t WINDOW w AS (PARTITION BY sym ORDER BY ts, tid)
    ), rr AS (SELECT * FROM r WHERE y IS NOT NULL),
    k AS (
      SELECT sym, CAST(floor(CAST(SUM(y) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS drift
      FROM rr GROUP BY sym
    ), p AS (
      SELECT rr.sym, ts, tid,
             SUM(y - drift) OVER (PARTITION BY rr.sym ORDER BY ts, tid
                                  ROWS UNBOUNDED PRECEDING) AS pp
      FROM rr JOIN k ON rr.sym = k.sym
    ), s AS (
      SELECT sym, ts, tid,
             pp - least(CAST(0 AS BIGINT),
                        MIN(pp) OVER (PARTITION BY sym ORDER BY ts, tid
                                      ROWS UNBOUNDED PRECEDING)) AS cusum
      FROM p
    )
    SELECT sym,
           COUNT(*) AS n_points,
           CAST(SUM(CASE WHEN cusum > 500000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms,
           MIN(CASE WHEN cusum > 500000000 THEN epoch_us(ts) END)
             AS first_alarm_us
    FROM s GROUP BY sym ORDER BY sym
    """,
    doc="One-sided CUSUM change detection on the centered return "
    "stream: S_t = max(0, S_(t-1) + y_t - drift) computed WITHOUT a "
    "stateful fold via the drawdown duality S_t = P_t - min(0, "
    "min_(j<=t) P_j) — two running-window passes over the same "
    "(sym, ts, tid) sort, all integer e6 units, drift = the floored "
    "per-symbol mean return. Alarms where S exceeds 5e8 e6-units; "
    "output = alarm count + first alarm time per symbol. Shape: one "
    "keyed shuffle, two frames on one sort, a 5-row drift broadcast "
    "join — the same 100 TB posture as the other tape windows, and "
    "the duality is what makes CUSUM expressible as a plain window "
    "instead of a sequential state machine.",
    tags=("market", "window", "timeseries"),
)
def ms_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = W.partitionBy("sym").orderBy("ts", "tid")
    r = t.select(
        "sym",
        "ts",
        "tid",
        F.floor(
            (F.col("price") - F.lag("price").over(w))
            / F.lag("price").over(w)
            * 1000000
        )
        .cast("bigint")
        .alias("y"),
    ).where(F.col("y").isNotNull())
    k = r.groupBy("sym").agg(
        F.floor(F.sum("y").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("drift")
    )
    wrun = (
        W.partitionBy("sym")
        .orderBy("ts", "tid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = r.join(F.broadcast(k), "sym").select(
        "sym",
        "ts",
        "tid",
        F.sum(F.col("y") - F.col("drift")).over(wrun).alias("pp"),
    )
    s = p.select(
        "sym",
        "ts",
        (
            F.col("pp")
            - F.least(F.lit(0).cast("bigint"), F.min("pp").over(wrun))
        ).alias("cusum"),
    )
    alarm = F.col("cusum") > 500000000
    return (
        s.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.when(alarm, 1).otherwise(0)).cast("bigint").alias("n_alarms"),
            F.min(F.when(alarm, F.unix_micros("ts"))).alias("first_alarm_us"),
        )
        .orderBy("sym")
    )


# --- ms_hayashi_yoshida ---------------------------------------------------

_HY_H_US = 3_600_000_000  # 1-hour interval buckets for the range join



def _hy_returns(spark, sf_dir):
    """Per-sym tick return intervals for symbols 0/1 — the shared
    input of ms_hayashi_yoshida and ms_hy_lead_lag (the lead-lag
    scan's lag-0 slice must equal the base estimator, so there is
    exactly ONE definition of the interval/return construction)."""
    t = _tape(spark, sf_dir).where(F.col("sym").isin(0, 1))
    w = W.partitionBy("sym").orderBy("ts", "tid")
    return t.select(
        "sym",
        "tid",
        F.unix_micros("ts").alias("tu"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_tu"),
        (
            (F.col("price") - F.lag("price").over(w))
            / F.lag("price").over(w)
        ).alias("ret"),
    ).where(F.col("prev_tu").isNotNull())


def _hy_bucketed(df, side):
    """Explode one side's (already possibly lag-shifted) intervals to
    the hour buckets they span; expects tu/prev_tu/tid/ret columns."""
    return df.select(
        *[c for c in df.columns if c not in ("sym", "tid", "tu", "prev_tu", "ret")],
        F.col("tid").alias(f"tid_{side}"),
        F.col("tu").alias(f"tu_{side}"),
        F.col("prev_tu").alias(f"prev_{side}"),
        F.col("ret").alias(f"ret_{side}"),
        F.explode(
            F.sequence(
                F.expr(f"prev_tu div {_HY_H_US}"),
                F.expr(f"tu div {_HY_H_US}"),
            )
        ).alias("bucket"),
    )


@register(
    "ms_hayashi_yoshida",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    r AS (
      SELECT sym, tid,
             epoch_us(ts) AS tu,
             LAG(epoch_us(ts)) OVER w AS prev_tu,
             (price - LAG(price) OVER w) / LAG(price) OVER w AS ret
      FROM t WHERE sym IN (0, 1)
      WINDOW w AS (PARTITION BY sym ORDER BY ts, tid)
    ), ra AS (
      SELECT tid, tu, prev_tu, ret FROM r
      WHERE sym = 0 AND prev_tu IS NOT NULL
    ), rb AS (
      SELECT tid, tu, prev_tu, ret FROM r
      WHERE sym = 1 AND prev_tu IS NOT NULL
    ), pairs AS (
      SELECT ra.ret AS reta, rb.ret AS retb
      FROM ra JOIN rb
        ON ra.prev_tu < rb.tu AND rb.prev_tu < ra.tu
    )
    SELECT CAST(0 AS INT) AS sym_a, CAST(1 AS INT) AS sym_b,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(floor(reta * retb * 1000000) AS BIGINT))
                AS BIGINT) AS sum_e6,
           CAST(SUM(CAST(floor(reta * retb * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 AS hy_cov
    FROM pairs
    """,
    doc="Hayashi-Yoshida cross-covariance between two ASYNCHRONOUSLY "
    "trading symbols (the estimator that needs no resampling grid: "
    "sum of return products over OVERLAPPING tick intervals "
    "(t_{{i-1}}, t_i] x (s_{{j-1}}, s_j], the unbiased answer to the "
    "Epps effect). Products are floored to e6 integer units before "
    "the SUM (order-free, exact across engines; the raw count and "
    "integer sum are emitted alongside the derived double). The "
    "interval-overlap join is the scale story: this engine explodes "
    "each return interval to the hour buckets it spans and "
    "equi-joins on the bucket with the overlap predicate as a "
    "residual (the join_interval_bucketed pattern — at 100 TB the "
    "pairing is bucket-local, never a cross of the two tapes; pairs "
    "spanning several shared buckets dedupe by tick-id pair), while "
    "the oracle states the textbook range join directly — same "
    "result by bucket-cover completeness.",
    tags=("market", "join", "stats", "scale-note:interval-bucketed"),
)
def ms_hayashi_yoshida(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _hy_returns(spark, sf_dir)
    a = _hy_bucketed(r.where(F.col("sym") == 0), "a")
    b = _hy_bucketed(r.where(F.col("sym") == 1), "b")
    pairs = (
        a.join(b, "bucket")
        .where(
            (F.col("prev_a") < F.col("tu_b"))
            & (F.col("prev_b") < F.col("tu_a"))
        )
        .select("tid_a", "tid_b", "ret_a", "ret_b")
        .distinct()  # a pair may share several buckets
    )
    e6 = F.floor(F.col("ret_a") * F.col("ret_b") * 1_000_000).cast("bigint")
    return pairs.agg(
        F.lit(0).cast("int").alias("sym_a"),
        F.lit(1).cast("int").alias("sym_b"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(e6).cast("bigint").alias("sum_e6"),
        (F.sum(e6).cast("double") / 1_000_000).alias("hy_cov"),
    )


# --- ms_hy_lead_lag --------------------------------------------------------

_HY_LAGS_US = [-600_000_000, 0, 600_000_000]  # -10min, 0, +10min


@register(
    "ms_hy_lead_lag",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    r AS (
      SELECT sym, tid,
             epoch_us(ts) AS tu,
             LAG(epoch_us(ts)) OVER w AS prev_tu,
             (price - LAG(price) OVER w) / LAG(price) OVER w AS ret
      FROM t WHERE sym IN (0, 1)
      WINDOW w AS (PARTITION BY sym ORDER BY ts, tid)
    ), ra AS (
      SELECT tu, prev_tu, ret FROM r
      WHERE sym = 0 AND prev_tu IS NOT NULL
    ), rb AS (
      SELECT tu, prev_tu, ret FROM r
      WHERE sym = 1 AND prev_tu IS NOT NULL
    ), lags(lag_us) AS (
      VALUES {", ".join(f"({u})" for u in _HY_LAGS_US)}
    ), pairs AS (
      SELECT l.lag_us, ra.ret AS reta, rb.ret AS retb
      FROM lags l, ra
      JOIN rb ON ra.prev_tu < rb.tu + l.lag_us
             AND rb.prev_tu + l.lag_us < ra.tu
    )
    SELECT CAST(lag_us // 1000000 AS BIGINT) AS lag_sec,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(floor(reta * retb * 1000000) AS BIGINT))
                AS BIGINT) AS sum_e6,
           CAST(SUM(CAST(floor(reta * retb * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 AS hy_cov
    FROM pairs
    GROUP BY lag_us ORDER BY lag_sec
    """,
    doc="Hayashi-Yoshida LEAD-LAG scan (the Hoffmann-Rosenbaum-"
    "Yoshida construction): the HY cross-covariance of symbols 0 and "
    "1 recomputed with symbol 1's tick intervals time-shifted by "
    "-10min/0/+10min — the lag whose covariance dominates tells which "
    "symbol leads. Same exactness and scale shape as "
    "ms_hayashi_yoshida: e6-floored integer product sums, and the "
    "shifted pairing still explodes intervals to hour buckets and "
    "equi-joins on (lag, bucket) with the shifted overlap predicate "
    "as a residual — the lag grid multiplies work by |lags|, never "
    "by data size, and pairs spanning shared buckets dedupe by "
    "(lag, tick-id pair).",
    tags=("market", "join", "stats", "scale-note:interval-bucketed"),
)
def ms_hy_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _hy_returns(spark, sf_dir)
    lags = spark.createDataFrame(
        [(u,) for u in _HY_LAGS_US], "lag_us bigint"
    )
    a = _hy_bucketed(r.where(F.col("sym") == 0), "a")
    # shift B's intervals by each lag BEFORE bucketing so the bucket
    # cover matches the shifted overlap predicate
    b_shift = (
        r.where(F.col("sym") == 1)
        .crossJoin(F.broadcast(lags))
        .select(
            "lag_us",
            "tid",
            (F.col("tu") + F.col("lag_us")).alias("tu"),
            (F.col("prev_tu") + F.col("lag_us")).alias("prev_tu"),
            "ret",
        )
    )
    b = _hy_bucketed(b_shift, "b")
    pairs = (
        a.join(b, "bucket")
        .where(
            (F.col("prev_a") < F.col("tu_b"))
            & (F.col("prev_b") < F.col("tu_a"))
        )
        .select("lag_us", "tid_a", "tid_b", "ret_a", "ret_b")
        .distinct()
    )
    e6 = F.floor(F.col("ret_a") * F.col("ret_b") * 1_000_000).cast("bigint")
    return (
        pairs.groupBy(
            F.expr("lag_us div 1000000").cast("bigint").alias("lag_sec")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(e6).cast("bigint").alias("sum_e6"),
            (F.sum(e6).cast("double") / 1_000_000).alias("hy_cov"),
        )
        .orderBy("lag_sec")
    )


# --- ms_epps_effect --------------------------------------------------------

_EPPS_GRIDS_S = [600, 3600, 21600]  # 10min / 1h / 6h sampling grids


@register(
    "ms_epps_effect",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    ticks AS (
      SELECT sym, tid, epoch_us(ts) AS tu, price
      FROM t WHERE sym IN (0, 1)
    ), grids(grid_s) AS (
      VALUES {", ".join(f"(CAST({g} AS BIGINT))" for g in _EPPS_GRIDS_S)}
    ), px AS (
      SELECT g.grid_s, sym, tu // (g.grid_s * 1000000) AS bucket,
             last(price ORDER BY tu, tid) AS p
      FROM ticks, grids g
      GROUP BY g.grid_s, sym, tu // (g.grid_s * 1000000)
    ), joint AS (
      SELECT a.grid_s, a.bucket, a.p AS pa, b.p AS pb
      FROM px a JOIN px b
        ON a.grid_s = b.grid_s AND a.bucket = b.bucket
       AND a.sym = 0 AND b.sym = 1
    ), rets AS (
      SELECT grid_s,
             (pa - LAG(pa) OVER w) / LAG(pa) OVER w AS rx,
             (pb - LAG(pb) OVER w) / LAG(pb) OVER w AS ry
      FROM joint WINDOW w AS (PARTITION BY grid_s ORDER BY bucket)
    ), s AS (
      SELECT grid_s, COUNT(*) AS n,
             CAST(SUM(CAST(floor(rx * 1000000) AS BIGINT)) AS BIGINT) AS sx,
             CAST(SUM(CAST(floor(ry * 1000000) AS BIGINT)) AS BIGINT) AS sy,
             CAST(SUM(CAST(floor(rx * ry * 1000000) AS BIGINT)) AS BIGINT)
               AS sxy,
             CAST(SUM(CAST(floor(rx * rx * 1000000) AS BIGINT)) AS BIGINT)
               AS sxx,
             CAST(SUM(CAST(floor(ry * ry * 1000000) AS BIGINT)) AS BIGINT)
               AS syy
      FROM rets WHERE rx IS NOT NULL GROUP BY grid_s
    )
    SELECT grid_s AS grid_sec, n, sx, sy, sxy, sxx, syy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy / 1000000)
             / sqrt((CAST(n AS DOUBLE) * sxx
                     - CAST(sx AS DOUBLE) * sx / 1000000)
                    * (CAST(n AS DOUBLE) * syy
                       - CAST(sy AS DOUBLE) * sy / 1000000)) AS corr
    FROM s ORDER BY grid_sec
    """,
    doc="The Epps effect, measured: realized correlation of the two "
    "symbols' co-sampled grid returns at 10min/1h/6h sampling — the "
    "correlation that decays as the grid tightens on asynchronous "
    "ticks, i.e. the bias ms_hayashi_yoshida exists to avoid. Last "
    "price per (grid, sym, bucket) via a lexicographic (tu, tid) "
    "max-struct (Spark) == last(ORDER BY tu, tid) (DuckDB); returns "
    "on the JOINT bucket series; five exact e6-integer sufficient "
    "sums per grid (emitted, so the hash pins the exact partials) "
    "and Pearson correlation as one fixed double expression over "
    "them. Shape: the heavy pass is ONE (sym, fine-bucket) aggregate "
    "over a single tick scan — the grids NEST, so coarser bars are "
    "exact max-struct rollups of the fine bars (the "
    "agg_multires_rollup pattern) — and everything after is "
    "grid-bucket-DIMENSION-sized (the per-grid return window runs "
    "on bars, never ticks).",
    tags=("market", "stats", "agg", "scale-note:sufficient-statistics"),
)
def ms_epps_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir).where(F.col("sym").isin(0, 1))
    # the grids NEST (600 | 3600 | 21600), so the tape is scanned ONCE
    # at the finest grid and the coarser last-price bars are exact
    # max-struct ROLLUPS of the fine bars (max over (tu, tid, price)
    # structs is associative, and tu div (g*1e6) composes as integer
    # division) — the agg_multires_rollup pattern; a per-grid
    # crossJoin would re-scan the ticks |grids| times
    fine = (
        t.select("sym", "tid", F.unix_micros("ts").alias("tu"), "price")
        .groupBy(
            "sym",
            F.expr(f"tu div ({_EPPS_GRIDS_S[0]} * 1000000)").alias("bucket"),
        )
        .agg(F.max(F.struct("tu", "tid", "price")).alias("s"))
    )
    levels = [fine]
    for prev_g, g in zip(_EPPS_GRIDS_S, _EPPS_GRIDS_S[1:]):
        step = g // prev_g
        levels.append(
            levels[-1]
            .groupBy(
                "sym", F.expr(f"bucket div {step}").alias("bucket")
            )
            .agg(F.max("s").alias("s"))
        )
    px = None
    for g, lvl in zip(_EPPS_GRIDS_S, levels):
        part = lvl.select(
            F.lit(g).cast("bigint").alias("grid_s"),
            "sym",
            "bucket",
            F.col("s")["price"].alias("p"),
        )
        px = part if px is None else px.unionByName(part)
    a = px.where(F.col("sym") == 0).select(
        "grid_s", "bucket", F.col("p").alias("pa")
    )
    b = px.where(F.col("sym") == 1).select(
        "grid_s", "bucket", F.col("p").alias("pb")
    )
    joint = a.join(b, ["grid_s", "bucket"])
    w = W.partitionBy("grid_s").orderBy("bucket")
    rets = joint.select(
        "grid_s",
        ((F.col("pa") - F.lag("pa").over(w)) / F.lag("pa").over(w)).alias(
            "rx"
        ),
        ((F.col("pb") - F.lag("pb").over(w)) / F.lag("pb").over(w)).alias(
            "ry"
        ),
    ).where(F.col("rx").isNotNull())
    e6 = lambda c: F.floor(c * 1_000_000).cast("bigint")  # noqa: E731
    s = rets.groupBy("grid_s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(e6(F.col("rx"))).cast("bigint").alias("sx"),
        F.sum(e6(F.col("ry"))).cast("bigint").alias("sy"),
        F.sum(e6(F.col("rx") * F.col("ry"))).cast("bigint").alias("sxy"),
        F.sum(e6(F.col("rx") * F.col("rx"))).cast("bigint").alias("sxx"),
        F.sum(e6(F.col("ry") * F.col("ry"))).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    corr = (
        nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / 1e6
    ) / F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / 1e6)
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy") / 1e6)
    )
    return s.select(
        F.col("grid_s").alias("grid_sec"),
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        corr.alias("corr"),
    ).orderBy("grid_sec")
