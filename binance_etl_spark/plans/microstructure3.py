"""Order-flow toxicity and regime analytics over the deterministic
tape (microstructure.py::_TAPE_SQL — the analysis layer the
reference's trade CSVs exist to feed, reference README.md:70-84).

- ms_vpin: Volume-Synchronized Probability of INformed trading
  (Easley, Lopez de Prado, O'Hara 2012): slice each symbol's tape
  into equal-VOLUME buckets, measure |buy volume - sell volume| per
  bucket, and report the volume-weighted average imbalance — the
  flash-crash early-warning metric. Exact integers end to end: qty is
  BIGINT, bucket assignment is floor(cum_vol_before / V), imbalance
  and totals are integer sums, and the headline ratio is an integer
  ppm DIV — no float enters the hash.

Scale shape: ONE exchange keyed on sym (the cumulative-volume window),
then a map-side-combinable (sym, bucket) aggregate and a tiny per-sym
rollup. Buckets compress the tape ~V-fold before any cross-bucket
math; nothing data-sized crosses the network twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from binance_etl_spark.plans.microstructure import _TAPE_SQL, _tape
from binance_etl_spark.plans.registry import register

_VPIN_V = 400  # volume-bucket size (units of qty) — ~50 trades/bucket


@register(
    "ms_vpin",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    c AS (
      SELECT sym, qty, side,
             COALESCE(SUM(qty) OVER (
               PARTITION BY sym ORDER BY ts, tid
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM t
    ), b AS (
      SELECT sym, CAST(cum_before // {_VPIN_V} AS BIGINT) AS bucket,
             SUM(CASE WHEN side = 1 THEN qty ELSE 0 END) AS buy_vol,
             SUM(CASE WHEN side = -1 THEN qty ELSE 0 END) AS sell_vol,
             SUM(qty) AS vol
      FROM c GROUP BY sym, CAST(cum_before // {_VPIN_V} AS BIGINT)
    )
    SELECT sym,
           COUNT(*) AS n_buckets,
           CAST(SUM(vol) AS BIGINT) AS total_vol,
           CAST(SUM(abs(buy_vol - sell_vol)) AS BIGINT) AS total_imbalance,
           CAST((1000000 * SUM(abs(buy_vol - sell_vol))) // SUM(vol)
                AS BIGINT) AS vpin_ppm
    FROM b GROUP BY sym ORDER BY sym
    """,
    doc="VPIN order-flow toxicity (Easley/Lopez de Prado/O'Hara 2012): "
    "equal-VOLUME buckets per symbol (trade assigned by cumulative "
    "volume BEFORE it — the standard whole-trade approximation), "
    "per-bucket |buy-sell| imbalance, and the volume-weighted average "
    "as integer ppm. All-integer arithmetic (BIGINT qty, floor DIV "
    "bucketing, ppm DIV) so the hash is engine-exact. Plan: one "
    "sym-keyed window exchange for the running volume, then two "
    "combinable aggregates — buckets compress the tape ~400x before "
    "any cross-bucket math.",
    tags=("microstructure", "window", "agg"),
)
def ms_vpin(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = (
        W.partitionBy("sym")
        .orderBy("ts", "tid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = t.select(
        "sym",
        "qty",
        "side",
        F.coalesce(F.sum("qty").over(w), F.lit(0)).alias("cum_before"),
    )
    b = (
        c.withColumn(
            "bucket",
            F.expr(f"cum_before DIV {_VPIN_V}").cast("bigint"),
        )
        .groupBy("sym", "bucket")
        .agg(
            F.sum(F.when(F.col("side") == 1, F.col("qty")).otherwise(0)).alias(
                "buy_vol"
            ),
            F.sum(
                F.when(F.col("side") == -1, F.col("qty")).otherwise(0)
            ).alias("sell_vol"),
            F.sum("qty").alias("vol"),
        )
    )
    return (
        b.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("vol").cast("bigint").alias("total_vol"),
            F.sum(F.abs(F.col("buy_vol") - F.col("sell_vol")))
            .cast("bigint")
            .alias("total_imbalance"),
            F.expr(
                "CAST((1000000 * SUM(abs(buy_vol - sell_vol))) DIV SUM(vol) "
                "AS BIGINT)"
            ).alias("vpin_ppm"),
        )
        .orderBy("sym")
    )


# --- ms_sign_runs_test ---------------------------------------------------

# Wald-Wolfowitz z from exact integer counts — identical text on both
# engines (divisions + one sqrt, both IEEE-correctly-rounded).
# NOTE: double literals are written 2e0/1e0 — Spark parses a bare 2.0
# as DECIMAL and silently evaluates the whole term in decimal
# arithmetic (found by a 1e-9 z drift vs DuckDB); scientific notation
# is DOUBLE in both parsers.
_RUNS_Z = """
    (CAST(runs AS DOUBLE)
     - (2e0 * np * nm / (np + nm) + 1e0))
    / sqrt(
        (2e0 * np * nm) * (2e0 * np * nm - np - nm)
        / ((CAST(np AS DOUBLE) + nm) * (CAST(np AS DOUBLE) + nm)
           * (CAST(np AS DOUBLE) + nm - 1e0))
    )
"""


@register(
    "ms_sign_runs_test",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    s AS (
      SELECT sym, side,
             lag(side) OVER (PARTITION BY sym ORDER BY ts, tid) AS pside
      FROM t
    ), c AS (
      SELECT sym,
             SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS np,
             SUM(CASE WHEN side = -1 THEN 1 ELSE 0 END) AS nm,
             1 + SUM(CASE WHEN pside IS NOT NULL AND side <> pside
                          THEN 1 ELSE 0 END) AS runs
      FROM s GROUP BY sym
    )
    SELECT sym, CAST(np AS BIGINT) AS n_plus, CAST(nm AS BIGINT) AS n_minus,
           CAST(runs AS BIGINT) AS runs,
           CAST({_RUNS_Z} AS DOUBLE) AS z
    FROM c ORDER BY sym
    """,
    doc="Wald-Wolfowitz runs test on the trade-sign sequence per "
    "symbol — the classic randomness screen for order-flow clustering "
    "(too few runs = momentum/herding, too many = bid-ask bounce; the "
    "distributional companion to ms_tick_rule_autocorr's lag-1 "
    "covariance). Run count is one lag window + a combinable "
    "conditional sum over exact integers; the z statistic derives "
    "from (n+, n-, R) via one shared-text tree (divisions + sqrt "
    "only). 100 TB shape: one sym-keyed window exchange, 5-row "
    "output.",
    tags=("microstructure", "stats", "window"),
)
def ms_sign_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = W.partitionBy("sym").orderBy("ts", "tid")
    s = t.select("sym", "side", F.lag("side").over(w).alias("pside"))
    c = s.groupBy("sym").agg(
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("side") == -1, 1).otherwise(0)).alias("nm"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("pside").isNotNull()
                    & (F.col("side") != F.col("pside")),
                    1,
                ).otherwise(0)
            )
        ).alias("runs"),
    )
    return c.select(
        "sym",
        F.col("np").cast("bigint").alias("n_plus"),
        F.col("nm").cast("bigint").alias("n_minus"),
        F.col("runs").cast("bigint").alias("runs"),
        F.expr(_RUNS_Z).cast("double").alias("z"),
    ).orderBy("sym")


# --- ms_volume_profile ---------------------------------------------------


@register(
    "ms_volume_profile",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    prof AS (
      SELECT sym, CAST(floor(price) AS BIGINT) AS pb, SUM(qty) AS vol
      FROM t GROUP BY sym, CAST(floor(price) AS BIGINT)
    ), ranked AS (
      SELECT sym, pb, vol,
             ROW_NUMBER() OVER (PARTITION BY sym
                                ORDER BY vol DESC, pb) AS rnk,
             SUM(vol) OVER (PARTITION BY sym
                            ORDER BY vol DESC, pb
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             SUM(vol) OVER (PARTITION BY sym) AS total
      FROM prof
    )
    SELECT sym,
           COUNT(*) AS n_buckets,
           CAST(MAX(total) AS BIGINT) AS total_vol,
           CAST(MAX(CASE WHEN rnk = 1 THEN pb END) AS BIGINT) AS poc_price,
           CAST(MAX(CASE WHEN rnk = 1 THEN vol END) AS BIGINT) AS poc_vol,
           CAST(SUM(CASE WHEN (cum - vol) * 10 < total * 7
                         THEN 1 ELSE 0 END) AS BIGINT) AS va_buckets,
           CAST(SUM(CASE WHEN (cum - vol) * 10 < total * 7
                         THEN vol ELSE 0 END) AS BIGINT) AS va_vol
    FROM ranked GROUP BY sym ORDER BY sym
    """,
    doc="Volume profile per symbol: integer price buckets, the POC "
    "(point of control — the highest-volume bucket, ties to the "
    "lower price), and the 70% VALUE AREA taken greedily by volume "
    "rank (buckets admitted while the volume before them is under "
    "70% of total — the inclusion test is the integer cross-product "
    "(cum-vol)*10 < total*7, so no division enters the hash). The "
    "market-profile primitive execution desks draw. 100 TB shape: "
    "one combinable (sym, bucket) aggregate compresses the tape, "
    "then ranking windows run over buckets only (price-range-bounded, "
    "not data-sized).",
    tags=("microstructure", "window", "agg"),
)
def ms_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    prof = (
        t.select("sym", F.floor("price").cast("bigint").alias("pb"), "qty")
        .groupBy("sym", "pb")
        .agg(F.sum("qty").alias("vol"))
    )
    wv = W.partitionBy("sym").orderBy(F.desc("vol"), "pb")
    ranked = prof.select(
        "sym",
        "pb",
        "vol",
        F.row_number().over(wv).alias("rnk"),
        F.sum("vol")
        .over(wv.rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("vol").over(W.partitionBy("sym")).alias("total"),
    )
    inva = (F.col("cum") - F.col("vol")) * 10 < F.col("total") * 7
    return (
        ranked.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("total").cast("bigint").alias("total_vol"),
            F.max(F.when(F.col("rnk") == 1, F.col("pb")))
            .cast("bigint")
            .alias("poc_price"),
            F.max(F.when(F.col("rnk") == 1, F.col("vol")))
            .cast("bigint")
            .alias("poc_vol"),
            F.sum(F.when(inva, 1).otherwise(0))
            .cast("bigint")
            .alias("va_buckets"),
            F.sum(F.when(inva, F.col("vol")).otherwise(0))
            .cast("bigint")
            .alias("va_vol"),
        )
        .orderBy("sym")
    )


# --- ms_acf_grid ---------------------------------------------------------

_ACF_LAGS = (1, 2, 4, 8)

# lag-k sample autocorrelation from exact integer pair sums — the
# standard estimator with per-lag pair means, one shared-text tree
_ACF_DERIVE = """
    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
    / sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
"""


def _acf_lag_sql(k: int) -> str:
    return f"""
      SELECT sym, {k} AS lag, COUNT(*) AS n,
             SUM(p) AS sx, SUM(pk) AS sy,
             SUM(p * pk) AS sxy, SUM(p * p) AS sxx, SUM(pk * pk) AS syy
      FROM (
        SELECT sym, p,
               lead(p, {k}) OVER (PARTITION BY sym ORDER BY ts, tid) AS pk
        FROM tape_e2
      ) WHERE pk IS NOT NULL
      GROUP BY sym"""


@register(
    "ms_acf_grid",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    tape_e2 AS (
      SELECT sym, ts, tid, CAST(floor(price * 100) AS BIGINT) AS p
      FROM t
    ), lags AS (
      {" UNION ALL ".join(_acf_lag_sql(k) for k in _ACF_LAGS)}
    )
    SELECT sym, lag, CAST(n AS BIGINT) AS n,
           CAST({_ACF_DERIVE} AS DOUBLE) AS acf
    FROM lags ORDER BY sym, lag
    """,
    doc="Price autocorrelation grid at lags 1/2/4/8 per symbol — the "
    "mean-reversion/momentum fingerprint across horizons (lag-1 "
    "negative = bid-ask bounce, slow decay = momentum; the "
    "multi-horizon companion to ms_tick_rule_autocorr's sign "
    "covariance). Each lag is one lead() over the SAME sym-keyed sort "
    "(all four ride one window exchange) into exact floor-e2 integer "
    "pair sums; the correlation derives per (sym, lag) via one "
    "shared-text tree (two sqrts). 100 TB shape: one keyed exchange, "
    "|lags| combinable aggregates, 20-row output.",
    tags=("microstructure", "window", "stats"),
)
def ms_acf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    tape = t.select(
        "sym",
        "ts",
        "tid",
        F.floor(F.col("price") * 100).cast("bigint").alias("p"),
    )
    w = W.partitionBy("sym").orderBy("ts", "tid")
    # ALL four leads in one projection, all four lags' sums in ONE
    # combinable aggregate (FILTER-style conditional sums), then an
    # unpivot to (sym, lag) rows — the union-of-four-aggregates shape
    # re-ran the window exchange per lag (plan-audited: 4 exchanges
    # -> 1 here, pinned in tests/test_plan_pins.py)
    x = tape.select(
        "sym",
        "p",
        *[F.lead("p", k).over(w).alias(f"p{k}") for k in _ACF_LAGS],
    )
    aggs = []
    for k in _ACF_LAGS:
        nn = F.col(f"p{k}").isNotNull()
        aggs += [
            F.sum(F.when(nn, 1).otherwise(0)).alias(f"n_{k}"),
            F.sum(F.when(nn, F.col("p"))).alias(f"sx_{k}"),
            F.sum(F.when(nn, F.col(f"p{k}"))).alias(f"sy_{k}"),
            F.sum(F.when(nn, F.expr(f"p * p{k}"))).alias(f"sxy_{k}"),
            F.sum(F.when(nn, F.expr("p * p"))).alias(f"sxx_{k}"),
            F.sum(F.when(nn, F.expr(f"p{k} * p{k}"))).alias(f"syy_{k}"),
        ]
    wide = x.groupBy("sym").agg(*aggs)
    stack = ", ".join(
        f"{k}, n_{k}, sx_{k}, sy_{k}, sxy_{k}, sxx_{k}, syy_{k}"
        for k in _ACF_LAGS
    )
    tall = wide.selectExpr(
        "sym",
        f"stack({len(_ACF_LAGS)}, {stack}) AS (lag, n, sx, sy, sxy, sxx, syy)",
    )
    return tall.select(
        "sym",
        "lag",
        F.col("n").cast("bigint").alias("n"),
        F.expr(_ACF_DERIVE).cast("double").alias("acf"),
    ).orderBy("sym", "lag")


# --- ms_lee_ready ----------------------------------------------------------

# last non-zero price-change direction (the tick-rule memory): a CASE
# that nulls zero-changes, then last_value IGNORE NULLS over the
# running frame — identical semantics both engines.
_LR_CH0 = "CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END"


@register(
    "ms_lee_ready",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    px AS (
      SELECT sym, side, CAST(floor(price * 100) AS BIGINT) AS p,
             lag(CAST(floor(price * 100) AS BIGINT)) OVER
               (PARTITION BY sym ORDER BY ts, tid) AS m,
             lead(CAST(floor(price * 100) AS BIGINT), 5) OVER
               (PARTITION BY sym ORDER BY ts, tid) AS m5,
             ts, tid
      FROM t
    ), ch AS (
      SELECT *, p - m AS d FROM px
    ), cls AS (
      SELECT sym, side, p, m, m5, d,
             CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1
                  ELSE last_value({_LR_CH0} IGNORE NULLS) OVER
                         (PARTITION BY sym ORDER BY ts, tid
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             END AS q
      FROM ch
    ), ok AS (
      SELECT * FROM cls WHERE m IS NOT NULL AND q IS NOT NULL
    )
    SELECT sym,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN q = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_buy,
           CAST(SUM(CASE WHEN q = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sell,
           CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tick,
           CAST(SUM(2 * q * (p - m)) AS BIGINT) AS es2_sum,
           CAST(SUM(CASE WHEN m5 IS NOT NULL
                         THEN 2 * q * (p - m5) ELSE 0 END) AS BIGINT)
             AS rs2_sum,
           CAST(SUM(CASE WHEN m5 IS NOT NULL
                         THEN 2 * q * (m5 - m) ELSE 0 END) AS BIGINT)
             AS pi2_sum,
           CAST(SUM(CASE WHEN m5 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_h,
           CAST(CAST(SUM(2 * q * (p - m)) AS DOUBLE) / 200 / COUNT(*)
                AS DOUBLE) AS es_mean,
           CAST((1000000 * SUM(CASE WHEN q = side THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS accuracy_ppm
    FROM ok GROUP BY sym ORDER BY sym
    """,
    doc="Lee-Ready trade classification + spread decomposition per "
    "symbol (Lee & Ready 1991): infer each trade's aggressor side "
    "from the prevailing quote midpoint (quote rule: above mid = buy, "
    "below = sell; AT the mid fall back to the tick rule's last "
    "non-zero price-change direction, carried by last_value IGNORE "
    "NULLS). On this tape the prevailing mid IS the prior event's "
    "price (the quote tape's bid/ask are symmetric around value — "
    "microstructure.py:_QUOTES_SQL), so the asof collapses to lag() "
    "on ONE sym-keyed exchange — the right 100 TB shape: zero joins. "
    "Effective spread 2q(p-mid), realized spread 2q(p-mid+5) at a "
    "5-trade horizon, price impact = their difference (Glosten-"
    "Harris decomposition), all exact e2-integer half-spread units; "
    "classification accuracy vs the tape's TRUE side in integer ppm "
    "(the Lee-Ready validation experiment).",
    tags=("microstructure", "window"),
)
def ms_lee_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = W.partitionBy("sym").orderBy("ts", "tid")
    p = F.floor(F.col("price") * 100).cast("bigint")
    px = t.select(
        "sym",
        "side",
        "ts",
        "tid",
        p.alias("p"),
        F.lag(p).over(w).alias("m"),
        F.lead(p, 5).over(w).alias("m5"),
    )
    ch = px.withColumn("d", F.col("p") - F.col("m"))
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    cls = ch.withColumn(
        "q",
        F.when(F.col("d") > 0, 1)
        .when(F.col("d") < 0, -1)
        .otherwise(F.last(F.expr(_LR_CH0), ignorenulls=True).over(run)),
    )
    ok = cls.where(F.col("m").isNotNull() & F.col("q").isNotNull())
    has5 = F.col("m5").isNotNull()
    es2 = 2 * F.col("q") * (F.col("p") - F.col("m"))
    return (
        ok.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("q") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_buy"),
            F.sum(F.when(F.col("q") == -1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sell"),
            F.sum(F.when(F.col("d") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_tick"),
            F.sum(es2).cast("bigint").alias("es2_sum"),
            F.sum(
                F.when(has5, 2 * F.col("q") * (F.col("p") - F.col("m5")))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("rs2_sum"),
            F.sum(
                F.when(has5, 2 * F.col("q") * (F.col("m5") - F.col("m")))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("pi2_sum"),
            F.sum(F.when(has5, 1).otherwise(0)).cast("bigint").alias("n_h"),
            F.expr(
                "CAST(CAST(SUM(2 * q * (p - m)) AS DOUBLE) / 200 / COUNT(*) "
                "AS DOUBLE)"
            ).alias("es_mean"),
            F.expr(
                "CAST((1000000 * SUM(CASE WHEN q = side THEN 1 ELSE 0 END)) "
                "DIV COUNT(*) AS BIGINT)"
            ).alias("accuracy_ppm"),
        )
        .orderBy("sym")
    )


# --- ms_obv_adline ---------------------------------------------------------


@register(
    "ms_obv_adline",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    ranked AS (
      SELECT sym, date_trunc('hour', ts) AS bar, qty,
             CAST(floor(price * 100) AS BIGINT) AS p,
             row_number() OVER (PARTITION BY sym, date_trunc('hour', ts)
                                ORDER BY ts DESC, tid DESC) AS rn_close
      FROM t
    ), bars AS (
      SELECT sym, bar,
             MAX(CASE WHEN rn_close = 1 THEN p END) AS c,
             MAX(p) AS h, MIN(p) AS l,
             SUM(qty) AS vol
      FROM ranked GROUP BY sym, bar
    ), chg AS (
      SELECT sym, bar, c, h, l, vol,
             c - lag(c) OVER (PARTITION BY sym ORDER BY bar) AS dc,
             CASE WHEN h = l THEN 0
                  ELSE ((2 * c - l - h) * 1000000) // (h - l) END
               AS clv_ppm
      FROM bars
    ), cum AS (
      SELECT sym, bar, vol,
             SUM(CASE WHEN dc > 0 THEN vol
                      WHEN dc < 0 THEN -vol ELSE 0 END)
               OVER (PARTITION BY sym ORDER BY bar
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS obv,
             SUM(clv_ppm * vol)
               OVER (PARTITION BY sym ORDER BY bar
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS adl_ppm,
             row_number() OVER (PARTITION BY sym ORDER BY bar DESC) AS rn
      FROM chg
    )
    SELECT sym, epoch_us(bar) AS bar_us,
           CAST(vol AS BIGINT) AS vol,
           CAST(obv AS BIGINT) AS obv,
           CAST(adl_ppm AS BIGINT) AS adl_ppm
    FROM cum WHERE rn <= 3 ORDER BY sym, bar_us
    """,
    doc="On-balance volume + accumulation/distribution line on hourly "
    "bars per symbol (Granville OBV: cumulative signed bar volume by "
    "close-to-close direction; Chaikin A/D: cumulative close-location "
    "value x volume) — the two classic volume-flow confirmations, "
    "reported at the last 3 bars. CLV is an exact integer ppm DIV "
    "(flat bars contribute 0), OBV/ADL are integer running sums, so "
    "the hash is engine-exact. 100 TB shape: the tape compresses "
    "~bar-size-fold in ONE combinable (sym, bar) aggregate before any "
    "window; the cumsums run over bars only (time-bounded, not "
    "data-sized), on one sym-keyed exchange.",
    tags=("microstructure", "window", "agg"),
)
def ms_obv_adline(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    p = F.floor(F.col("price") * 100).cast("bigint")
    ranked = t.select(
        "sym",
        F.date_trunc("hour", "ts").alias("bar"),
        "qty",
        p.alias("p"),
        F.row_number()
        .over(
            W.partitionBy("sym", F.date_trunc("hour", "ts")).orderBy(
                F.col("ts").desc(), F.col("tid").desc()
            )
        )
        .alias("rn_close"),
    )
    bars = ranked.groupBy("sym", "bar").agg(
        F.max(F.when(F.col("rn_close") == 1, F.col("p"))).alias("c"),
        F.max("p").alias("h"),
        F.min("p").alias("l"),
        F.sum("qty").alias("vol"),
    )
    wb = W.partitionBy("sym").orderBy("bar")
    chg = bars.select(
        "sym",
        "bar",
        "c",
        "h",
        "l",
        "vol",
        (F.col("c") - F.lag("c").over(wb)).alias("dc"),
        F.expr(
            "CASE WHEN h = l THEN 0"
            " ELSE ((2 * c - l - h) * 1000000) DIV (h - l) END"
        ).alias("clv_ppm"),
    )
    run = wb.rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = chg.select(
        "sym",
        "bar",
        "vol",
        F.sum(
            F.when(F.col("dc") > 0, F.col("vol"))
            .when(F.col("dc") < 0, -F.col("vol"))
            .otherwise(0)
        )
        .over(run)
        .alias("obv"),
        F.sum(F.col("clv_ppm") * F.col("vol")).over(run).alias("adl_ppm"),
        F.row_number()
        .over(W.partitionBy("sym").orderBy(F.col("bar").desc()))
        .alias("rn"),
    )
    return (
        cum.where(F.col("rn") <= 3)
        .select(
            "sym",
            F.unix_micros("bar").alias("bar_us"),
            F.col("vol").cast("bigint").alias("vol"),
            F.col("obv").cast("bigint").alias("obv"),
            F.col("adl_ppm").cast("bigint").alias("adl_ppm"),
        )
        .orderBy("sym", "bar_us")
    )


# --- ms_intraday_seasonality -----------------------------------------------


@register(
    "ms_intraday_seasonality",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    x AS (
      SELECT sym, CAST(hour(ts) AS INT) AS hod, qty,
             abs(CAST(floor(price * 100) AS BIGINT)
                 - lag(CAST(floor(price * 100) AS BIGINT)) OVER
                     (PARTITION BY sym ORDER BY ts, tid)) AS adp
      FROM t
    ), h AS (
      SELECT sym, hod, COUNT(*) AS n_trades,
             SUM(qty) AS vol,
             SUM(COALESCE(adp, 0)) AS abs_dp_e2
      FROM x GROUP BY sym, hod
    ), tot AS (
      SELECT sym, SUM(vol) AS tvol FROM h GROUP BY sym
    )
    SELECT h.sym, h.hod,
           CAST(h.n_trades AS BIGINT) AS n_trades,
           CAST(h.vol AS BIGINT) AS vol,
           CAST((1000000 * h.vol) // t.tvol AS BIGINT) AS vol_share_ppm,
           CAST(h.abs_dp_e2 AS BIGINT) AS abs_dp_e2
    FROM h JOIN tot t ON t.sym = h.sym
    ORDER BY h.sym, h.hod
    """,
    doc="Intraday seasonality profile per symbol: trade count, volume, "
    "volume share (integer ppm), and total absolute e2 price movement "
    "by hour of day — the U-shape screen behind volume-curve "
    "execution schedules (VWAP slicing allocates by exactly this "
    "profile). |dp| rides the same sym-keyed window exchange as the "
    "other tape ops; the hour-of-day rollup is one combinable "
    "aggregate and the share join is a broadcast of 5 totals. "
    "120-row output.",
    tags=("microstructure", "window", "agg"),
)
def ms_intraday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = W.partitionBy("sym").orderBy("ts", "tid")
    p = F.floor(F.col("price") * 100).cast("bigint")
    x = t.select(
        "sym",
        F.hour("ts").cast("int").alias("hod"),
        "qty",
        F.abs(p - F.lag(p).over(w)).alias("adp"),
    )
    h = x.groupBy("sym", "hod").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("qty").alias("vol"),
        F.sum(F.coalesce(F.col("adp"), F.lit(0))).alias("abs_dp_e2"),
    )
    tot = h.groupBy("sym").agg(F.sum("vol").alias("tvol"))
    return (
        h.join(F.broadcast(tot), "sym")
        .select(
            "sym",
            "hod",
            F.col("n_trades").cast("bigint").alias("n_trades"),
            F.col("vol").cast("bigint").alias("vol"),
            F.expr("CAST((1000000 * vol) DIV tvol AS BIGINT)").alias(
                "vol_share_ppm"
            ),
            F.col("abs_dp_e2").cast("bigint").alias("abs_dp_e2"),
        )
        .orderBy("sym", "hod")
    )


# --- ms_rs_profile ---------------------------------------------------------

_RS_SCALES = (16, 64, 256)

# per-chunk R/S from exact integers: with e2 prices p, chunk length n,
# chunk sums S1/S2 and within-chunk running sum cum_i at index i, the
# centered-cumsum range times n is an INTEGER (n*cum_i - i*S1), and
# R/S = r_int / sqrt(n*S2 - S1*S1) — one division + one sqrt, shared
# text. The per-(sym, scale) summary is the DISCRETE median of those
# chunk doubles (selection, never a cross-chunk double sum — the
# reassociation trap).
_RS_DERIVE = "CAST(r_int AS DOUBLE) / sqrt(CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)"


@register(
    "ms_rs_profile",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    base AS (
      SELECT sym, ts, tid, CAST(floor(price * 100) AS BIGINT) AS p,
             row_number() OVER (PARTITION BY sym ORDER BY ts, tid) AS rn
      FROM t
    ), fan AS (
      SELECT b.*, k.k,
             (rn - 1) // k.k AS chunk,
             (rn - 1) % k.k + 1 AS wi
      FROM base b CROSS JOIN (
        SELECT UNNEST([{", ".join(str(k) for k in _RS_SCALES)}]) AS k
      ) k
    ), runs AS (
      SELECT sym, k, chunk, wi, p,
             SUM(p) OVER (PARTITION BY sym, k, chunk ORDER BY wi
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM fan
    ), chunks AS (
      SELECT sym, k, chunk, COUNT(*) AS n,
             SUM(p) AS s1, SUM(p * p) AS s2
      FROM runs GROUP BY sym, k, chunk
    ), ranges AS (
      SELECT r.sym, r.k, r.chunk, c.n, c.s1, c.s2,
             MAX(c.n * r.cum - r.wi * c.s1)
               - MIN(c.n * r.cum - r.wi * c.s1) AS r_int
      FROM runs r JOIN chunks c
        ON c.sym = r.sym AND c.k = r.k AND c.chunk = r.chunk
      GROUP BY r.sym, r.k, r.chunk, c.n, c.s1, c.s2
    ), ok AS (
      SELECT sym, k, CAST({_RS_DERIVE} AS DOUBLE) AS rs
      FROM ranges WHERE n = k AND s2 * n > s1 * s1
    )
    SELECT sym, CAST(k AS BIGINT) AS scale,
           COUNT(*) AS n_chunks,
           CAST(quantile_disc(rs, 0.5) AS DOUBLE) AS rs_median
    FROM ok GROUP BY sym, k ORDER BY sym, scale
    """,
    doc="Rescaled-range (Hurst R/S) profile per symbol at chunk scales "
    "16/64/256 trades: each complete chunk's range of centered "
    "cumulative deviations over its standard deviation, summarized as "
    "the DISCRETE median per (sym, scale) — how R/S grows with scale "
    "is the long-memory fingerprint (slope ~0.5 = random walk, the "
    "Hurst exponent's raw material; the multi-scale companion to "
    "stats_dickey_fuller's single-number unit-root test). Exactness: "
    "the centered-cumsum range times n is a pure INTEGER "
    "(n*cum_i - i*S1), variance times n^2 likewise, so each chunk's "
    "R/S is one shared division+sqrt and the summary is element "
    "SELECTION (never a cross-chunk double sum). 100 TB shape: the "
    "3x scale fanout rides ONE sym-keyed exchange "
    "(HashPartitioning(sym) satisfies the (sym,k,chunk) clustering), "
    "chunk rollups are combinable, output is 15 rows.",
    tags=("microstructure", "window", "stats"),
)
def ms_rs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = W.partitionBy("sym").orderBy("ts", "tid")
    base = t.select(
        "sym",
        F.floor(F.col("price") * 100).cast("bigint").alias("p"),
        F.row_number().over(w).alias("rn"),
    )
    fan = base.crossJoin(
        F.broadcast(
            t.sparkSession.range(1)
            .selectExpr(
                f"explode(array({', '.join(str(k) for k in _RS_SCALES)})) AS k"
            )
        )
    ).select(
        "sym",
        "p",
        "k",
        F.expr("(rn - 1) DIV k").alias("chunk"),
        F.expr("(rn - 1) % k + 1").alias("wi"),
    )
    # chunk totals as UNORDERED windows over the SAME partition the
    # running sum uses — everything rides one exchange, and the
    # per-chunk rollup is one combinable aggregate (the agg+join-back
    # variant re-shuffled the data-sized run rows; slope-measured
    # 2.6x -> fixed here)
    wc = W.partitionBy("sym", "k", "chunk").orderBy("wi")
    wp = W.partitionBy("sym", "k", "chunk")
    runs = fan.select(
        "sym",
        "k",
        "chunk",
        "wi",
        F.sum("p").over(wc.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("p").over(wp).alias("s1"),
        F.sum(F.expr("p * p")).over(wp).alias("s2"),
    )
    ranges = runs.groupBy("sym", "k", "chunk").agg(
        F.max("n").alias("n"),
        F.max("s1").alias("s1"),
        F.max("s2").alias("s2"),
        (
            F.max(F.expr("n * cum - wi * s1"))
            - F.min(F.expr("n * cum - wi * s1"))
        ).alias("r_int"),
    )
    ok = ranges.where("n = k AND s2 * n > s1 * s1").select(
        "sym", "k", F.expr(f"CAST({_RS_DERIVE} AS DOUBLE)").alias("rs")
    )
    ok.createOrReplaceTempView("ms_rs_chunks")
    return spark.sql(
        """
        SELECT sym, CAST(k AS BIGINT) AS scale,
               COUNT(*) AS n_chunks,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY rs)
                    AS DOUBLE) AS rs_median
        FROM ms_rs_chunks GROUP BY sym, k ORDER BY sym, scale
        """
    )


# --- ms_time_weighted_imbalance ----------------------------------------------

from binance_etl_spark.plans.microstructure import _QUOTES_SQL  # noqa: E402


@register(
    "ms_time_weighted_imbalance",
    oracle=f"""
    WITH q AS ({_QUOTES_SQL}),
    d AS (
      SELECT sym, bq, aq,
             lead(epoch_us(ts)) OVER (PARTITION BY sym
                                      ORDER BY ts, qid)
               - epoch_us(ts) AS dur_us,
             CAST(((bq - aq) * 1000000) // (bq + aq) AS BIGINT) AS imb_ppm
      FROM q
    ), ok AS (
      SELECT * FROM d WHERE dur_us IS NOT NULL AND dur_us > 0
    )
    SELECT sym, COUNT(*) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
           CAST(SUM(dur_us * imb_ppm) // SUM(dur_us) AS BIGINT)
             AS tw_imbalance_ppm,
           CAST(SUM(CASE WHEN imb_ppm > 0 THEN dur_us ELSE 0 END)
                * 1000000 // SUM(dur_us) AS BIGINT) AS bid_heavy_time_ppm
    FROM ok GROUP BY sym ORDER BY sym
    """,
    doc="TIME-weighted order-book imbalance per symbol: each quote's "
    "size imbalance (bq-aq)/(bq+aq) as an integer ppm DIV, weighted "
    "by how long that quote was IN FORCE (interval to the next quote "
    "— the time-weighting every quoted-spread/imbalance study uses, "
    "since event-weighted averages over-count bursts), plus the "
    "fraction of time the book sat bid-heavy. All integer (micros x "
    "ppm products stay far inside int64); zero-length and tail "
    "intervals drop. 100 TB shape: ONE sym-keyed window exchange for "
    "the interval durations, one combinable rollup, 5-row output.",
    tags=("microstructure", "window", "agg"),
)
def ms_time_weighted_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.catalog import load as _load

    e = _load(spark, sf_dir, "events").where(F.col("value") > 0)
    q = e.select(
        F.col("event_id").alias("qid"),
        (F.col("user_id") % 5).cast("int").alias("sym"),
        "ts",
        (F.col("event_id") % 7 + 1).cast("bigint").alias("bq"),
        (F.col("event_id") % 11 + 1).cast("bigint").alias("aq"),
    )
    w = W.partitionBy("sym").orderBy("ts", "qid")
    d = q.select(
        "sym",
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias(
            "dur_us"
        ),
        F.expr("CAST(((bq - aq) * 1000000) DIV (bq + aq) AS BIGINT)").alias(
            "imb_ppm"
        ),
    ).where(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
    return (
        d.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur_us").cast("bigint").alias("total_dur_us"),
            F.expr(
                "CAST(SUM(dur_us * imb_ppm) DIV SUM(dur_us) AS BIGINT)"
            ).alias("tw_imbalance_ppm"),
            F.expr(
                "CAST(SUM(CASE WHEN imb_ppm > 0 THEN dur_us ELSE 0 END)"
                " * 1000000 DIV SUM(dur_us) AS BIGINT)"
            ).alias("bid_heavy_time_ppm"),
        )
        .orderBy("sym")
    )
