"""Round-8 second statistics wave: higher-moment and portmanteau
inference — the normality / equal-means / whiteness screens a
monitoring pipeline runs after the two-sample battery (stats3 =
k-sample + moment layer over analytics5's two-sample layer).

Cross-engine float discipline (the microstructure.py rules): every
cross-row sum is over exact integers (value floored to e0/e2), so the
aggregates are order-free across partitionings AND engines; derived
statistics come from those integer sufficient sums via IDENTICAL
shared-text trees (divisions, multiplies, sqrt — all IEEE-correctly-
rounded; never pow/ln whose last ulp varies by libm). Where a
statistic needs a SUM OF DOUBLES across groups or lags (ANOVA's
within-group sum, Ljung-Box's lag sum), the rows are PIVOTED into
columns and added in one fixed textual order — engines cannot
reassociate an explicit a + b + c + d.

Scale notes inline per op; none collects, none exceeds one combinable
aggregate (plus the one keyed window exchange Ljung-Box shares with
the ACF family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.microstructure import _TAPE_SQL, _tape
from binance_etl_spark.plans.registry import register

# --- stats_jarque_bera -----------------------------------------------------

# central moments from RAW integer power sums (S1..S4 of v = floor(value),
# e0 scale): mu = S1/n, then the binomial expansion — one shared tree.
# m2^(3/2) is written sqrt(m2) * m2 (sqrt and * are correctly rounded;
# pow(x, 1.5) is NOT a correctly-rounded libm entry point).
_JB_MOMENTS = """
    CAST(s2 AS DOUBLE) / n - mu * mu AS m2,
    CAST(s3 AS DOUBLE) / n - 3e0 * mu * (CAST(s2 AS DOUBLE) / n)
      + 2e0 * mu * mu * mu AS m3,
    CAST(s4 AS DOUBLE) / n - 4e0 * mu * (CAST(s3 AS DOUBLE) / n)
      + 6e0 * mu * mu * (CAST(s2 AS DOUBLE) / n)
      - 3e0 * mu * mu * mu * mu AS m4
"""


@register(
    "stats_jarque_bera",
    oracle=f"""
    WITH sums AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(v) AS s1, SUM(v * v) AS s2,
             SUM(v * v * v) AS s3, SUM(v * v * v * v) AS s4
      FROM (SELECT event_type, CAST(floor(value) AS BIGINT) AS v
            FROM events)
      GROUP BY event_type
    ), mu AS (
      SELECT event_type, n, s1, s2, s3, s4,
             CAST(s1 AS DOUBLE) / n AS mu
      FROM sums
    ), m AS (
      SELECT event_type, n, mu, {_JB_MOMENTS}
      FROM mu
    ), sk AS (
      SELECT event_type, n, mu,
             m3 / (sqrt(m2) * m2) AS skewness,
             m4 / (m2 * m2) - 3e0 AS kurtosis_excess
      FROM m
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(mu AS DOUBLE) AS mean_e0,
           CAST(skewness AS DOUBLE) AS skewness,
           CAST(kurtosis_excess AS DOUBLE) AS kurtosis_excess,
           CAST(CAST(n AS DOUBLE) / 6e0
                * (skewness * skewness
                   + kurtosis_excess * kurtosis_excess / 4e0)
                AS DOUBLE) AS jb_stat
    FROM sk ORDER BY event_type
    """,
    doc="Jarque-Bera normality test per event type: skewness and "
    "excess kurtosis from the first four RAW integer power sums "
    "(value floored to e0; the binomial expansion turns raw sums into "
    "central moments inside one shared-text double tree, and "
    "m2^(3/2) is spelled sqrt(m2)*m2 because pow is not correctly "
    "rounded). JB = n/6 * (skew^2 + kurt^2/4) ~ chi2(2) under "
    "normality — the distribution-shape DQ screen next to dq_benford's "
    "digit screen. BIGINT bound: v <= ~560 on this tape, so "
    "v^4 <= 1e11 keeps S4 in int64 to ~9e7 rows/group; wider domains "
    "re-anchor v before the power sums. 100 TB shape: ONE combinable "
    "aggregate, 5-row output, zero joins.",
    tags=("stats", "agg"),
)
def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.floor("value").cast("bigint").alias("v")
    )
    sums = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("v * v")).alias("s2"),
        F.sum(F.expr("v * v * v")).alias("s3"),
        F.sum(F.expr("v * v * v * v")).alias("s4"),
    )
    mu = sums.selectExpr("*", "CAST(s1 AS DOUBLE) / n AS mu")
    m = mu.selectExpr("event_type", "n", "mu", *_JB_MOMENTS.split(",\n"))
    sk = m.selectExpr(
        "event_type",
        "n",
        "mu",
        "m3 / (sqrt(m2) * m2) AS skewness",
        "m4 / (m2 * m2) - 3e0 AS kurtosis_excess",
    )
    return sk.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n",
        "CAST(mu AS DOUBLE) AS mean_e0",
        "CAST(skewness AS DOUBLE) AS skewness",
        "CAST(kurtosis_excess AS DOUBLE) AS kurtosis_excess",
        "CAST(CAST(n AS DOUBLE) / 6e0 * (skewness * skewness"
        " + kurtosis_excess * kurtosis_excess / 4e0) AS DOUBLE) AS jb_stat",
    ).orderBy("event_type")


# --- stats_anova_oneway ----------------------------------------------------

_ANOVA_TYPES = ("click", "error", "purchase", "signup", "view")

# within-group and between-group sums assembled in ONE FIXED textual
# order over the pivoted per-type columns — engines cannot reassociate
# an explicit chain, so the doubles match bit for bit.
_SSW = " + ".join(
    f"(CAST(s2_{t} AS DOUBLE) / 1e4"
    f" - (CAST(s1_{t} AS DOUBLE) / 1e2) * (CAST(s1_{t} AS DOUBLE) / 1e2)"
    f" / n_{t})"
    for t in _ANOVA_TYPES
)
_SST_N = " + ".join(f"n_{t}" for t in _ANOVA_TYPES)
_SST_S1 = " + ".join(f"s1_{t}" for t in _ANOVA_TYPES)
_SSB = " + ".join(
    f"(CAST(s1_{t} AS DOUBLE) / 1e2) * (CAST(s1_{t} AS DOUBLE) / 1e2)"
    f" / n_{t}"
    for t in _ANOVA_TYPES
)


_ANOVA_PIVOT = ", ".join(
    f"MAX(CASE WHEN event_type = '{t}' THEN {c} END) AS {c}_{t}"
    for t in _ANOVA_TYPES
    for c in ("n", "s1", "s2")
)

_ANOVA_DERIVE = f"""
    CAST({_SST_N} AS BIGINT) AS n_total,
    CAST(({_SSB})
         - ((CAST({_SST_S1} AS DOUBLE) / 1e2)
            * (CAST({_SST_S1} AS DOUBLE) / 1e2)) / ({_SST_N})
         AS DOUBLE) AS ss_between,
    CAST({_SSW} AS DOUBLE) AS ss_within
"""


@register(
    "stats_anova_oneway",
    oracle=f"""
    WITH g AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(v) AS s1, SUM(v * v) AS s2
      FROM (SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
            FROM events)
      GROUP BY event_type
    ), p AS (
      SELECT {_ANOVA_PIVOT} FROM g
    ), ss AS (
      SELECT {_ANOVA_DERIVE} FROM p
    )
    SELECT n_total, ss_between, ss_within,
           CAST((ss_between / {len(_ANOVA_TYPES) - 1})
                / (ss_within / (n_total - {len(_ANOVA_TYPES)}))
                AS DOUBLE) AS f_stat
    FROM ss
    """,
    doc="One-way ANOVA F test for equal mean value across the five "
    "event types — the k-sample generalization of stats_welch_ttest. "
    "Per-type integer sufficient sums (n, S1, S2 at e2) from ONE "
    "combinable aggregate are PIVOTED into columns so the between/"
    "within sums of squares are assembled in one fixed textual "
    "addition order (a grouped SUM of doubles would let either engine "
    "reassociate and drift the last ulp); F derives in the same "
    "shared tree. 100 TB shape: one pass, one 1-row pivot, "
    "1-row output.",
    tags=("stats", "agg"),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    g = (
        e.select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s1"),
            F.sum(F.expr("v * v")).alias("s2"),
        )
    )
    p = g.agg(
        *[
            F.expr(f"MAX(CASE WHEN event_type = '{t}' THEN {c} END)").alias(
                f"{c}_{t}"
            )
            for t in _ANOVA_TYPES
            for c in ("n", "s1", "s2")
        ]
    )
    ss = p.selectExpr(*_ANOVA_DERIVE.split(",\n"))
    return ss.selectExpr(
        "n_total",
        "ss_between",
        "ss_within",
        f"CAST((ss_between / {len(_ANOVA_TYPES) - 1})"
        f" / (ss_within / (n_total - {len(_ANOVA_TYPES)}))"
        " AS DOUBLE) AS f_stat",
    )


# --- stats_ljung_box -------------------------------------------------------

_LB_LAGS = (1, 2, 3, 4)

# textbook lag-k autocorrelation from integer sums: with global mu =
# S1/n, r_k = (sxy_k - mu*(hx_k + hy_k) + (n-k)*mu^2) / (S2 - S1*mu)
# where sxy_k / hx_k / hy_k are the exact integer lag-pair product sum
# and head/tail sums. One shared tree per lag.
_LB_R = (
    "(CAST(sxy_{k} AS DOUBLE) - mu * (CAST(hx_{k} AS DOUBLE) + hy_{k})"
    " + (n - {k}) * mu * mu)"
    " / (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * mu)"
)

# Q assembled in fixed textual order over the pivoted lag columns
_LB_Q = " + ".join(f"r{k} * r{k} / (n - {k})" for k in _LB_LAGS)


@register(
    "stats_ljung_box",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    x AS (
      SELECT sym, CAST(floor(price * 100) AS BIGINT) AS p,
             {", ".join(
                 f"lead(CAST(floor(price * 100) AS BIGINT), {k}) OVER "
                 f"(PARTITION BY sym ORDER BY ts, tid) AS p{k}"
                 for k in _LB_LAGS)}
      FROM t
    ), sums AS (
      SELECT sym, COUNT(*) AS n, SUM(p) AS s1, SUM(p * p) AS s2,
             {", ".join(
                 f"SUM(p * p{k}) FILTER (WHERE p{k} IS NOT NULL) AS sxy_{k}, "
                 f"SUM(p) FILTER (WHERE p{k} IS NOT NULL) AS hx_{k}, "
                 f"SUM(p{k}) FILTER (WHERE p{k} IS NOT NULL) AS hy_{k}"
                 for k in _LB_LAGS)}
      FROM x GROUP BY sym
    ), mu AS (
      SELECT *, CAST(s1 AS DOUBLE) / n AS mu FROM sums
    ), r AS (
      SELECT sym, n,
             {", ".join(
                 "CAST(" + _LB_R.format(k=k) + f" AS DOUBLE) AS r{k}"
                 for k in _LB_LAGS)}
      FROM mu
    )
    SELECT sym, CAST(n AS BIGINT) AS n,
           {", ".join(f"r{k}" for k in _LB_LAGS)},
           CAST(CAST(n AS DOUBLE) * (n + 2) * ({_LB_Q}) AS DOUBLE)
             AS q_stat,
           CAST({len(_LB_LAGS)} AS BIGINT) AS df
    FROM r ORDER BY sym
    """,
    doc="Ljung-Box portmanteau whiteness test on the per-symbol price "
    "series at lags 1-4 (the hypothesis-test companion to "
    "ms_acf_grid's point estimates): textbook r_k from exact integer "
    "lag-pair sums around the global mean (the head/tail-sum "
    "expansion keeps every cross-row sum integral), Q = n(n+2) * "
    "sum r_k^2/(n-k) assembled in one FIXED textual order over "
    "pivoted lag columns so neither engine can reassociate the "
    "double addition. 100 TB shape: all four leads ride ONE "
    "sym-keyed window exchange, then one combinable aggregate; "
    "5-row output.",
    tags=("stats", "window", "microstructure"),
)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = W.partitionBy("sym").orderBy("ts", "tid")
    p = F.floor(F.col("price") * 100).cast("bigint")
    x = t.select(
        "sym",
        p.alias("p"),
        *[F.lead(p, k).over(w).alias(f"p{k}") for k in _LB_LAGS],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("p").alias("s1"),
        F.sum(F.expr("p * p")).alias("s2"),
    ]
    for k in _LB_LAGS:
        nn = F.col(f"p{k}").isNotNull()
        aggs += [
            F.sum(F.when(nn, F.expr(f"p * p{k}"))).alias(f"sxy_{k}"),
            F.sum(F.when(nn, F.col("p"))).alias(f"hx_{k}"),
            F.sum(F.when(nn, F.col(f"p{k}"))).alias(f"hy_{k}"),
        ]
    sums = x.groupBy("sym").agg(*aggs)
    mu = sums.selectExpr("*", "CAST(s1 AS DOUBLE) / n AS mu")
    r = mu.selectExpr(
        "sym",
        "n",
        *[
            "CAST(" + _LB_R.format(k=k) + f" AS DOUBLE) AS r{k}"
            for k in _LB_LAGS
        ],
    )
    return r.selectExpr(
        "sym",
        "CAST(n AS BIGINT) AS n",
        *[f"r{k}" for k in _LB_LAGS],
        f"CAST(CAST(n AS DOUBLE) * (n + 2) * ({_LB_Q}) AS DOUBLE) AS q_stat",
        f"CAST({len(_LB_LAGS)} AS BIGINT) AS df",
    ).orderBy("sym")


# --- stats_dickey_fuller ---------------------------------------------------

# Dickey-Fuller regression dp_t = alpha + beta * p_{t-1}: beta, its
# standard error, and the DF t statistic from six exact integer sums
# via one shared-text tree (the stats_ols_group sufficient-statistics
# idiom; unit root <=> t not significantly below 0).
_DF_DERIVE = """
    CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS sxy_c,
    CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS sxx_c,
    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS syy_c
"""


@register(
    "stats_dickey_fuller",
    oracle=f"""
    WITH t AS ({_TAPE_SQL}),
    x AS (
      SELECT sym,
             lag(CAST(floor(price * 100) AS BIGINT)) OVER
               (PARTITION BY sym ORDER BY ts, tid) AS xl,
             CAST(floor(price * 100) AS BIGINT)
               - lag(CAST(floor(price * 100) AS BIGINT)) OVER
                   (PARTITION BY sym ORDER BY ts, tid) AS dy
      FROM t
    ), sums AS (
      SELECT sym, COUNT(*) AS n,
             SUM(xl) AS sx, SUM(dy) AS sy,
             SUM(xl * dy) AS sxy, SUM(xl * xl) AS sxx,
             SUM(dy * dy) AS syy
      FROM x WHERE xl IS NOT NULL GROUP BY sym
    ), c AS (
      SELECT sym, n, {_DF_DERIVE} FROM sums
    ), fit AS (
      SELECT sym, n, sxy_c / sxx_c AS beta,
             (syy_c - (sxy_c / sxx_c) * sxy_c) / (n - 2) AS s2,
             sxx_c
      FROM c
    )
    SELECT sym, CAST(n AS BIGINT) AS n,
           CAST(beta AS DOUBLE) AS beta,
           CAST(beta / sqrt(s2 / sxx_c) AS DOUBLE) AS t_df
    FROM fit ORDER BY sym
    """,
    doc="Dickey-Fuller unit-root test per symbol: regress the price "
    "CHANGE on the lagged price level (dp_t = a + b*p_{{t-1}}) and "
    "report b with its t statistic — the stationarity screen run "
    "before fitting anything mean-reverting (t near 0 = random walk, "
    "strongly negative = mean reversion; the regression companion to "
    "stats_ljung_box's whiteness test). Six exact integer sufficient "
    "sums (floor-e2 prices) from one combinable aggregate; slope, "
    "residual variance, and t derive via one shared-text tree "
    "(divisions + one sqrt). 100 TB shape: one sym-keyed window "
    "exchange for the lag, one pass, 5-row output.",
    tags=("stats", "window", "microstructure"),
)
def stats_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tape(spark, sf_dir)
    w = W.partitionBy("sym").orderBy("ts", "tid")
    p = F.floor(F.col("price") * 100).cast("bigint")
    x = t.select(
        "sym",
        F.lag(p).over(w).alias("xl"),
        (p - F.lag(p).over(w)).alias("dy"),
    ).where(F.col("xl").isNotNull())
    sums = x.groupBy("sym").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xl").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.expr("xl * dy")).alias("sxy"),
        F.sum(F.expr("xl * xl")).alias("sxx"),
        F.sum(F.expr("dy * dy")).alias("syy"),
    )
    c = sums.selectExpr("sym", "n", *_DF_DERIVE.split(",\n"))
    fit = c.selectExpr(
        "sym",
        "n",
        "sxy_c / sxx_c AS beta",
        "(syy_c - (sxy_c / sxx_c) * sxy_c) / (n - 2) AS s2",
        "sxx_c",
    )
    return fit.selectExpr(
        "sym",
        "CAST(n AS BIGINT) AS n",
        "CAST(beta AS DOUBLE) AS beta",
        "CAST(beta / sqrt(s2 / sxx_c) AS DOUBLE) AS t_df",
    ).orderBy("sym")


# --- stats_levene_bf -------------------------------------------------------

# Brown-Forsythe = one-way ANOVA on z = |x - median_g|: reuse the
# pivot/fixed-order SS machinery verbatim (z is an exact e2 integer
# because the group median is an ELEMENT of the e2 grid —
# percentile_disc/quantile_disc both select, never interpolate).


@register(
    "stats_levene_bf",
    oracle=f"""
    WITH v AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS x
      FROM events
    ), med AS (
      SELECT event_type, CAST(quantile_disc(x, 0.5) AS BIGINT) AS med
      FROM v GROUP BY event_type
    ), z AS (
      SELECT v.event_type, abs(v.x - m.med) AS v
      FROM v JOIN med m ON m.event_type = v.event_type
    ), g AS (
      SELECT event_type, COUNT(*) AS n, SUM(v) AS s1, SUM(v * v) AS s2
      FROM z GROUP BY event_type
    ), p AS (
      SELECT {_ANOVA_PIVOT} FROM g
    ), ss AS (
      SELECT {_ANOVA_DERIVE} FROM p
    )
    SELECT n_total, ss_between, ss_within,
           CAST((ss_between / {len(_ANOVA_TYPES) - 1})
                / (ss_within / (n_total - {len(_ANOVA_TYPES)}))
                AS DOUBLE) AS w_stat
    FROM ss
    """,
    doc="Brown-Forsythe (median-centered Levene) test for equal "
    "variances across the five event types — the homoscedasticity "
    "gate run BEFORE trusting ANOVA's pooled-variance F. z = "
    "|x - group median| stays an exact e2 integer (the median is a "
    "discrete-quantile ELEMENT on both engines, never interpolated), "
    "then W is literally one-way ANOVA on z, reusing the pivoted "
    "fixed-order SS assembly so no grouped double sum can "
    "reassociate. 100 TB shape: one quantile pass, one broadcast "
    "median join back, one combinable aggregate, 1-row output.",
    tags=("stats", "agg"),
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("x"),
    )
    v.createOrReplaceTempView("stats_levene_v")
    med = spark.sql(
        """
        SELECT event_type,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x)
                    AS BIGINT) AS med
        FROM stats_levene_v GROUP BY event_type
        """
    )
    z = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("x") - F.col("med")).alias("v")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("v * v")).alias("s2"),
    )
    p = g.agg(
        *[
            F.expr(f"MAX(CASE WHEN event_type = '{t}' THEN {c} END)").alias(
                f"{c}_{t}"
            )
            for t in _ANOVA_TYPES
            for c in ("n", "s1", "s2")
        ]
    )
    ss = p.selectExpr(*_ANOVA_DERIVE.split(",\n"))
    return ss.selectExpr(
        "n_total",
        "ss_between",
        "ss_within",
        f"CAST((ss_between / {len(_ANOVA_TYPES) - 1})"
        f" / (ss_within / (n_total - {len(_ANOVA_TYPES)}))"
        " AS DOUBLE) AS w_stat",
    )
