"""Risk / monitoring analytics over per-key value series (the consumer
side of the reference's trades output — drawdown, realized variance,
drift detection are the standard post-ETL risk queries).

The events table is the series fixture: (user_id, ts, value) plays
(symbol, ts, price). All plans are one hash shuffle on the series key
plus a sorted window pass — O(|series|) per key, embarrassingly
parallel across keys, no global ordering anywhere (a single global
window would serialize at 100 TB; every window here is keyed).

Cross-engine determinism: raw parquet doubles are identical bytes in
both engines; IEEE divide/subtract/floor are correctly rounded in
both; all derived outputs are floor-e6/e12 fixed-point bigints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register


@register(
    "win_drawdown",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
           peak,
           CASE WHEN peak > 0
                THEN CAST(floor((peak - value) / peak * 1000000) AS BIGINT)
           END AS dd_ppm,
           CAST(max(CASE WHEN peak > 0
                    THEN CAST(floor((peak - value) / peak * 1000000) AS BIGINT)
                END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS max_dd_ppm
    FROM (
      SELECT user_id, event_id, ts, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM events
    )
    """,
    doc="Running-peak DRAWDOWN per series: peak = running max(value), "
    "drawdown = (peak-value)/peak in ppm, plus the running MAX "
    "drawdown — the standard underwater-curve risk query. Two stacked "
    "window passes over ONE keyed sort (same partition+order), exact "
    "fixed-point output. One shuffle on the series key; per-key "
    "windows parallelize across any number of executors.",
    tags=("market", "window", "risk"),
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peaked = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.max("value").over(w).alias("peak"),
        F.col("ts"),
    )
    # peak can be 0 (a series that opens at 0): drawdown is undefined
    # there — NULL, which max() skips in both engines.
    dd = F.when(
        F.col("peak") > 0,
        F.floor((F.col("peak") - F.col("value")) / F.col("peak") * 1_000_000).cast(
            "bigint"
        ),
    )
    return peaked.select(
        "user_id",
        "event_id",
        "ts_us",
        "value",
        "peak",
        dd.alias("dd_ppm"),
        F.max(dd).over(w).cast("bigint").alias("max_dd_ppm"),
    ).drop("ts")


@register(
    "win_realized_var",
    oracle="""
    WITH r AS (
      SELECT user_id,
             CASE WHEN lag(value) OVER w > 0 THEN
               CAST(floor(greatest(least(
                   value / lag(value) OVER w - 1, 10), -10) * 1000000) AS BIGINT)
             END AS r_e6
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(r_e6) AS n_rets,
           CAST(SUM(r_e6 * r_e6) AS BIGINT) AS sum_r2_e12,
           CAST(MAX(abs(r_e6)) AS BIGINT) AS max_abs_r_e6
    FROM r WHERE r_e6 IS NOT NULL
    GROUP BY user_id
    """,
    doc="Per-series REALIZED VARIANCE: simple returns from consecutive "
    "observations (lag window), winsorized to +/-1000% (bounds the e6 "
    "fixed point so squares stay in bigint), summed squares per key. "
    "One keyed shuffle + window lag + map-side-combinable agg; the "
    "volatility backbone of any market risk report.",
    tags=("market", "window", "risk"),
)
def win_realized_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # A return is undefined off a non-positive base (series opening, or
    # a zero print): NULL, filtered below — also keeps ANSI division
    # from faulting on lag(value) = 0.
    prev = F.lag("value").over(w)
    ret = F.greatest(
        F.least(F.col("value") / prev - 1, F.lit(10.0)), F.lit(-10.0)
    )
    r = e.select(
        "user_id",
        F.when(prev > 0, F.floor(ret * 1_000_000).cast("bigint")).alias("r_e6"),
    ).where(F.col("r_e6").isNotNull())
    return r.groupBy("user_id").agg(
        F.count("r_e6").alias("n_rets"),
        F.sum(F.col("r_e6") * F.col("r_e6")).cast("bigint").alias("sum_r2_e12"),
        F.max(F.abs("r_e6")).cast("bigint").alias("max_abs_r_e6"),
    )


_CUSUM_BREACH_E6 = 20_000_000  # |cusum| > 20 value-units


@register(
    "win_cusum_drift",
    oracle=f"""
    WITH u AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 1000000) AS BIGINT) AS u6
      FROM events
    ), m AS (
      SELECT user_id, event_id, ts, u6,
             CAST(sum(u6) OVER (PARTITION BY user_id) AS BIGINT)
               // CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS mean_u6
      FROM u
    )
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(sum(u6 - mean_u6) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cusum_e6,
           abs(CAST(sum(u6 - mean_u6) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
             > {_CUSUM_BREACH_E6} AS breach
    FROM m
    """,
    doc="CUSUM DRIFT detection per series: running sum of (value - "
    "series mean) in exact e6 fixed point, breach-flagged beyond a "
    "band — the change-point monitor for data-quality / regime drift. "
    "The per-key mean is an UNORDERED window over the same key the "
    "running sum partitions on, so the whole query is ONE shuffle and "
    "one sort (no groupBy+join round trip — plan-pinned); integer "
    "running sums are exact and engine-identical.",
    tags=("market", "window", "monitoring"),
)
def win_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    u = e.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("u6"),
    )
    m = u.select(
        "user_id",
        "event_id",
        "ts",
        "u6",
        F.expr(
            "CAST(sum(u6) OVER (PARTITION BY user_id) AS BIGINT) div "
            "count(*) OVER (PARTITION BY user_id)"
        ).alias("mean_u6"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cusum = F.sum(F.col("u6") - F.col("mean_u6")).over(w).cast("bigint")
    return m.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        cusum.alias("cusum_e6"),
        (F.abs(cusum) > _CUSUM_BREACH_E6).alias("breach"),
    )


_Z_FRAME = 4  # current row + 4 preceding = 5-observation window


@register(
    "win_rolling_zscore",
    oracle=f"""
    WITH u AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 1000000) AS BIGINT) AS u6
      FROM events
    ), s AS (
      SELECT user_id, event_id, ts, u6,
             CAST(sum(u6) OVER w AS BIGINT) AS s1,
             CAST(sum(u6 * u6) OVER w AS BIGINT) AS s2,
             CAST(count(*) OVER w AS BIGINT) AS n
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_Z_FRAME} PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, n,
           CASE WHEN n > 1 AND s2 * n > s1 * s1 THEN
             CAST(floor(
               (CAST(u6 AS DOUBLE) * n - CAST(s1 AS DOUBLE))
               / sqrt(CAST(s2 * n - s1 * s1 AS DOUBLE)) / sqrt(CAST(n - 1 AS DOUBLE))
               * 1000) AS BIGINT)
           END AS z_e3
    FROM s
    """,
    doc="Rolling Z-SCORE per series over a 5-observation frame: exact "
    "bigint moment sums (s1, s2) inside the frame, then z = "
    "(x - mean)/std derived from integer moments in a fixed double "
    "expression (sqrt/divide are IEEE-correctly-rounded, identical "
    "across engines), floor-e3 output. NULL when the frame variance "
    "is zero or n < 2. One keyed shuffle + one window pass — the "
    "streaming-feature normalization every anomaly gate runs.",
    tags=("market", "window", "feature"),
)
def win_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    u = e.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("u6"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_FRAME, Window.currentRow)
    )
    s = u.select(
        "user_id",
        "event_id",
        "ts",
        "u6",
        F.sum("u6").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("u6") * F.col("u6")).over(w).cast("bigint").alias("s2"),
        F.count("*").over(w).cast("bigint").alias("n"),
    )
    num = F.col("u6").cast("double") * F.col("n") - F.col("s1").cast("double")
    var_units = (F.col("s2") * F.col("n") - F.col("s1") * F.col("s1")).cast("double")
    z = F.floor(
        num / F.sqrt(var_units) / F.sqrt((F.col("n") - 1).cast("double")) * 1_000
    ).cast("bigint")
    return s.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "n",
        F.when(
            (F.col("n") > 1) & (F.col("s2") * F.col("n") > F.col("s1") * F.col("s1")),
            z,
        ).alias("z_e3"),
    )


@register(
    "win_transition_matrix",
    oracle="""
    WITH t AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ), c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM t WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
           (n * 1000000) // CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
             AS p_ppm
    FROM c
    """,
    doc="Event-type TRANSITION MATRIX: lag(event_type) per series, "
    "global (prev, next) counts, and row-normalized transition "
    "probabilities in exact ppm — the Markov-chain summary of user "
    "journeys. Keyed lag window + one map-side-combinable agg; row "
    "totals come from an unordered window over the already-aggregated "
    "type-pair table (vs agg+join, which would duplicate the whole "
    "upstream subtree into both consumers — plan-pinned).",
    tags=("window", "agg", "analytics"),
)
def win_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    c = t.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    row_total = F.sum("n").over(Window.partitionBy("prev_type")).cast("bigint")
    return c.select(
        "prev_type",
        "next_type",
        "n",
        row_total.alias("row_total"),
        F.expr(
            "(n * 1000000) div CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)"
        ).alias("p_ppm"),
    )


# --- win_ewma --------------------------------------------------------

# Truncated EWMA, alpha = 1/4, lookback K = 8: weights w_j = a(1-a)^j
# as EXACT e9 integers (3^j * 1e9 // 4^(j+1)) — pure integer literals,
# identical in both engines; the >K tail (<4% of mass) is truncated,
# and the normalizer re-weights by the terms actually present so the
# head of each series is unbiased.
_EWMA_K = 8
_EWMA_W = [(3**j * 10**9) // (4 ** (j + 1)) for j in range(_EWMA_K)]


def _ewma_terms(lag_fmt: str) -> tuple[str, str]:
    tot = " + ".join(
        f"COALESCE({lag_fmt.format(j=j)}, 0) * {w}" for j, w in enumerate(_EWMA_W)
    )
    norm = " + ".join(
        f"CASE WHEN {lag_fmt.format(j=j)} IS NOT NULL THEN {w} ELSE 0 END"
        for j, w in enumerate(_EWMA_W)
    )
    return tot, norm


_SQL_TOT, _SQL_NORM = _ewma_terms("lag(u6, {j}) OVER w")


@register(
    "win_ewma",
    oracle=f"""
    WITH u AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 1000000) AS BIGINT) AS u6
      FROM events
    ), s AS (
      SELECT user_id, event_id, ts, u6,
             CAST({_SQL_TOT} AS BIGINT) AS tot,
             CAST({_SQL_NORM} AS BIGINT) AS norm
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           tot // norm AS ewma_u6
    FROM s
    """,
    doc=f"Truncated EWMA (alpha=0.25, {_EWMA_K}-observation lookback) "
    "per series: weights are exact integer literals (3^j*1e9 div "
    "4^(j+1)), the value enters as floor-e6 units, and the output is "
    "the weighted mean renormalized over the terms present — so "
    "series heads are unbiased and everything is bigint-exact across "
    "engines. The recursion is unrolled into K lag() taps over ONE "
    "keyed sorted window (one shuffle; the classic scalable rewrite "
    "of a sequential filter), which is how an EMA feature actually "
    "ships at 100 TB — state-free, re-runnable from any offset.",
    tags=("market", "window", "risk"),
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    u = e.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("u6"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tot = None
    norm = None
    for j, wt in enumerate(_EWMA_W):
        lagged = F.lag("u6", j).over(w)
        t = F.coalesce(lagged, F.lit(0)) * F.lit(wt)
        n = F.when(lagged.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        tot = t if tot is None else tot + t
        norm = n if norm is None else norm + n
    # true integer division (double / would lose precision past 2^53)
    return (
        u.withColumn("tot", tot.cast("bigint"))
        .withColumn("norm", norm.cast("bigint"))
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.expr("tot div norm").alias("ewma_u6"),
        )
    )
