"""Round-8 statistics battery: classical two-sample inference and a
sufficient-statistics correlation matrix, plus a freshness-SLA data-
quality screen — the hypothesis-testing layer an experimentation /
monitoring pipeline runs over event streams.

Cross-engine float discipline (the microstructure.py rules): every
input is floored to integer units (value -> e2) BEFORE any cross-row
sum, so aggregates are order-free across partitionings AND engines;
derived statistics (means, variances, t, correlation) are computed
from those exact integers with IDENTICAL shared-text expression trees
— division and sqrt only, both IEEE-correctly-rounded, never ln/exp
whose last ulp varies across libm builds.

Scale notes inline per op; none of these collects, none exceeds one
data-sized exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

# Welch t statistic from exact integer sufficient stats — the SAME text
# runs on both engines (all casts explicit, one fixed tree).
_WELCH_DERIVE = """
    (CAST(s1 AS DOUBLE) / 100 / n - CAST(b_s1 AS DOUBLE) / 100 / b_n)
    / sqrt(
        ((CAST(s2 AS DOUBLE) / 10000
          - (CAST(s1 AS DOUBLE) / 100) * (CAST(s1 AS DOUBLE) / 100) / n)
         / (n - 1)) / n
      + ((CAST(b_s2 AS DOUBLE) / 10000
          - (CAST(b_s1 AS DOUBLE) / 100) * (CAST(b_s1 AS DOUBLE) / 100) / b_n)
         / (b_n - 1)) / b_n
    )
"""


@register(
    "stats_welch_ttest",
    oracle=f"""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(floor(value * 100) AS BIGINT)) AS s1,
             SUM(CAST(floor(value * 100) AS BIGINT)
                 * CAST(floor(value * 100) AS BIGINT)) AS s2
      FROM events GROUP BY event_type
    ), base AS (
      SELECT n AS b_n, s1 AS b_s1, s2 AS b_s2 FROM s
      WHERE event_type = 'click'
    )
    SELECT event_type, n,
           CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
           CAST({_WELCH_DERIVE} AS DOUBLE) AS t_stat
    FROM s, base
    WHERE event_type <> 'click'
    ORDER BY event_type
    """,
    doc="Welch's unequal-variance t-test of every event type's mean "
    "value against the 'click' baseline: one map-side-combinable "
    "aggregate emits exact integer sufficient statistics (n, sum of "
    "floor-e2 values, sum of squares), the 1-row baseline broadcasts, "
    "and the t statistic derives from the integers via ONE shared-text "
    "expression tree (divisions + one sqrt — both IEEE-correctly-"
    "rounded, so the hash is engine-exact; no Satterthwaite df here, "
    "it needs no new sums and would add only arithmetic). 100 TB "
    "shape: a 5-row aggregate over one scan; nothing else moves.",
    tags=("stats", "agg"),
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_e2"),
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_e2").alias("s1"),
        F.sum(F.col("v_e2") * F.col("v_e2")).alias("s2"),
    )
    base = (
        s.where(F.col("event_type") == "click")
        .select(
            F.col("n").alias("b_n"),
            F.col("s1").alias("b_s1"),
            F.col("s2").alias("b_s2"),
        )
    )
    return (
        s.where(F.col("event_type") != "click")
        .crossJoin(F.broadcast(base))
        .select(
            "event_type",
            "n",
            "s1",
            "s2",
            F.expr(_WELCH_DERIVE).cast("double").alias("t_stat"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_mann_whitney",
    oracle="""
    WITH two AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type IN ('click', 'purchase')
    ), hist AS (
      SELECT v,
             COUNT(*) FILTER (WHERE event_type = 'click') AS ca,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS cb,
             COUNT(*) AS c
      FROM two GROUP BY v
    ), cum AS (
      SELECT v, ca, cb, c,
             COALESCE(SUM(c) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS before
      FROM hist
    ), sums AS (
      SELECT SUM(ca) AS n_a, SUM(cb) AS n_b,
             SUM(ca * (2 * before + c + 1)) AS r2_a
      FROM cum
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(r2_a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
           CAST(2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS BIGINT) AS u2_b
    FROM sums
    """,
    doc="Mann-Whitney rank-sum U between the 'click' and 'purchase' "
    "value samples, EXACT with midrank tie handling and scalable by "
    "construction: instead of ranking N rows (a global sort), build "
    "the distinct-value histogram (one combinable aggregate over "
    "floor-e2 integers), run the cumulative count over DISTINCT "
    "values only (a tiny window), and expand each tie group's midrank "
    "algebraically — 2x-scaled so every quantity stays integer "
    "(avg rank of a tie group = before + (c+1)/2, so 2R = "
    "2*before + c + 1 per element). U2 = 2U; U_A + U_B = n_A*n_B "
    "checks by identity. 100 TB shape: the only data-sized operation "
    "is the histogram aggregate; the window runs over |distinct "
    "values| rows.",
    tags=("stats", "agg", "window"),
)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    two = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_type",
            F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        )
    )
    hist = two.groupBy("v").agg(
        F.count_if(F.col("event_type") == "click").alias("ca"),
        F.count_if(F.col("event_type") == "purchase").alias("cb"),
        F.count(F.lit(1)).alias("c"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    cum = hist.select(
        "ca",
        "cb",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("before"),
    )
    sums = cum.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("before") + F.col("c") + 1)
        ).alias("r2_a"),
    )
    return sums.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("bigint")
        .alias("u2_a"),
        (
            2 * F.col("n_a") * F.col("n_b")
            - (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        )
        .cast("bigint")
        .alias("u2_b"),
    )


# one shared-text Pearson derivation from exact integer sums
_CORR_DERIVE = """
    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
    / sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
"""

# (name, integer-scaled expression) — scales chosen so every pairwise
# product sum stays far inside BIGINT at 100x bench scale: price e0
# (<=1.05e5 -> squares <=1.1e10), qty e0 (<=50), disc/tax e2 (<=10)
_CORR_COLS = [
    ("quantity", "CAST(floor(l_quantity) AS BIGINT)"),
    ("price", "CAST(floor(l_extendedprice) AS BIGINT)"),
    ("discount_e2", "CAST(floor(l_discount * 100) AS BIGINT)"),
    ("tax_e2", "CAST(floor(l_tax * 100) AS BIGINT)"),
]


def _corr_pair_sql(table: str = "moments") -> str:
    pairs = []
    names = [n for n, _ in _CORR_COLS]
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            x, y = names[i], names[j]
            pairs.append(
                f"SELECT '{x}' AS col_x, '{y}' AS col_y, n, "
                f"sum_{x} AS sx, sum_{y} AS sy, sum_{x}_{y} AS sxy, "
                f"sum_{x}_{x} AS sxx, sum_{y}_{y} AS syy FROM {table}"
            )
    return " UNION ALL ".join(pairs)


def _corr_moment_exprs() -> list[str]:
    names = [n for n, _ in _CORR_COLS]
    out = [f"COUNT(*) AS n"]
    for x in names:
        out.append(f"SUM({x}) AS sum_{x}")
    for i in range(len(names)):
        for j in range(i, len(names)):
            x, y = names[i], names[j]
            out.append(f"SUM({x} * {y}) AS sum_{x}_{y}")
    return out


@register(
    "stats_corr_matrix",
    oracle=f"""
    WITH scaled AS (
      SELECT {", ".join(f"{e} AS {n}" for n, e in _CORR_COLS)}
      FROM lineitem
    ), moments AS (
      SELECT {", ".join(_corr_moment_exprs())} FROM scaled
    ), pairs AS (
      {_corr_pair_sql()}
    )
    SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
           CAST({_CORR_DERIVE} AS DOUBLE) AS corr
    FROM pairs ORDER BY col_x, col_y
    """,
    doc="Pairwise Pearson correlation matrix over four lineitem "
    "measures in ONE scan: a single aggregate emits ALL sufficient "
    "statistics (4 sums + 10 product sums + n, every input floored to "
    "integer units so the sums are order-free and engine-exact), then "
    "the 6 upper-triangle pairs unfold from that 1-row moments table "
    "with a shared-text derivation (multiplies, divides, two sqrts — "
    "all correctly-rounded). The textbook moment-matrix trick: at "
    "100 TB the correlation matrix costs exactly one combinable pass, "
    "never a per-pair scan.",
    tags=("stats", "agg"),
)
def stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    scaled = li.selectExpr(*[f"{e} AS {n}" for n, e in _CORR_COLS])
    exprs = _corr_moment_exprs()
    moments = scaled.agg(F.expr(exprs[0]), *[F.expr(e) for e in exprs[1:]])
    # namespaced view (the dq_mad_v / stats_boot_means convention) — a
    # bare "moments" would collide with any user view of that name
    moments.createOrReplaceTempView("stats_corr_moments")
    return spark.sql(
        f"""
        WITH pairs AS ({_corr_pair_sql("stats_corr_moments")})
        SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
               CAST({_CORR_DERIVE} AS DOUBLE) AS corr
        FROM pairs ORDER BY col_x, col_y
        """
    )


@register(
    "dq_freshness_sla",
    oracle="""
    WITH g AS (SELECT MAX(ts) AS global_max FROM events),
    f AS (
      SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS n
      FROM events GROUP BY event_type
    )
    SELECT f.event_type, f.n,
           CAST(floor(epoch(f.last_ts)) AS BIGINT) AS last_epoch_s,
           CAST(floor(epoch(g.global_max)) - floor(epoch(f.last_ts))
                AS BIGINT) AS lag_s,
           CAST(floor(epoch(g.global_max)) - floor(epoch(f.last_ts))
                > 21600 AS BOOLEAN) AS sla_breach
    FROM f, g ORDER BY f.event_type
    """,
    doc="Per-source freshness against a 6-hour SLA: every event type's "
    "latest timestamp, its lag behind the globally freshest event, "
    "and the breach flag — the staleness monitor a multi-source "
    "ingestion pipeline alerts on (the reference's local_timestamp "
    "column exists for exactly this drift question, base.py:52). "
    "Integer epoch seconds end to end. 100 TB shape: two combinable "
    "MAX aggregates and a 1-row broadcast; the scan prunes to (ts, "
    "event_type).",
    tags=("dq", "agg"),
)
def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    g = e.agg(F.max("ts").alias("global_max"))
    f = e.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n")
    )
    lag = F.col("global_max").cast("long") - F.col("last_ts").cast("long")
    return (
        f.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n",
            F.col("last_ts").cast("long").alias("last_epoch_s"),
            lag.alias("lag_s"),
            (lag > 21600).alias("sla_breach"),
        )
        .orderBy("event_type")
    )


# --- win_bollinger_breach ------------------------------------------------

_BOLL_N = 20  # rolling window length (trades)


@register(
    "win_bollinger_breach",
    oracle=f"""
    WITH t AS (
      SELECT CAST(user_id % 5 AS INT) AS sym, ts, event_id AS tid,
             CAST(floor(value * 100) AS BIGINT) AS p
      FROM events WHERE value > 0
    ), w AS (
      SELECT sym, p,
             SUM(p) OVER win AS s,
             SUM(p * p) OVER win AS ss,
             COUNT(*) OVER win AS n
      FROM t
      WINDOW win AS (PARTITION BY sym ORDER BY ts, tid
                     ROWS BETWEEN {_BOLL_N - 1} PRECEDING AND CURRENT ROW)
    ), f AS (
      SELECT sym,
             CASE WHEN (n * p - s) * (n * p - s) * (n - 1)
                       > 4 * n * (n * ss - s * s)
                  THEN 1 ELSE 0 END AS breach,
             CASE WHEN n * p > s THEN 1 ELSE 0 END AS above
      FROM w WHERE n = {_BOLL_N}
    )
    SELECT sym, COUNT(*) AS n_windows,
           CAST(SUM(breach) AS BIGINT) AS n_breach,
           CAST(SUM(CASE WHEN breach = 1 AND above = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_up,
           CAST(SUM(CASE WHEN breach = 1 AND above = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_down
    FROM f GROUP BY sym ORDER BY sym
    """,
    doc=f"Bollinger-band breach scan over the tape: per symbol, a "
    f"{_BOLL_N}-trade rolling mean/σ band, counting closes beyond "
    "±2σ — evaluated ENTIRELY in integer algebra (the breach test "
    "|p-μ|>2σ is cross-multiplied to (n·p-s)²·(n-1) > 4·n·(n·ss-s²) "
    "over exact e2 integer window sums, so no float division or sqrt "
    "ever runs and the hash is engine-exact by construction). 100 TB "
    "shape: one sym-keyed window exchange computes all three running "
    "sums in a single pass; the rollup is combinable.",
    tags=("microstructure", "window", "dq"),
)
def win_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load(spark, sf_dir, "events").where(F.col("value") > 0)
    t = e.select(
        (F.col("user_id") % 5).cast("int").alias("sym"),
        "ts",
        F.col("event_id").alias("tid"),
        F.floor(F.col("value") * 100).cast("bigint").alias("p"),
    )
    win = (
        W.partitionBy("sym")
        .orderBy("ts", "tid")
        .rowsBetween(-(_BOLL_N - 1), 0)
    )
    w = t.select(
        "sym",
        "p",
        F.sum("p").over(win).alias("s"),
        F.sum(F.col("p") * F.col("p")).over(win).alias("ss"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).where(F.col("n") == _BOLL_N)
    f = w.select(
        "sym",
        F.when(
            (F.col("n") * F.col("p") - F.col("s"))
            * (F.col("n") * F.col("p") - F.col("s"))
            * (F.col("n") - 1)
            > 4 * F.col("n") * (F.col("n") * F.col("ss") - F.col("s") * F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("breach"),
        F.when(F.col("n") * F.col("p") > F.col("s"), 1).otherwise(0).alias(
            "above"
        ),
    )
    return (
        f.groupBy("sym")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("breach").cast("bigint").alias("n_breach"),
            F.sum(
                F.when((F.col("breach") == 1) & (F.col("above") == 1), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_breach_up"),
            F.sum(
                F.when((F.col("breach") == 1) & (F.col("above") == 0), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_breach_down"),
        )
        .orderBy("sym")
    )


# --- dq_anomaly_mad ------------------------------------------------------


@register(
    "dq_anomaly_mad",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS x
      FROM events
    ), med AS (
      SELECT event_type,
             CAST(quantile_disc(x, 0.5) AS BIGINT) AS med FROM v
      GROUP BY event_type
    ), dev AS (
      SELECT v.event_type, v.x, med.med, abs(v.x - med.med) AS adev
      FROM v JOIN med USING (event_type)
    ), mad AS (
      SELECT event_type, med,
             CAST(quantile_disc(adev, 0.5) AS BIGINT) AS mad
      FROM dev GROUP BY event_type, med
    )
    SELECT d.event_type, COUNT(*) AS n, m.med AS med_e2, m.mad AS mad_e2,
           CAST(SUM(CASE WHEN d.adev * 10000 > 3 * 14826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type, m.med, m.mad
    ORDER BY d.event_type
    """,
    doc="Median-absolute-deviation anomaly screen per event type — the "
    "robust companion to dq_outlier_iqr (MAD has a 50% breakdown "
    "point; a contaminated tail cannot drag the fence the way it "
    "drags σ): flag values with |x-med| > 3·1.4826·MAD, the Gaussian-"
    "consistent MAD rule, evaluated as exact integer cross-products "
    "(adev·10000 > 3·14826·MAD over floor-e2 ints — no float "
    "enters the hash). Both medians are discrete-element selections "
    "(percentile_disc). 100 TB shape: two grouped-quantile passes and "
    "a broadcast of the 5-row med/MAD table back onto the scan.",
    tags=("dq", "stats", "agg"),
)
def dq_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("x"),
    )
    v.createOrReplaceTempView("dq_mad_v")
    med = spark.sql(
        """
        SELECT event_type,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x)
                    AS BIGINT) AS med
        FROM dq_mad_v GROUP BY event_type
        """
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("x") - F.col("med")).alias("adev"),
    )
    dev.createOrReplaceTempView("dq_mad_dev")
    mad = spark.sql(
        """
        SELECT event_type, med,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)
                    AS BIGINT) AS mad
        FROM dq_mad_dev GROUP BY event_type, med
        """
    )
    return (
        dev.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med").alias("med_e2"),
            F.max("mad").alias("mad_e2"),
            F.sum(
                F.when(
                    F.col("adev") * 10000 > 3 * 14826 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# --- sample_stratified_neyman --------------------------------------------

_NEYMAN_BUDGET = 200

# per-stratum sigma from exact integer sufficient stats — identical
# text on both engines (divisions + one sqrt)
_NEYMAN_SIGMA = (
    "sqrt((CAST(s2 AS DOUBLE) / 10000"
    " - (CAST(s1 AS DOUBLE) / 100) * (CAST(s1 AS DOUBLE) / 100) / n)"
    " / (n - 1))"
)


@register(
    "sample_stratified_neyman",
    oracle=f"""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(floor(value * 100) AS BIGINT)) AS s1,
             SUM(CAST(floor(value * 100) AS BIGINT)
                 * CAST(floor(value * 100) AS BIGINT)) AS s2
      FROM events GROUP BY event_type
    ), sh AS (
      SELECT event_type, n, CAST({_NEYMAN_SIGMA} AS DOUBLE) AS sigma,
             n * CAST({_NEYMAN_SIGMA} AS DOUBLE) AS share
      FROM s
    ), tot AS (SELECT SUM(share) AS tw FROM sh),
    q0 AS (
      SELECT event_type, n, sigma,
             CAST(floor({_NEYMAN_BUDGET} * share / tw) AS BIGINT) AS base,
             ({_NEYMAN_BUDGET} * share / tw)
               - floor({_NEYMAN_BUDGET} * share / tw) AS rem
      FROM sh, tot
    ), leftover AS (SELECT {_NEYMAN_BUDGET} - SUM(base) AS k FROM q0),
    quotas AS (
      SELECT event_type, n, sigma,
             base + CASE WHEN ROW_NUMBER() OVER (
                              ORDER BY rem DESC, event_type) <= k
                         THEN 1 ELSE 0 END AS quota
      FROM q0, leftover
    ), ranked AS (
      SELECT e.event_id, e.event_type,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_type
               ORDER BY md5('ney:' || CAST(e.event_id AS VARCHAR)),
                        e.event_id
             ) AS rn
      FROM events e
    )
    SELECT q.event_type, CAST(q.n AS BIGINT) AS n, q.sigma, q.quota,
           COUNT(*) AS n_kept,
           MIN(r.event_id) AS min_kept_id, MAX(r.event_id) AS max_kept_id
    FROM quotas q JOIN ranked r
      ON r.event_type = q.event_type AND r.rn <= q.quota
    GROUP BY q.event_type, q.n, q.sigma, q.quota
    ORDER BY q.event_type
    """,
    doc="Neyman-allocation stratified sampling: the optimal budget "
    "split for estimating a mean under stratification allocates "
    "n_h ~ N_h*sigma_h (high-variance strata earn more samples — the "
    "survey-sampling optimum, and the right way to downsample a "
    "heterogeneous event stream for eval sets). Sigmas derive from "
    "exact integer sufficient stats via one shared-text tree; shares "
    "are apportioned by largest remainder (sum(quota) == budget "
    "exactly, ties to stratum name); each quota fills with the "
    "stratum's deterministic bottom-by-md5 sample. 100 TB shape: one "
    "combinable stats pass, a 5-row quota table broadcast, one "
    "stratum-keyed window for the rank fill.",
    tags=("stats", "sampling"),
)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_e2"),
    )
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_e2").alias("s1"),
        F.sum(F.col("v_e2") * F.col("v_e2")).alias("s2"),
    )
    sh = s.select(
        "event_type",
        "n",
        F.expr(_NEYMAN_SIGMA).cast("double").alias("sigma"),
        (F.col("n") * F.expr(_NEYMAN_SIGMA)).alias("share"),
    )
    tot = sh.agg(F.sum("share").alias("tw"))
    exact = F.lit(_NEYMAN_BUDGET) * F.col("share") / F.col("tw")
    q0 = sh.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        "sigma",
        F.floor(exact).cast("bigint").alias("base"),
        (exact - F.floor(exact)).alias("rem"),
    )
    leftover = q0.agg((F.lit(_NEYMAN_BUDGET) - F.sum("base")).alias("k"))
    topup = F.row_number().over(
        W.partitionBy().orderBy(F.col("rem").desc(), F.col("event_type"))
    )
    quotas = (
        q0.crossJoin(F.broadcast(leftover))
        .withColumn("tr", topup)
        .select(
            "event_type",
            "n",
            "sigma",
            (
                F.col("base")
                + F.when(F.col("tr") <= F.col("k"), 1).otherwise(0)
            ).alias("quota"),
        )
    )
    ranked = v.select(
        "event_id",
        "event_type",
        F.row_number()
        .over(
            W.partitionBy("event_type").orderBy(
                F.md5(F.concat(F.lit("ney:"), F.col("event_id").cast("string"))),
                "event_id",
            )
        )
        .alias("rn"),
    )
    return (
        ranked.join(F.broadcast(quotas), "event_type")
        .where(F.col("rn") <= F.col("quota"))
        .groupBy("event_type", "n", "sigma", "quota")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("event_id").alias("min_kept_id"),
            F.max("event_id").alias("max_kept_id"),
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            "sigma",
            "quota",
            "n_kept",
            "min_kept_id",
            "max_kept_id",
        )
        .orderBy("event_type")
    )


# --- stats_kendall_tau ---------------------------------------------------

# tau-b from exact integer pair counts — identical text on both engines
_TAU_DERIVE = """
    (CAST(c AS DOUBLE) - d)
    / sqrt(CAST(n0 AS DOUBLE) - n1)
    / sqrt(CAST(n0 AS DOUBLE) - n2)
"""


@register(
    "stats_kendall_tau",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(floor(l_quantity) AS BIGINT) AS x,
             CAST(floor(l_discount * 100) AS BIGINT) AS y
      FROM lineitem
    ), cells AS (
      SELECT x, y, COUNT(*) AS c FROM pts GROUP BY x, y
    ), pairs AS (
      SELECT SUM(a.c * b.c) FILTER (WHERE b.x > a.x AND b.y > a.y) AS cc,
             SUM(a.c * b.c) FILTER (WHERE b.x > a.x AND b.y < a.y) AS dd
      FROM cells a JOIN cells b ON b.x > a.x
    ), ties AS (
      SELECT SUM(c) AS n,
             SUM(c * (c - 1)) // 2 AS tie_xy
      FROM cells
    ), tx AS (
      SELECT SUM(cx * (cx - 1)) // 2 AS n1 FROM (
        SELECT SUM(c) AS cx FROM cells GROUP BY x
      )
    ), ty AS (
      SELECT SUM(cy * (cy - 1)) // 2 AS n2 FROM (
        SELECT SUM(c) AS cy FROM cells GROUP BY y
      )
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(p.cc AS BIGINT) AS concordant,
           CAST(p.dd AS BIGINT) AS discordant,
           CAST(t.n * (t.n - 1) // 2 AS BIGINT) AS n0,
           CAST(x.n1 AS BIGINT) AS n1, CAST(y.n2 AS BIGINT) AS n2,
           CAST((SELECT {_TAU_DERIVE.strip()} FROM (
             SELECT p.cc AS c, p.dd AS d, t.n * (t.n - 1) // 2 AS n0,
                    x.n1 AS n1, y.n2 AS n2
           )) AS DOUBLE) AS tau_b
    FROM pairs p, ties t, tx x, ty y
    """,
    doc="Kendall tau-b rank correlation between lineitem quantity and "
    "discount, EXACT with tie correction and scalable by construction: "
    "instead of the O(n^2) pair walk, aggregate to the (x, y) "
    "CONTINGENCY table (one combinable pass; the value domains are "
    "50 x 11 here, bounded by the data's discreteness) and count "
    "concordant/discordant pairs as cell-product sums over the "
    "~500-cell table — all BIGINT-safe because pair counts grow "
    "QUADRATICALLY (n^2 fits int64 to n~3e9; the cubic sums Spearman "
    "needs would overflow at 10x, which is why tau is the scalable "
    "rank correlation here). tau-b derives from the five integer "
    "counts via one shared-text tree (two sqrts). 100 TB shape: one "
    "scan, one tiny cell self-join.",
    tags=("stats", "agg", "join"),
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pts = li.select(
        F.floor("l_quantity").cast("bigint").alias("x"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("y"),
    )
    cells = pts.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c"))
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc")
    )
    pairs = (
        a.join(F.broadcast(b), F.col("bx") > F.col("ax"))
        .agg(
            F.sum(
                F.when(F.col("by") > F.col("ay"), F.col("ac") * F.col("bc"))
            ).alias("cc"),
            F.sum(
                F.when(F.col("by") < F.col("ay"), F.col("ac") * F.col("bc"))
            ).alias("dd"),
        )
    )
    ties = cells.agg(F.sum("c").alias("n"))
    n1 = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .agg(F.expr("SUM(cx * (cx - 1)) DIV 2").alias("n1"))
    )
    n2 = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .agg(F.expr("SUM(cy * (cy - 1)) DIV 2").alias("n2"))
    )
    joined = (
        pairs.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("cc").cast("bigint").alias("concordant"),
            F.col("dd").cast("bigint").alias("discordant"),
            F.expr("n * (n - 1) DIV 2").cast("bigint").alias("n0"),
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
        )
    )
    return joined.select(
        "n",
        "concordant",
        "discordant",
        "n0",
        "n1",
        "n2",
        F.expr(
            _TAU_DERIVE.replace("c AS DOUBLE", "concordant AS DOUBLE")
            .replace("- d", "- discordant")
        )
        .cast("double")
        .alias("tau_b"),
    )
