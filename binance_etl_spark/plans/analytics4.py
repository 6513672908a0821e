"""Product-analytics wave 2 over the events stream: multi-touch
attribution, grouped OLS via sufficient statistics, and a Benford
first-digit DQ battery.

Cross-engine discipline (the registry rules): event ordering is
(ts, event_id); timestamps enter the math as integer epoch units
only; every credit/statistic is carried as exact BIGINT partial sums
(ppm-scaled where fractional) with at most one final double division
per output column, so the DuckDB oracle hash-matches exactly.

Reference parity note: the reference (anselumana/binance-etl) ships
no analytics — these are engine extensions in the
events-warehouse tier (reference scope: websocket->CSV,
storage/csv_storage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

_CHANNELS = ["click", "signup", "view"]
_DAY0 = 19723  # floor(epoch('2024-01-01') / 86400) — the data's day 0

# epoch-day index, one definition per engine so the two consumers
# (stats_ols_group, agg_rfm_segments) cannot drift
_DAY_SQL = f"CAST(floor(epoch(ts) / 86400) AS BIGINT) - {_DAY0}"


def _day_idx():
    return (
        F.floor(F.col("ts").cast("double").cast("long") / 86400).cast(
            "bigint"
        )
        - _DAY0
    )


# --- win_attribution ----------------------------------------------------


@register(
    "win_attribution",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id AS eid
      FROM events
    ), marked AS (
      SELECT user_id, event_type, tu, eid,
             MIN(CASE WHEN event_type = 'purchase' THEN tu END) OVER (
               PARTITION BY user_id ORDER BY tu, eid
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS nc
      FROM ev
    ), touches AS (
      SELECT user_id, event_type, tu, eid, nc
      FROM marked
      WHERE event_type IN ('click', 'signup', 'view') AND nc IS NOT NULL
    ), ranked AS (
      SELECT event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, nc ORDER BY tu, eid
             ) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, nc) AS n
      FROM touches
    )
    SELECT event_type AS channel,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch,
           CAST(SUM(CASE WHEN rn = n THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch,
           CAST(SUM(1000000 // n) AS BIGINT) AS linear_ppm
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Multi-touch conversion attribution: every click/signup/view "
    "touch is assigned to the user's NEXT purchase (strictly later in "
    "(ts, event_id) order; touches after the last purchase are "
    "unattributed), then each conversion's touch path is credited "
    "under three models at once — first-touch, last-touch, and linear "
    "(equal split, carried as exact floor-ppm integers so the sums "
    "hash-match across engines). Purchases sharing one (user, "
    "microsecond) merge into one conversion group by construction — "
    "the same rule on both engines. Shape: ONE user-keyed exchange "
    "serves the next-conversion window, the per-conversion "
    "rank/count windows, and the group — the three window passes "
    "reuse the same partitioning, then a 3-row channel aggregate. "
    "At 100 TB: O(events/user) per-partition window state, nothing "
    "data-sized crosses the network after the single exchange.",
    tags=("window", "analytics", "attribution"),
)
def win_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("tu"),
        F.col("event_id").alias("eid"),
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("tu", "eid")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    marked = ev.withColumn(
        "nc",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("tu"))
        ).over(w_next),
    )
    touches = marked.where(
        F.col("event_type").isin(_CHANNELS) & F.col("nc").isNotNull()
    )
    w_conv = Window.partitionBy("user_id", "nc")
    ranked = touches.select(
        "event_type",
        F.row_number().over(w_conv.orderBy("tu", "eid")).alias("rn"),
        F.count(F.lit(1))
        .over(w_conv.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"),
    )
    return (
        ranked.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("first_touch"),
            F.sum(F.when(F.col("rn") == F.col("n"), 1).otherwise(0))
            .cast("bigint")
            .alias("last_touch"),
            F.sum(F.expr("1000000 div n")).cast("bigint").alias("linear_ppm"),
        )
        .orderBy("channel")
    )


# --- stats_ols_group ----------------------------------------------------


@register(
    "stats_ols_group",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             {_DAY_SQL} AS x,
             CAST(floor(value * 100) AS BIGINT) AS y
      FROM events
    ), s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n, sx, sy, sxy, sxx,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 100 AS slope,
           (CAST(sy AS DOUBLE) / 100
            - (CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) / 100)
              * CAST(sx AS DOUBLE)) / n AS intercept
    FROM s ORDER BY event_type
    """,
    doc="Grouped least-squares trend (value vs day index, per event "
    "type) from EXACT integer sufficient statistics: one scan "
    "accumulates n, sum(x), sum(y_e2), sum(x*y_e2), sum(x*x) as "
    "map-side-combinable BIGINT partials — the classic single-pass "
    "OLS normal-equations shape — then slope and intercept are "
    "derived per group with one fixed IEEE expression over the five "
    "integers (deterministic on both engines; the sums are also "
    "emitted so the hash covers the exact partials, not just the "
    "doubles). Overflow audit: x <= 29 days, y_e2 <= 5.7e4 on this "
    "tape, so n*sxy stays under 2^63 up to ~1e7 rows per group; "
    "beyond that the same pattern widens the partials to decimal. "
    "At 100 TB this is the canonical sufficient-statistics "
    "aggregation: no second pass, no joins, a K-row result.",
    tags=("stats", "agg", "scale-note:sufficient-statistics"),
)
def stats_ols_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = load(spark, sf_dir, "events").select(
        "event_type",
        _day_idx().alias("x"),
        F.floor(F.col("value") * 100).cast("bigint").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        / 100
    )
    intercept = (
        F.col("sy").cast("double") / 100 - slope * F.col("sx").cast("double")
    ) / F.col("n")
    return s.select(
        "event_type",
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        slope.alias("slope"),
        intercept.alias("intercept"),
    ).orderBy("event_type")


# --- dq_benford ---------------------------------------------------------

# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — hard-coded so no engine
# evaluates a logarithm (libm last-ulp drift would break parity)
_BENFORD_PPM = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]


@register(
    "dq_benford",
    oracle=f"""
    WITH pos AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS v_e2
      FROM events WHERE floor(value * 100) >= 1
    ), digits AS (
      SELECT CAST(substr(CAST(v_e2 AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             COUNT(*) AS n
      FROM pos GROUP BY 1
    ), expected(digit, exp_ppm) AS (
      VALUES {", ".join(f"({d}, {p})" for d, p in enumerate(_BENFORD_PPM, 1))}
    )
    SELECT e.digit, COALESCE(d.n, 0) AS n,
           CAST(COALESCE(d.n, 0) * 1000000
                // (SELECT SUM(n) FROM digits) AS BIGINT) AS obs_ppm,
           e.exp_ppm,
           ABS(CAST(COALESCE(d.n, 0) * 1000000
                    // (SELECT SUM(n) FROM digits) AS BIGINT) - e.exp_ppm)
             AS dev_ppm
    FROM expected e LEFT JOIN digits d ON d.digit = e.digit
    ORDER BY e.digit
    """,
    doc="Benford's-law first-digit screen — the classic fabricated- "
    "data / unit-mixup detector for a numeric column: the first "
    "significant digit of each positive value (extracted from the "
    "floor-e2 integer's decimal string — NO logarithms, so no libm "
    "drift), its observed frequency in exact floor-ppm, and the "
    "deviation from the hard-coded Benford expectation. All nine "
    "digits always present (expected-side left join). Shape: one "
    "scan into a 9-row map-side-combinable count, a 1-row total, "
    "and a broadcast join against a 9-row literal table — "
    "scan-bound at any scale.",
    tags=("dq", "stats"),
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    pos = (
        load(spark, sf_dir, "events")
        .select(F.floor(F.col("value") * 100).cast("bigint").alias("v_e2"))
        .where(F.col("v_e2") >= 1)
    )
    digits = pos.groupBy(
        F.substring(F.col("v_e2").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    ).agg(F.count(F.lit(1)).alias("n"))
    total = digits.agg(F.sum("n").alias("tot"))
    expected = spark.createDataFrame(
        [(d, p) for d, p in enumerate(_BENFORD_PPM, 1)],
        "digit bigint, exp_ppm bigint",
    )
    obs_ppm = F.expr("coalesce(n, 0) * 1000000 div tot").cast("bigint")
    return (
        expected.join(F.broadcast(digits), "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            obs_ppm.alias("obs_ppm"),
            "exp_ppm",
            F.abs(obs_ppm - F.col("exp_ppm")).cast("bigint").alias("dev_ppm"),
        )
        .orderBy("digit")
    )


# --- stats_gini ---------------------------------------------------------


@register(
    "stats_gini",
    oracle="""
    WITH y AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS y_e2,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY floor(value * 100), event_id
             ) AS i
      FROM events
    ), s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(y_e2) AS BIGINT) AS sy,
             CAST(SUM(i * y_e2) AS BIGINT) AS siy
      FROM y GROUP BY event_type
    )
    SELECT event_type, n, sy,
           CAST(2 * siy - (n + 1) * sy AS DOUBLE)
             / CAST(n * sy AS DOUBLE) AS gini
    FROM s ORDER BY event_type
    """,
    doc="Gini inequality coefficient of value per event type via the "
    "exact rank formula G = (2*sum(i*y_i) - (n+1)*sum(y)) / "
    "(n*sum(y)) over ascending-sorted floor-e2 integers (ties broken "
    "by event_id — a total order, so both engines rank identically). "
    "One type-keyed exchange serves the ranking window AND the "
    "aggregate (same partitioning, no second shuffle); the two "
    "products stay in int64 to ~1e6 rows per group at this tape's "
    "value range, with decimal partials as the documented widening "
    "beyond. The inequality screen a curation pipeline runs on "
    "domain/token distributions before fixing mixture weights.",
    tags=("stats", "window", "scale-note:sufficient-statistics"),
)
def stats_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    y = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("y_e2"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("y_e2", "event_id")
    ranked = y.withColumn("i", F.row_number().over(w))
    s = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y_e2").cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("y_e2")).cast("bigint").alias("siy"),
    )
    gini = (
        (2 * F.col("siy") - (F.col("n") + 1) * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sy")).cast("double")
    )
    return s.select("event_type", "n", "sy", gini.alias("gini")).orderBy(
        "event_type"
    )


# --- agg_rfm_segments ---------------------------------------------------


@register(
    "agg_rfm_segments",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             MAX({_DAY_SQL}) AS last_day,
             COUNT(*) AS freq,
             CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS m_e2
      FROM events GROUP BY user_id
    ), q AS (
      SELECT user_id, m_e2,
             NTILE(4) OVER (ORDER BY last_day, user_id) AS r_q,
             NTILE(4) OVER (ORDER BY freq, user_id) AS f_q,
             NTILE(4) OVER (ORDER BY m_e2, user_id) AS m_q
      FROM u
    )
    SELECT CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS segment,
           COUNT(*) AS n_users,
           CAST(SUM(m_e2) AS BIGINT) AS sum_m_e2,
           CAST(SUM(m_e2) AS DOUBLE) / 100 / COUNT(*) AS avg_monetary
    FROM q GROUP BY 1 ORDER BY 1
    """,
    doc="RFM (recency/frequency/monetary) customer segmentation: one "
    "user-keyed aggregate computes last-active day, event count, and "
    "floor-e2 monetary sum, then three NTILE(4) quartile windows "
    "(each with a (metric, user_id) total order, so both engines "
    "assign identical buckets) produce the classic 4x4x4 segment "
    "code. Shape: the heavy pass is the map-side-combinable user "
    "aggregate over the events scan; the quartile windows run on the "
    "USER table — the ~2000x-smaller dimension — and the result is a "
    "<=64-row segment rollup. At 100 TB of events the user table is "
    "GB-scale; if users themselves outgrow a sort partition, the "
    "documented swap is percentile_disc cut points instead of NTILE.",
    tags=("agg", "analytics", "window", "scale-note:dimension-window"),
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.max(_day_idx()).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("m_e2"),
    )
    q = u.select(
        "m_e2",
        F.ntile(4).over(Window.orderBy("last_day", "user_id")).alias("r_q"),
        F.ntile(4).over(Window.orderBy("freq", "user_id")).alias("f_q"),
        F.ntile(4).over(Window.orderBy("m_e2", "user_id")).alias("m_q"),
    )
    return (
        q.groupBy(
            (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
            .cast("bigint")
            .alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("m_e2").cast("bigint").alias("sum_m_e2"),
            (F.sum("m_e2").cast("double") / 100 / F.count(F.lit(1))).alias(
                "avg_monetary"
            ),
        )
        .orderBy("segment")
    )


# --- win_top_paths ------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000  # the win_session 30-min inactivity gap



# the shared sessionize CTE chain (win_session 30-min-gap semantics,
# ONE definition) — consumers append their own CTEs after `sess`
_SESSIONIZE_SQL = f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS tu, event_id AS eid
      FROM events
    ), flagged AS (
      SELECT user_id, event_type, tu, eid,
             CASE WHEN tu - LAG(tu) OVER (
                    PARTITION BY user_id ORDER BY tu, eid
                  ) >= {_GAP_US}
                  OR LAG(tu) OVER (
                    PARTITION BY user_id ORDER BY tu, eid
                  ) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
    ), sess AS (
      SELECT user_id, event_type, tu, eid,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY tu, eid
             ) AS session_id
      FROM flagged
    )"""


def _sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a session_id column — the Spark twin of
    _SESSIONIZE_SQL's `sess` CTE (win_session gap semantics; the gap
    window and the running counter share one user-keyed exchange)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("tu"),
        F.col("event_id").alias("eid"),
    )
    w = Window.partitionBy("user_id").orderBy("tu", "eid")
    lag_tu = F.lag("tu").over(w)
    return ev.withColumn(
        "new_session",
        F.when(
            lag_tu.isNull() | (F.col("tu") - lag_tu >= _GAP_US), 1
        ).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w))


@register(
    "win_top_paths",
    oracle=_SESSIONIZE_SQL + """
    , paths AS (
      SELECT array_to_string(
               (list(event_type ORDER BY tu, eid))[1:5], '>'
             ) AS path
      FROM sess GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
    doc="Top user journeys: events are sessionized with the "
    "win_session 30-minute inactivity gap (same lag-flag running-sum "
    "construction), each session is reduced to the path string of its "
    "first five event types in (ts, event_id) order, and the 20 most "
    "common paths win (ties to the lexicographically smaller path — "
    "a total order, so the LIMIT is stable across engines). Shape: "
    "the gap window, the running session counter, and the "
    "per-session path fold all ride ONE user-keyed exchange; the "
    "path census is a map-side-combinable string aggregate and the "
    "final top-20 is TakeOrderedAndProject, never a global sort. "
    "The journey-census query every event warehouse ships; at 100 TB "
    "nothing after the single user exchange is event-sized.",
    tags=("window", "analytics", "funnel"),
)
def win_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = _sessionized(spark, sf_dir)
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("tu").alias("tu"),
                                F.col("eid").alias("eid"),
                                F.col("event_type").alias("et"),
                            )
                        )
                    ),
                    lambda x: x["et"],
                ),
                1,
                5,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


# --- agg_market_basket ---------------------------------------------------


@register(
    "agg_market_basket",
    oracle=_SESSIONIZE_SQL + """
    , items AS (
      SELECT DISTINCT user_id, session_id, event_type FROM sess
    ), tot AS (
      SELECT COUNT(DISTINCT (user_id, session_id)) AS n_sessions FROM items
    ), marg AS (
      SELECT event_type, COUNT(*) AS n FROM items GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             COUNT(*) AS n_pair
      FROM items a JOIN items b
        ON a.user_id = b.user_id AND a.session_id = b.session_id
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.item_a, p.item_b, p.n_pair, ma.n AS n_a, mb.n AS n_b,
           t.n_sessions,
           CAST(p.n_pair * 1000000 // t.n_sessions AS BIGINT)
             AS support_ppm,
           CAST(p.n_pair AS DOUBLE) * t.n_sessions / ma.n / mb.n AS lift
    FROM pairs p
    JOIN marg ma ON ma.event_type = p.item_a
    JOIN marg mb ON mb.event_type = p.item_b
    CROSS JOIN tot t
    ORDER BY p.item_a, p.item_b
    """,
    doc="Market-basket co-occurrence over sessionized events (the "
    "association-rules support/lift census): sessions via the "
    "win_session 30-minute gap, per-session DISTINCT item sets, pair "
    "counts from a session-keyed self-join with a lexicographic "
    "a < b dedup, and exact floor-ppm support plus lift = "
    "P(a,b)/(P(a)P(b)) as one fixed IEEE expression over four exact "
    "integers. Shape: the sessionize windows and the per-session "
    "distinct ride ONE user-keyed exchange; the self-join keys on "
    "(user, session) so both sides hang off co-partitioned item "
    "sets (items/session is bounded by the event-type vocabulary, "
    "never event-sized); marginals and the session total are "
    "broadcast-sized. At 100 TB the only data-sized move is the one "
    "user exchange.",
    tags=("agg", "analytics", "join"),
)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = _sessionized(spark, sf_dir)
    items = sess.select("user_id", "session_id", "event_type").distinct()
    tot = items.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    marg = items.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_id") == F.col("b.session_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    ma = marg.select(
        F.col("event_type").alias("item_a"), F.col("n").alias("n_a")
    )
    mb = marg.select(
        F.col("event_type").alias("item_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            "n_a",
            "n_b",
            "n_sessions",
            F.expr("n_pair * 1000000 div n_sessions")
            .cast("bigint")
            .alias("support_ppm"),
            (
                F.col("n_pair").cast("double")
                * F.col("n_sessions")
                / F.col("n_a")
                / F.col("n_b")
            ).alias("lift"),
        )
        .orderBy("item_a", "item_b")
    )


# --- win_time_to_convert --------------------------------------------------


@register(
    "win_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS first_purchase
      FROM events GROUP BY user_id
    ), durations AS (
      SELECT (first_purchase - first_signup) // 1000000 AS sec
      FROM firsts
      WHERE first_signup IS NOT NULL
        AND first_purchase IS NOT NULL
        AND first_purchase >= first_signup
    )
    SELECT COUNT(*) AS n_converted,
           CAST(quantile_disc(sec, 0.25) AS BIGINT) AS p25_sec,
           CAST(quantile_disc(sec, 0.50) AS BIGINT) AS p50_sec,
           CAST(quantile_disc(sec, 0.75) AS BIGINT) AS p75_sec,
           CAST(MAX(sec) AS BIGINT) AS max_sec
    FROM durations
    """,
    doc="Time-to-convert distribution: per user, seconds from FIRST "
    "signup to FIRST purchase (users whose first purchase precedes "
    "their first signup, or who never did both, are excluded), "
    "summarized as exact DISCRETE quartiles — percentile_disc selects "
    "an element, so no interpolation arithmetic can drift across "
    "engines; durations are integer epoch-second floors. Shape: one "
    "map-side-combinable user aggregate (two conditional MINs in one "
    "pass) then a single bounded quantile over the user-dimension "
    "durations — the conversion-latency report every growth team "
    "pairs with the funnel, at one user-keyed exchange.",
    tags=("window", "analytics", "stats"),
)
def win_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
        ).alias("first_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("first_purchase"),
    )
    durations = firsts.where(
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_signup"))
    ).select(
        F.expr("(first_purchase - first_signup) div 1000000").alias("sec")
    )
    durations.createOrReplaceTempView("ttc_durations")
    return spark.sql(
        """
        SELECT COUNT(*) AS n_converted,
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY sec)
                    AS BIGINT) AS p25_sec,
               CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY sec)
                    AS BIGINT) AS p50_sec,
               CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY sec)
                    AS BIGINT) AS p75_sec,
               CAST(MAX(sec) AS BIGINT) AS max_sec
        FROM ttc_durations
        """
    )
