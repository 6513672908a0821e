"""Time-series maintenance operators: gap-fill + forward-fill resampling,
CDC latest-state compaction, and skew-salted aggregation.

These are the queries a market-data consumer runs over the reference's
output tables (SURVEY.md §2 DATA provenance): the depth table is a
sparse delta stream — "book state at time T" requires filling the
buckets where nothing changed with the last known value (the batch twin
of the streaming book state in streaming/book_sync.py), and "current
book" is the latest-row-per-key compaction (reference book semantics:
last update wins per price level, qty=0 deletes —
spot_depth_etl.py:98-100 / README.md:60).

Scale notes: the spine is generated per key with `sequence()` —
distributed, never a driver loop; forward-fill is one window per key
(state = one value per key); compaction is row_number=1 per key, which
Spark runs as one shuffle + per-partition sort, and at 100 TB is the
standard "merge-on-read view" plan. Salted aggregation splits hot keys
across `n_salts` partial groups so a single hot symbol cannot create a
straggler reducer (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.functions.parity import dec, dsum, sql_dsum
from binance_etl_spark.plans.registry import register

# 6-hour buckets over the 30-day events table: ~2 events per user-bucket
# on average, with plenty of empty buckets to prove the fill path.
_BKT_US = 21_600 * 1_000_000


@register(
    "ts_resample_ffill",
    oracle=f"""
    WITH pb AS (
      SELECT user_id, epoch_us(ts) // {_BKT_US} AS bkt, value,
             row_number() OVER (PARTITION BY user_id, epoch_us(ts) // {_BKT_US}
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    lastv AS (SELECT user_id, bkt, value FROM pb WHERE rn = 1),
    bounds AS (SELECT user_id, MIN(bkt) AS b0, MAX(bkt) AS b1
               FROM lastv GROUP BY user_id),
    spine AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bkt FROM bounds)
    SELECT s.user_id, s.bkt,
           last_value(l.value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.bkt
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
           (l.value IS NULL) AS filled
    FROM spine s
    LEFT JOIN lastv l ON l.user_id = s.user_id AND l.bkt = s.bkt
    """,
    doc="Resample-to-grid with forward fill: per user, a dense 6-hour "
    "bucket spine from first to last observation (sequence + explode — "
    "generated inside executors, O(1) driver work), left-joined with the "
    "last value per occupied bucket (row_number desc = 1), gaps filled "
    "by last(value, ignorenulls) over an unbounded-preceding frame. "
    "This is 'book state at time T' for the reference's sparse delta "
    "table. `filled` marks synthesized rows. Value is carried verbatim "
    "(no arithmetic) so double parity is exact.",
    tags=("timeseries", "window", "join"),
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value",
        F.expr(f"unix_micros(ts) div {_BKT_US}").alias("bkt"),
    )
    w_last = Window.partitionBy("user_id", "bkt").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    # Materialize once (eager localCheckpoint): lastv feeds BOTH the
    # spine bounds and the join probe side — without this the plan
    # duplicates the subtree and scans the fact table twice.
    lastv = (
        e.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("user_id", "bkt", "value")
        .localCheckpoint(eager=True)
    )
    spine = (
        lastv.groupBy("user_id")
        .agg(F.min("bkt").alias("b0"), F.max("bkt").alias("b1"))
        .select("user_id", F.explode(F.sequence("b0", "b1")).alias("bkt"))
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(lastv, ["user_id", "bkt"], "left")
    return joined.select(
        "user_id",
        "bkt",
        F.last("value", ignorenulls=True).over(w_fill).alias("value_ffill"),
        F.col("value").isNull().alias("filled"),
    )


@register(
    "upsert_latest",
    oracle="""
    SELECT user_id, event_type, event_id AS last_event_id,
           value AS last_value, epoch_us(ts) AS ts_us
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    doc="CDC latest-state compaction (merge-on-read 'current book' "
    "view): one row per (user_id, event_type) — the newest by (ts, "
    "event_id). The reference's book semantics are exactly this per "
    "(side, price) level (spot_depth_etl.py:98-100: last update wins, "
    "qty=0 deletes). One shuffle + per-partition sort; at 100 TB this "
    "is the standard upsert-view plan over an append-only log.",
    tags=("timeseries", "window", "dedup"),
)
def upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("value").alias("last_value"),
            F.unix_micros("ts").alias("ts_us"),
        )
    )


@register(
    "agg_skew_salted",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Skew-resistant grouped aggregation through "
    "operators/skew.py::salted_agg: each group key is sharded into 8 "
    "salted sub-keys (xxhash64 of the high-cardinality l_orderkey), "
    "partially aggregated, then merged — identical results to the plain "
    "GROUP BY oracle because sum/count are merge-decomposable and the "
    "partials are exact decimals. At 100 TB this bounds any reducer at "
    "1/8th of the hottest key instead of all of it.",
    tags=("agg", "skew"),
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.skew import salted_agg

    li = load(spark, sf_dir, "lineitem")
    # Partials stay DECIMAL (exact, order-free merge); only the final
    # output casts to double — a double partial would make the per-salt
    # merge order-dependent.
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "n": ("sum", F.count(F.lit(1))),
            "sum_qty": ("sum", F.sum(dec("l_quantity"))),
            "sum_price": ("sum", F.sum(dec("l_extendedprice"))),
        },
        n_salts=8,
        salt_src="l_orderkey",
    )
    return out.select(
        "l_returnflag",
        "n",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_price").cast("double").alias("sum_price"),
    )


@register(
    "ts_scd2_history",
    oracle="""
    SELECT user_id, event_type, event_id,
           epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS valid_to_us,
           (lead(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) IS NULL) AS is_current
    FROM events
    """,
    doc="SCD type-2 history view: each change event becomes a validity "
    "interval [valid_from, valid_to) via lead() per (user, event_type); "
    "the open-ended latest row is flagged is_current. The warehouse twin "
    "of upsert_latest (which keeps only the current row): the same "
    "append-only log becomes a point-in-time-queryable dimension with "
    "ONE window pass — no self-join, one shuffle on the key. This is "
    "how 'book state as of T' generalizes to slowly-changing reference "
    "data at 100 TB.",
    tags=("timeseries", "window"),
)
def ts_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead(F.unix_micros("ts")).over(w)
    return e.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


# Shared linear-interpolation formula — identical text both engines, so
# IEEE evaluation order matches exactly.
_INTERP = (
    "CASE WHEN v1 IS NULL OR b1 = b0 THEN v0 "
    "ELSE v0 + (v1 - v0) * ((bkt - b0) / (b1 - b0)) END"
)


@register(
    "ts_interp_linear",
    oracle=f"""
    WITH pb AS (
      SELECT user_id, epoch_us(ts) // {_BKT_US} AS bkt, value,
             row_number() OVER (PARTITION BY user_id, epoch_us(ts) // {_BKT_US}
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    lastv AS (SELECT user_id, bkt, value FROM pb WHERE rn = 1),
    bounds AS (SELECT user_id, MIN(bkt) AS b0, MAX(bkt) AS b1
               FROM lastv GROUP BY user_id),
    spine AS (SELECT user_id, unnest(generate_series(b0, b1)) AS bkt FROM bounds),
    framed AS (
      SELECT s.user_id, s.bkt,
             last_value(l.value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
             last_value(CASE WHEN l.value IS NOT NULL THEN s.bkt END IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.bkt
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b0,
             first_value(l.value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bkt
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
             first_value(CASE WHEN l.value IS NOT NULL THEN s.bkt END IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.bkt
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS b1,
             (l.value IS NULL) AS filled
      FROM spine s
      LEFT JOIN lastv l ON l.user_id = s.user_id AND l.bkt = s.bkt
    )
    SELECT user_id, bkt, {_INTERP} AS value_interp, filled
    FROM framed
    """,
    doc="Resample-to-grid with LINEAR interpolation: same dense spine "
    "as ts_resample_ffill, but gaps take "
    "v0 + (v1-v0) * (bkt-b0)/(b1-b0) between the surrounding "
    "observations (two IGNORE NULLS window passes: last-preceding and "
    "first-following value+bucket). The interpolation formula is ONE "
    "shared text on both engines, so IEEE ordering is identical and "
    "parity is exact. Tail rows past the last observation fall back to "
    "forward-fill. Two window passes over the spine, no extra joins — "
    "the missing-sensor-reading fill at any scale.",
    tags=("timeseries", "window", "join"),
)
def ts_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value",
        F.expr(f"unix_micros(ts) div {_BKT_US}").alias("bkt"),
    )
    w_last = Window.partitionBy("user_id", "bkt").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    lastv = (
        e.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("user_id", "bkt", "value")
        .localCheckpoint(eager=True)
    )
    spine = (
        lastv.groupBy("user_id")
        .agg(F.min("bkt").alias("b0"), F.max("bkt").alias("b1"))
        .select("user_id", F.explode(F.sequence("b0", "b1")).alias("bkt"))
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("bkt")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    occupied_bkt = F.when(F.col("value").isNotNull(), F.col("bkt"))
    framed = (
        spine.join(lastv, ["user_id", "bkt"], "left")
        .select(
            "user_id",
            "bkt",
            F.last("value", ignorenulls=True).over(w_prev).alias("v0"),
            F.last(occupied_bkt, ignorenulls=True).over(w_prev).alias("b0"),
            F.first("value", ignorenulls=True).over(w_next).alias("v1"),
            F.first(occupied_bkt, ignorenulls=True).over(w_next).alias("b1"),
            F.col("value").isNull().alias("filled"),
        )
    )
    return framed.select(
        "user_id", "bkt", F.expr(_INTERP).alias("value_interp"), "filled"
    )


@register(
    "win_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS mv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS mp
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.mv
      GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_viewers,
           COUNT(p.mp) AS n_converted,
           CAST(SUM(CASE WHEN epoch_us(p.mp) - epoch_us(v.mv)
                              <= 86400000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted_24h
    FROM v LEFT JOIN p ON p.user_id = v.user_id
    """,
    doc="Funnel conversion (view -> purchase): per user, first view "
    "then first purchase at-or-after it; counts total viewers, "
    "converters, and 24h converters. Two grouped mins + one broadcast-"
    "able dim-sized join — never a per-user subquery; event-time "
    "deltas compared in integer microseconds. The product-analytics "
    "staple over the reference's event-log shape.",
    tags=("window", "funnel", "agg"),
)
def win_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("mv"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("mv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("mp"))
    )
    j = v.join(p, "user_id", "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.count("mp").alias("n_converted"),
        F.sum(
            F.when(
                F.unix_micros("mp") - F.unix_micros("mv") <= 86_400_000_000, 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_converted_24h"),
    )


def _register_outlier_mad() -> None:
    from binance_etl_spark.plans.registry import register_sql

    register_sql(
        "ts_outlier_mad",
        """
        WITH ranked AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM events
        ), med AS (
          SELECT user_id,
                 MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                          THEN value END) AS med
          FROM ranked GROUP BY user_id
        ), dev AS (
          SELECT e.user_id, e.event_id, e.value, m.med,
                 abs(e.value - m.med) AS adev
          FROM events e JOIN med m USING (user_id)
        ), ranked2 AS (
          SELECT user_id, event_id, value, med, adev,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY adev, event_id) AS rn2,
                 COUNT(*) OVER (PARTITION BY user_id) AS n2
          FROM dev
        ), mad AS (
          SELECT user_id,
                 MAX(CASE WHEN rn2 = CAST(ceil(0.5 * n2) AS BIGINT)
                          THEN adev END) AS mad
          FROM ranked2 GROUP BY user_id
        )
        SELECT d.user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN m.mad > 0 AND d.adev > 5 * m.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(MAX(d.med) AS DOUBLE) AS med,
               CAST(MAX(m.mad) AS DOUBLE) AS mad
        FROM dev d JOIN mad m USING (user_id)
        GROUP BY d.user_id
        """,
        doc="Robust per-key outlier detection via median/MAD — the "
        "data-cleaning gate that, unlike mean/stddev z-scores, is not "
        "itself dragged by the outliers it hunts. Medians are EXACT "
        "discrete percentiles (value at ceil(n/2) under a unique "
        "ordering — the agg_percentile_disc technique), so both "
        "engines agree bit-for-bit where interpolated quantiles would "
        "drift. Two partitioned window passes + two broadcast-joined "
        "per-key aggregates; all windows are per-user (never global), "
        "the shape that scales.",
        tags=("timeseries", "stats", "sql", "window"),
    )


_register_outlier_mad()


_RES_US = (60_000_000, 600_000_000, 3_600_000_000)  # 1m / 10m / 1h


@register(
    "agg_multires_rollup",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             epoch_us(ts) // {_RES_US[0]} * {_RES_US[0]} AS m_us,
             epoch_us(ts) // {_RES_US[1]} * {_RES_US[1]} AS t_us,
             epoch_us(ts) // {_RES_US[2]} * {_RES_US[2]} AS h_us,
             CAST(floor(value * 1000000) AS BIGINT) AS v6
      FROM events
    )
    SELECT CASE WHEN m_us IS NOT NULL THEN '1m'
                WHEN t_us IS NOT NULL THEN '10m' ELSE '1h' END AS resolution,
           coalesce(m_us, t_us, h_us) AS bucket_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(v6) AS BIGINT) AS sum_v_e6
    FROM b
    GROUP BY GROUPING SETS ((m_us, event_type), (t_us, event_type), (h_us, event_type))
    """,
    doc="Hypertable-style MULTI-RESOLUTION rollup: 1m/10m/1h continuous "
    "aggregates for every event type computed in ONE scan via GROUPING "
    "SETS (the timescale-continuous-aggregate shape). Buckets are pure "
    "integer epoch-micros floors (engine-identical); values aggregate "
    "as exact e6 fixed point. Spark expands the sets map-side, so the "
    "single shuffle carries partial aggregates for all three "
    "resolutions — vs 3x the scan cost for a union-of-aggs plan.",
    tags=("agg", "timeseries", "rollup"),
)
def agg_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    b = e.select(
        "event_type",
        *[
            (us - us % r).alias(a)
            for a, r in zip(("m_us", "t_us", "h_us"), _RES_US)
        ],
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("v6"),
    )
    g = b.groupingSets(
        [["m_us", "event_type"], ["t_us", "event_type"], ["h_us", "event_type"]],
        "m_us",
        "t_us",
        "h_us",
        "event_type",
    ).agg(F.count("*").alias("n"), F.sum("v6").cast("bigint").alias("sum_v_e6"))
    res = (
        F.when(F.col("m_us").isNotNull(), "1m")
        .when(F.col("t_us").isNotNull(), "10m")
        .otherwise("1h")
    )
    return g.select(
        res.alias("resolution"),
        F.coalesce("m_us", "t_us", "h_us").alias("bucket_us"),
        "event_type",
        "n",
        "sum_v_e6",
    )


# --- join_pit_features ------------------------------------------------


@register(
    "join_pit_features",
    oracle="""
    WITH p AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id, ts, value FROM p WHERE rn = 1
    ), f AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT f.event_id, f.user_id, epoch_us(f.ts) AS ts_us,
           v.value AS feat_value,
           epoch_us(f.ts) - epoch_us(v.ts) AS feat_age_us
    FROM f ASOF LEFT JOIN v ON f.user_id = v.user_id AND f.ts >= v.ts
    """,
    doc="Point-in-time feature join — the training-set assembly join "
    "that prevents label leakage: each fact (view) is enriched with "
    "the feature VERSION that was valid at the fact's own timestamp "
    "(the user's latest prior purchase value), never a later one. "
    "Versions are deduped to one per (user, ts) first (max event_id "
    "wins — deterministic in both engines), then attached via the "
    "as-of operator (operators/asof.py: union + last(ignorenulls) "
    "window — rows stay O(|facts| + |versions|), one shuffle on "
    "user_id, NO interval range-join explosion). feat_age_us exposes "
    "version staleness for feature-freshness monitoring. At 100 TB "
    "this is the feature-store read path: fact stream x SCD2 "
    "dimension history (ts_scd2_history is the build side).",
    tags=("join", "asof", "llm", "timeseries"),
)
def join_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    versions = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    facts = e.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        facts,
        versions,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts", "value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("asof_value").alias("feat_value"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).alias("feat_age_us"),
    )


# --- ts_downsample_m4 ---------------------------------------------------

_M4_US = 600 * 1_000_000  # 10-minute pixel buckets


@register(
    "ts_downsample_m4",
    oracle=f"""
    WITH pt AS (
      SELECT user_id, event_id AS eid, epoch_us(ts) // 1000000 AS x,
             CAST(floor(value * 1000000) AS BIGINT) AS y,
             epoch_us(ts) // {_M4_US} AS bkt
      FROM events
    ), rk AS (
      SELECT user_id, bkt, x, y,
             row_number() OVER (PARTITION BY user_id, bkt
                                ORDER BY x, eid) AS rn_first,
             row_number() OVER (PARTITION BY user_id, bkt
                                ORDER BY x DESC, eid DESC) AS rn_last,
             row_number() OVER (PARTITION BY user_id, bkt
                                ORDER BY y, x, eid) AS rn_min,
             row_number() OVER (PARTITION BY user_id, bkt
                                ORDER BY y DESC, x, eid) AS rn_max
      FROM pt
    )
    SELECT user_id, CAST(bkt AS BIGINT) AS bkt, COUNT(*) AS n,
           CAST(MAX(CASE WHEN rn_first = 1 THEN y END) AS BIGINT)
             AS first_y,
           CAST(MAX(CASE WHEN rn_min = 1 THEN y END) AS BIGINT) AS min_y,
           CAST(MAX(CASE WHEN rn_max = 1 THEN y END) AS BIGINT) AS max_y,
           CAST(MAX(CASE WHEN rn_last = 1 THEN y END) AS BIGINT) AS last_y
    FROM rk GROUP BY user_id, bkt
    ORDER BY user_id, bkt
    """,
    doc="M4 time-series downsampling (Jugel et al. 2014 — the "
    "error-free visualization aggregation): per series and pixel "
    "bucket keep exactly the first/min/max/last points, which is "
    "sufficient to render a pixel-perfect line chart at that width; "
    "the companion to ts_downsample_lttb (LTTB is perceptual, M4 is "
    "lossless for min/max envelopes — dashboards run M4). Selection "
    "ties are pinned by (x, event_id) via ROW_NUMBER on BOTH engines "
    "(DuckDB arg_min cannot take a composite ordering key), values "
    "are floor-e6 integers. 100 TB shape: all four rankings ride ONE "
    "(series, bucket)-keyed exchange, then a combinable conditional "
    "aggregate — the output is 4 points per pixel regardless of "
    "input size.",
    tags=("timeseries", "window"),
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pt = e.select(
        "user_id",
        F.col("event_id").alias("eid"),
        F.expr("unix_micros(ts) div 1000000").alias("x"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("y"),
        F.expr(f"unix_micros(ts) div {_M4_US}").alias("bkt"),
    )
    wb = Window.partitionBy("user_id", "bkt")
    rk = pt.select(
        "user_id",
        "bkt",
        "y",
        F.row_number().over(wb.orderBy("x", "eid")).alias("rn_first"),
        F.row_number()
        .over(wb.orderBy(F.desc("x"), F.desc("eid")))
        .alias("rn_last"),
        F.row_number().over(wb.orderBy("y", "x", "eid")).alias("rn_min"),
        F.row_number()
        .over(wb.orderBy(F.desc("y"), F.asc("x"), F.asc("eid")))
        .alias("rn_max"),
    )
    return (
        rk.groupBy("user_id", F.col("bkt").cast("bigint").alias("bkt"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.when(F.col("rn_first") == 1, F.col("y")))
            .cast("bigint")
            .alias("first_y"),
            F.max(F.when(F.col("rn_min") == 1, F.col("y")))
            .cast("bigint")
            .alias("min_y"),
            F.max(F.when(F.col("rn_max") == 1, F.col("y")))
            .cast("bigint")
            .alias("max_y"),
            F.max(F.when(F.col("rn_last") == 1, F.col("y")))
            .cast("bigint")
            .alias("last_y"),
        )
        .orderBy("user_id", "bkt")
    )
