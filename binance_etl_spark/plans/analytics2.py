"""Analytics batch 2: gaps-and-islands interval merging, seasonal
baseline deviation, and a partition-skew diagnostic.

- win_merge_intervals: merge overlapping per-key intervals (the
  gaps-and-islands problem) — coverage windows, maintenance-window
  compaction, session stitching over interval data.
- ts_seasonal_baseline: hour-of-day baseline per event type + each
  event's deviation — seasonality-aware monitoring (a CUSUM/z-score
  on raw values pages on every daily cycle; this is the fix).
- stats_partition_skew: the pre-flight skew check before a big
  join/agg — bucket the key by a portable hash and report the
  per-bucket share vs the heaviest bucket.

All arithmetic is bigint fixed point (epoch micros, e6 units, ppm);
integer div on the signed deviation truncates identically in both
engines (verified in llm_ops8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

_IV_US = 300 * 1_000_000  # each event spans [ts, ts + 5 minutes)


@register(
    "win_merge_intervals",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + {_IV_US} AS e
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_no
      FROM flagged
    )
    SELECT user_id, CAST(island_no AS BIGINT) AS island_no,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(MIN(s) AS BIGINT) AS island_start_us,
           CAST(MAX(e) AS BIGINT) AS island_end_us
    FROM islands GROUP BY user_id, island_no
    """,
    doc="GAPS-AND-ISLANDS: merge overlapping per-key intervals "
    "([ts, ts+5min) around each event) into maximal covered islands. "
    "The classic formulation — an island break is a start strictly "
    "past the running max of prior ends (running max, NOT lag(end): "
    "an earlier interval can outspan its successors) — as two stacked "
    "windows over ONE keyed sort + a grouped rollup. One shuffle; "
    "per-key islands parallelize across executors, the same plan at "
    "any scale.",
    tags=("window", "timeseries"),
)
def win_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _IV_US).alias("e"),
    )
    order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island_no",
        F.sum("new_island").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy("user_id", F.col("island_no").cast("bigint").alias("island_no")).agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.min("s").cast("bigint").alias("island_start_us"),
        F.max("e").cast("bigint").alias("island_end_us"),
    )


@register(
    "ts_seasonal_baseline",
    oracle="""
    WITH u AS (
      SELECT event_id, event_type, ts,
             CAST(hour(ts) AS BIGINT) AS hr,
             CAST(floor(value * 1000000) AS BIGINT) AS u6
      FROM events
    ), base AS (
      SELECT event_type, hr,
             CAST(SUM(u6) // COUNT(*) AS BIGINT) AS baseline_e6,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM u GROUP BY event_type, hr
    )
    SELECT u.event_id, u.event_type, u.hr, b.baseline_e6, b.n_obs,
           CAST((u.u6 - b.baseline_e6) * 1000000 // greatest(b.baseline_e6, 1)
             AS BIGINT) AS dev_ppm
    FROM u JOIN base b ON u.event_type = b.event_type AND u.hr = b.hr
    """,
    doc="SEASONALITY-AWARE monitoring baseline: per (event_type, "
    "hour-of-day) mean value (exact integer division of e6 sums), "
    "then every event's deviation from ITS seasonal slot in ppm — a "
    "flat threshold or CUSUM on raw values pages every daily peak; "
    "deviation-from-slot does not. One map-side-combinable aggregate "
    "(24 x types rows — broadcast back onto the stream at any scale) "
    "+ one narrow join projection.",
    tags=("timeseries", "monitoring"),
)
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    u = e.select(
        "event_id",
        "event_type",
        F.hour("ts").cast("bigint").alias("hr"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("u6"),
    )
    base = u.groupBy("event_type", "hr").agg(
        F.expr("SUM(u6) div COUNT(*)").alias("baseline_e6"),
        F.count("*").cast("bigint").alias("n_obs"),
    )
    return u.join(F.broadcast(base), ["event_type", "hr"]).select(
        "event_id",
        "event_type",
        "hr",
        "baseline_e6",
        "n_obs",
        F.expr("(u6 - baseline_e6) * 1000000 div greatest(baseline_e6, 1)").alias(
            "dev_ppm"
        ),
    )


_SKEW_BUCKETS = 32


@register(
    "stats_partition_skew",
    oracle=f"""
    WITH b AS (
      SELECT ((instr('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16
              + instr('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1)
               % {_SKEW_BUCKETS} AS bucket
      FROM events
    ), counts AS (
      SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY bucket
    )
    SELECT bucket, n,
           n * 1000000 // MAX(n) OVER () AS share_of_max_ppm
    FROM counts
    """,
    doc="PRE-FLIGHT SKEW DIAGNOSTIC: bucket the prospective "
    f"shuffle key into {_SKEW_BUCKETS} buckets via a PORTABLE hash "
    "(md5 first byte — engine-independent, unlike Spark's internal "
    "murmur) and report each bucket's share of the heaviest bucket. "
    "A flat profile -> safe to shuffle on the key; a spiked one -> "
    "salt or AQE-skew-split first (operators/skew.py). One map-side-"
    "combinable count; the final window runs over bucket-count rows.",
    tags=("diagnostics", "skew"),
)
def stats_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    byte0 = (
        (F.expr("instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING)), 1, 1))") - 1)
        * 16
        + F.expr("instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING)), 2, 1))")
        - 1
    )
    counts = (
        e.select((byte0 % _SKEW_BUCKETS).cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # the global window runs over bucket-count rows only (32), after
    # the map-side-combined aggregate — not over the event stream
    return (
        counts.withColumn("max_n", F.max("n").over(Window.partitionBy()))
        .select(
            "bucket",
            "n",
            F.expr("n * 1000000 div max_n").alias("share_of_max_ppm"),
        )
    )


# --- ts_downsample_lttb ----------------------------------------------

_LTTB_US = 600 * 1_000_000  # 10-minute buckets


@register(
    "ts_downsample_lttb",
    oracle=f"""
    WITH pt AS (
      SELECT user_id, event_id, epoch_us(ts) AS xus,
             epoch_us(ts) // 1000000 AS x,
             CAST(floor(value * 1000000) AS BIGINT) AS y,
             epoch_us(ts) // {_LTTB_US} AS bkt
      FROM events
    ), bm AS (
      SELECT user_id, bkt,
             SUM(x) // COUNT(*) AS mx, SUM(y) // COUNT(*) AS my
      FROM pt GROUP BY user_id, bkt
    ), nb AS (
      SELECT user_id, bkt,
             lag(mx)  OVER w AS ax, lag(my)  OVER w AS ay,
             lead(mx) OVER w AS cx, lead(my) OVER w AS cy
      FROM bm
      WINDOW w AS (PARTITION BY user_id ORDER BY bkt)
    ), scored AS (
      SELECT p.user_id, p.bkt, p.event_id, p.xus, p.x, p.y,
             abs( (COALESCE(n.ax, p.x) - COALESCE(n.cx, p.x)) * (p.y - COALESCE(n.ay, p.y))
                - (COALESCE(n.ax, p.x) - p.x) * (COALESCE(n.cy, p.y) - COALESCE(n.ay, p.y)) )
               AS area2,
             row_number() OVER (
               PARTITION BY p.user_id, p.bkt
               ORDER BY abs( (COALESCE(n.ax, p.x) - COALESCE(n.cx, p.x)) * (p.y - COALESCE(n.ay, p.y))
                           - (COALESCE(n.ax, p.x) - p.x) * (COALESCE(n.cy, p.y) - COALESCE(n.ay, p.y)) ) DESC,
                        p.x, p.event_id) AS rn
      FROM pt p JOIN nb n ON p.user_id = n.user_id AND p.bkt = n.bkt
    )
    SELECT user_id, CAST(bkt AS BIGINT) AS bkt, event_id,
           CAST(xus AS BIGINT) AS ts_us, CAST(y AS BIGINT) AS value_e6,
           CAST(area2 AS BIGINT) AS area2
    FROM scored WHERE rn = 1
    """,
    doc="LTTB-style visual DOWNSAMPLING (bucket-parallel variant): one "
    "representative point per (series, 10-min bucket) — the point "
    "maximizing the triangle area against the NEIGHBOR BUCKET MEANS "
    "(classic LTTB anchors the previously-selected point, which is "
    "sequential; the mean-anchored variant is embarrassingly parallel "
    "per bucket and is what TSDB render paths ship at scale). "
    "Integer cross-product areas in (seconds, e6) units — seconds, "
    "not micros, keep the cross products inside bigint at any series "
    "span; boundary buckets "
    "degrade to earliest-point (area 0 ties). Two keyed shuffles: "
    "bucket means, then the per-bucket rank.",
    tags=("timeseries", "window"),
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pt = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("xus"),
        F.expr("unix_micros(ts) div 1000000").alias("x"),
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("y"),
        F.expr(f"unix_micros(ts) div {_LTTB_US}").alias("bkt"),
    )
    bm = pt.groupBy("user_id", "bkt").agg(
        F.expr("SUM(x) div COUNT(*)").alias("mx"),
        F.expr("SUM(y) div COUNT(*)").alias("my"),
    )
    wb = Window.partitionBy("user_id").orderBy("bkt")
    nb = bm.select(
        "user_id",
        "bkt",
        F.lag("mx").over(wb).alias("ax"),
        F.lag("my").over(wb).alias("ay"),
        F.lead("mx").over(wb).alias("cx"),
        F.lead("my").over(wb).alias("cy"),
    )
    scored = pt.join(nb, ["user_id", "bkt"]).withColumn(
        "area2",
        F.expr(
            "abs( (COALESCE(ax, x) - COALESCE(cx, x)) * (y - COALESCE(ay, y))"
            "   - (COALESCE(ax, x) - x) * (COALESCE(cy, y) - COALESCE(ay, y)) )"
        ),
    )
    wr = Window.partitionBy("user_id", "bkt").orderBy(
        F.col("area2").desc(), "x", "event_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("bkt").cast("bigint").alias("bkt"),
            "event_id",
            F.col("xus").cast("bigint").alias("ts_us"),
            F.col("y").cast("bigint").alias("value_e6"),
            F.col("area2").cast("bigint").alias("area2"),
        )
    )
