"""Product-analytics composites over the events stream: ordered funnel
conversion and cohort retention — the two queries every event
warehouse ships as first-class features (and classic MATCH_RECOGNIZE
/ retention-matrix workloads re-expressed Spark-first).

Cross-engine discipline: event ordering is (ts, event_id) — event_id
is the unique tie-break the registry rules require; timestamps enter
the math as integer epoch units only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register

_FUNNEL = ["signup", "view", "click", "purchase"]
_WEEK = 604800


# --- win_funnel_steps --------------------------------------------------


@register(
    "win_funnel_steps",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list(CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
                       WHEN 'click' THEN 3 WHEN 'purchase' THEN 4 END
                  ORDER BY ts, event_id) AS evs
      FROM events
      WHERE event_type IN ('signup', 'view', 'click', 'purchase')
      GROUP BY user_id
    ), st AS (
      SELECT user_id,
             list_reduce(list_prepend(0, evs),
                         (acc, x) -> CASE WHEN x = acc + 1 THEN acc + 1
                                          ELSE acc END) AS step
      FROM seq
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN step >= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_signup,
           CAST(SUM(CASE WHEN step >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view,
           CAST(SUM(CASE WHEN step >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_click,
           CAST(SUM(CASE WHEN step >= 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchase
    FROM st
    """,
    doc="Ordered funnel conversion (signup -> view -> click -> "
    "purchase): per user, the greedy earliest-match walk of the event "
    "sequence — step k+1 counts only if it occurs strictly after the "
    "event that satisfied step k (the MATCH_RECOGNIZE / ClickHouse "
    "windowFunnel semantic). ONE keyed shuffle: groupBy(user) with a "
    "(ts, event_id)-sorted collect, then a JVM higher-order fold "
    "carries the per-user state machine — no self-joins, no Python "
    "UDF (oracle: the identical fold via DuckDB list_reduce). "
    "Per-user sequences are retention-bounded in practice; at 100 TB "
    "the shape is scan -> one user-keyed exchange -> O(events/user) "
    "fold -> single-row global agg.",
    tags=("window", "analytics", "funnel"),
)
def win_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(_FUNNEL)
    )
    code = (
        F.when(F.col("event_type") == "signup", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "click", 3)
        .when(F.col("event_type") == "purchase", 4)
    )
    seq = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("tu"),
                    F.col("event_id").alias("eid"),
                    code.alias("c"),
                )
            )
        ).alias("evs")
    )
    step = F.aggregate(
        F.col("evs"),
        F.lit(0),
        lambda acc, x: F.when(x["c"] == acc + 1, acc + 1).otherwise(acc),
    )
    st = seq.select(step.alias("step"))
    return st.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("step") >= 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_signup"),
        F.sum(F.when(F.col("step") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_view"),
        F.sum(F.when(F.col("step") >= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_click"),
        F.sum(F.when(F.col("step") >= 4, 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchase"),
    )


# --- agg_cohort_retention ----------------------------------------------


@register(
    "agg_cohort_retention",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / {_WEEK}) AS BIGINT) AS w
      FROM events
    ), aw AS (
      SELECT DISTINCT user_id, w FROM e
    ), fw AS (
      SELECT user_id, min(w) AS cw FROM aw GROUP BY user_id
    )
    SELECT fw.cw AS cohort_week, aw.w - fw.cw AS week_offset,
           COUNT(*) AS n_users
    FROM aw JOIN fw ON aw.user_id = fw.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Cohort retention matrix: users cohorted by the week of their "
    "first event, counted as retained at each later week they were "
    "active in. Weeks are integer epoch-week buckets (no calendar "
    "WEEK semantics to disagree across engines). Shape: one distinct "
    "on (user, week) — map-side combinable — a per-user min, and a "
    "user-keyed join both sides of which hang off the SAME exchange "
    "(co-partitioned, no data-sized broadcast), then a tiny "
    "(cohort, offset) aggregate. Survives 100x users unchanged.",
    tags=("agg", "analytics", "join"),
)
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("ts").cast("double").cast("long") / _WEEK)
        .cast("bigint")
        .alias("w"),
    )
    aw = e.distinct()
    fw = aw.groupBy("user_id").agg(F.min("w").alias("cw"))
    return (
        aw.join(fw, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("w") - F.col("cw")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
