"""Recursive SQL, entity resolution, and mergeable-sketch rollups.

Three capability classes the earlier modules don't cover:

- `sql_recursive_tree`: WITH RECURSIVE (Spark 4.1 + DuckDB both speak
  it) — iterative graph traversal expressed in ONE shared ANSI text,
  the declarative twin of the hand-rolled loops in operators/dedup.py
  (connected components) and operators/graph.py (pagerank). The
  recursion here is a hierarchy walk (org-chart / BOM shape): each
  round is one equi-join of the frontier against the node table, which
  Catalyst distributes like any other join; depth = O(log n) for the
  balanced tree derived below.

- `join_fuzzy_match`: blocked fuzzy-string entity resolution — the
  record-linkage step of every data-integration pipeline (match dirty
  catalog names against the clean master). Classic blocking strategy:
  candidate pairs ONLY within a cheap equi-join block (4-char prefix +
  length band), then the expensive edit-distance verify runs on
  candidates alone. Never O(n^2): at 100 TB the block key is the
  shuffle key and skew is bounded by block cardinality, exactly like
  dedup_minhash_lsh's band join (plans/llm_ops.py).

- `agg_hll_rollup`: the mergeable-sketch OLAP pattern — per-(group,
  day) HLL sketches unioned upward to any coarser grain WITHOUT
  re-scanning the fact table. This is the 100 TB way to serve distinct
  counts over arbitrary date ranges: sketches are fixed-size (KB),
  map-side combinable, and `hll_union_agg` makes them re-aggregable —
  the property exact COUNT(DISTINCT) fundamentally lacks. Approximate
  by design -> rows-only driver check + error-bound unit test
  (tests/test_approx.py pattern).

Reference provenance: the reference has no SQL surface at all
(SURVEY.md §3); these are DATA/NS extension operators for querying the
emitted tables and running dedup/linkage at corpus scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register, register_sql

# ---------------------------------------------------------------------------
# Recursive CTE: balanced-binary-tree walk over customer keys.
# parent(c) = floor(c/2) makes a complete binary tree rooted at 1 over
# c_custkey >= 1 — a deterministic hierarchy derived from data both
# engines already share. The recursive member touches the frontier once
# per level: O(log n) joins, each fully distributed.
# ---------------------------------------------------------------------------

register_sql(
    "sql_recursive_tree",
    """
    WITH RECURSIVE walk(node, depth, path_sum) AS (
        SELECT CAST(1 AS BIGINT), 0, CAST(1 AS BIGINT)
        UNION ALL
        SELECT c.c_custkey, w.depth + 1, w.path_sum + c.c_custkey
        FROM customer c
        JOIN walk w ON CAST(FLOOR(c.c_custkey / 2) AS BIGINT) = w.node
        WHERE c.c_custkey >= 2
    )
    SELECT depth,
           COUNT(*) AS n_nodes,
           MIN(node) AS min_node,
           MAX(node) AS max_node,
           CAST(SUM(path_sum) AS BIGINT) AS sum_path
    FROM walk
    GROUP BY depth
    ORDER BY depth
    """,
    doc="WITH RECURSIVE hierarchy walk (org-chart/BOM shape) over the "
    "floor(c/2) binary tree on customer keys; per-level node counts and "
    "root-path sums. One shared ANSI text on Spark 4.1 and DuckDB; each "
    "recursion level is one distributed equi-join of the frontier "
    "against customer, O(log n) levels total.",
    tags=("sql", "recursive", "iterative"),
)

# ---------------------------------------------------------------------------
# Blocked fuzzy match: dirty part names vs the clean name master.
# The dirty side is derived deterministically (last char replaced) so
# both engines agree on inputs; blocking key = (4-char prefix, length
# band) — candidates are an equi-join, the levenshtein verify runs on
# candidates only.
# ---------------------------------------------------------------------------

register_sql(
    "join_fuzzy_match",
    """
    WITH clean AS (
        SELECT DISTINCT p_name FROM part
    ),
    dirty AS (
        SELECT p_name AS src_name,
               CONCAT(SUBSTRING(p_name, 1, LENGTH(p_name) - 1), '_') AS dirty_name
        FROM clean
    ),
    cand AS (
        SELECT c.p_name, d.src_name, d.dirty_name
        FROM clean c
        JOIN dirty d
          ON SUBSTRING(c.p_name, 1, 4) = SUBSTRING(d.dirty_name, 1, 4)
         AND LENGTH(c.p_name) BETWEEN LENGTH(d.dirty_name) - 2
                                  AND LENGTH(d.dirty_name) + 2
    )
    SELECT p_name AS matched_name, dirty_name,
           levenshtein(p_name, dirty_name) AS edit_dist
    FROM cand
    WHERE levenshtein(p_name, dirty_name) <= 2
    ORDER BY dirty_name, matched_name
    """,
    doc="Blocked fuzzy-string entity resolution (record linkage): dirty "
    "catalog names (deterministic last-char corruption) matched to the "
    "clean master by 4-char-prefix + length-band BLOCKING equi-join, "
    "then levenshtein <= 2 verify on candidates only — never O(n^2). "
    "Shared ANSI text on both engines.",
    tags=("join", "fuzzy", "entity-resolution", "llm"),
)


# ---------------------------------------------------------------------------
# HLL sketch rollup: per-(event_type, day) sketches -> union to type
# totals. DataSketches HLL is EXACT below its sketch capacity (sparse
# mode stores raw coupons), and the verification corpus has 150
# distinct users per type << 2^12 slots — so the estimate provably
# equals COUNT(DISTINCT) at oracle scale and the query carries a full
# value oracle. At production cardinality it degrades gracefully to
# ~1.6% rse; tests/test_relational5.py bounds the error on a corpus
# 100x past the exact range.
# ---------------------------------------------------------------------------


@register(
    "agg_hll_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Mergeable-sketch distinct-count rollup: hll_sketch_agg(user_id) "
    "per (event_type, day), then hll_union_agg upward to per-type "
    "distinct-user estimates WITHOUT re-scanning the fact table — the "
    "re-aggregable 100 TB alternative to exact COUNT(DISTINCT) "
    "(fixed-KB sketches, map-side combinable). Sparse-mode sketches "
    "are exact below capacity, so the estimate carries a full value "
    "oracle at verification scale; error-bound test covers 100x past.",
    tags=("agg", "approx", "sketch"),
)
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    # The daily table is what a real deployment persists; any coarser
    # grain (weekly, total, arbitrary ranges) merges from it.
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Timezone conversion suite: market sessions live in exchange-local
# wall time (NYSE opens 09:30 America/New_York; Binance stamps UTC
# epoch millis, SURVEY.md §1.2) — converting the instant stream to
# exchange-local calendars is the first step of any session analysis.
# All conversions are narrow per-row expressions (no shuffle), and the
# outputs leave as epoch micros / small ints per the parity rules.
# ---------------------------------------------------------------------------


@register(
    "fn_tz_suite",
    oracle="""
    SELECT event_id,
           epoch_us(ts) AS utc_us,
           hour(timezone('America/New_York', timezone('UTC', ts))) AS ny_hour,
           hour(timezone('Asia/Tokyo', timezone('UTC', ts))) AS tokyo_hour,
           CAST(CAST(timezone('America/New_York', timezone('UTC', ts)) AS DATE) AS VARCHAR) AS ny_date,
           isodow(ts) AS iso_dow,
           epoch_us(timezone('America/New_York', timezone('UTC', ts))) AS ny_wall_us,
           CAST(CASE WHEN hour(timezone('America/New_York', timezone('UTC', ts))) * 60
                          + minute(timezone('America/New_York', timezone('UTC', ts)))
                          BETWEEN 570 AND 960
                      AND isodow(ts) <= 5
                     THEN 1 ELSE 0 END AS BIGINT) AS in_nyse_session
    FROM events
    WHERE event_id % 17 = 0
    ORDER BY event_id
    """,
    doc="Timezone-aware calendar surface: UTC instants -> exchange-local "
    "wall clocks (from_utc_timestamp twin of DuckDB's timezone()), "
    "NYSE trading-session flag (09:30-16:00 NY, Mon-Fri), ISO weekday. "
    "Narrow per-row expressions, codegen'd, shuffle-free — scale cost "
    "is exactly one scan at any data size.",
    tags=("scalar", "datetime", "timezone"),
)
def fn_tz_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tokyo = F.from_utc_timestamp("ts", "Asia/Tokyo")
    ny_min = F.hour(ny) * 60 + F.minute(ny)
    return ev.select(
        "event_id",
        F.unix_micros("ts").alias("utc_us"),
        F.hour(ny).cast("bigint").alias("ny_hour"),
        F.hour(tokyo).cast("bigint").alias("tokyo_hour"),
        ny.cast("date").cast("string").alias("ny_date"),
        (F.weekday("ts") + 1).cast("bigint").alias("iso_dow"),
        F.unix_micros(ny).alias("ny_wall_us"),
        F.when(
            ny_min.between(570, 960) & (F.weekday("ts") + 1 <= 5), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("in_nyse_session"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Distribution-drift monitoring: chi-square statistic between the first
# and second half of the event stream. The feed-health / training-data
# gate: "did the category mix shift?" Every input to the float math is
# an exact integer count, and each double expression is a single
# identical text on both engines -> bit-identical IEEE results without
# any cross-row float accumulation.
# ---------------------------------------------------------------------------

register_sql(
    "stats_chi2_drift",
    """
    WITH halves AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS obs1,
               CAST(SUM(CASE WHEN day(ts) > 15 THEN 1 ELSE 0 END) AS BIGINT) AS obs2
        FROM events
        GROUP BY event_type
    ),
    tot AS (
        SELECT event_type, obs1, obs2,
               CAST(SUM(obs1) OVER () AS BIGINT) AS t1,
               CAST(SUM(obs2) OVER () AS BIGINT) AS t2
        FROM halves
    )
    SELECT event_type, obs1, obs2,
           CAST(t2 AS DOUBLE) * CAST(obs1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS exp2,
           CASE WHEN obs1 = 0 THEN CAST(NULL AS DOUBLE)
                ELSE (CAST(obs2 AS DOUBLE) - CAST(t2 AS DOUBLE) * CAST(obs1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                   * (CAST(obs2 AS DOUBLE) - CAST(t2 AS DOUBLE) * CAST(obs1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                   / (CAST(t2 AS DOUBLE) * CAST(obs1 AS DOUBLE) / CAST(t1 AS DOUBLE))
           END AS chi2_contrib
    FROM tot
    ORDER BY event_type
    """,
    doc="Chi-square category-drift monitor: event_type mix of the first "
    "half-month vs the second, expected counts under the null, and each "
    "category's chi-square contribution. The standard train/serve and "
    "feed-health drift gate. One map-side-combinable aggregate over the "
    "stream + a category-cardinality window — shuffle volume is "
    "O(categories) at any fact scale. Float math: single-expression "
    "doubles from exact integer counts (no cross-row float sums), "
    "bit-identical on both engines. A category absent from the "
    "baseline half (obs1=0) is the strongest drift signal of all; its "
    "contribution is undefined (exp2=0), so the row stays visible "
    "with a NULL contribution on both engines instead of an "
    "engine-divergent Inf/NaN.",
    tags=("agg", "stats", "monitoring"),
)


# ---------------------------------------------------------------------------
# Map higher-order functions: the map half of the lambda surface
# (fn_hof_suite covers arrays). Maps are built deterministically from
# the parsed props payload, so every HOF result reduces to a scalar
# witness with a pure-arithmetic oracle.
# ---------------------------------------------------------------------------


@register(
    "fn_map_hof_suite",
    oracle="""
    WITH t AS (
        SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           CAST(6 * k AS BIGINT) AS tv_b,
           CAST((CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END)
                + 1
                + (CASE WHEN (k % 7) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_even_vals,
           CAST(k + 20 * k + 100 * (k % 7) AS BIGINT) AS zip_total,
           CAST(4 AS BIGINT) AS n_concat_keys
    FROM t
    ORDER BY event_id
    """,
    doc="Map higher-order functions — transform_values, map_filter, "
    "map_zip_with, map_concat — over maps derived from the parsed "
    "props payload; each HOF collapses to a scalar witness whose "
    "oracle is plain arithmetic on k. Narrow codegen'd expressions, "
    "zero shuffles (the map lambda surface the array HOF suite "
    "doesn't touch).",
    tags=("scalar", "map", "hof"),
)
def fn_map_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    k = F.from_json("props", "map<string,long>")["k"]
    e = e.select("event_id", k.alias("k"))
    m1 = F.create_map(
        F.lit("a"), F.col("k"),
        F.lit("b"), F.col("k") * 2,
        F.lit("c"), F.col("k") % 7,
    )
    m2 = F.create_map(
        F.lit("a"), F.lit(1).cast("long"),
        F.lit("b"), F.lit(10).cast("long"),
        F.lit("c"), F.lit(100).cast("long"),
    )
    tv = F.transform_values(m1, lambda _, v: v * 3)
    mf = F.map_filter(m1, lambda _, v: v % 2 == 0)
    mz = F.map_zip_with(m1, m2, lambda _, v1, v2: v1 * v2)
    mc = F.map_concat(m1, F.create_map(F.lit("d"), F.lit(5).cast("long")))
    return e.select(
        "event_id",
        F.element_at(tv, "b").alias("tv_b"),
        F.size(F.map_keys(mf)).cast("bigint").alias("n_even_vals"),
        F.aggregate(
            F.map_values(mz), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("zip_total"),
        F.size(F.map_keys(mc)).cast("bigint").alias("n_concat_keys"),
    ).orderBy("event_id")
