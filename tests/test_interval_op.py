"""Bucketed interval join must equal the naive range join exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.operators.interval import interval_join_bucketed, interval_join_naive


def _norm(df, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_bucketed_equals_naive_inner(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    cols = ["event_id", "r_event_id"]
    b = interval_join_bucketed(purchases, clicks, "user_id", "ts", "ts", "30 minutes")
    n = interval_join_naive(purchases, clicks, "user_id", "ts", "ts", "30 minutes")
    assert _norm(b, cols) == _norm(n, cols)
    assert b.count() > 0  # non-vacuous


def test_bucketed_equals_naive_left(spark, sf_dir):
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 30)
    purchases = e.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    cols = ["event_id", "r_event_id"]
    b = interval_join_bucketed(purchases, clicks, "user_id", "ts", "ts", "10 minutes", "left")
    n = interval_join_naive(purchases, clicks, "user_id", "ts", "ts", "10 minutes", "left")
    assert _norm(b, cols) == _norm(n, cols)
    # left join keeps unmatched purchases exactly once
    assert b.where(F.col("r_event_id").isNull()).count() == n.where(
        F.col("r_event_id").isNull()
    ).count()


def test_bucketed_left_with_null_columns(spark, sf_dir):
    # Round-1 advisory: a NULL in any LEFT column broke the anti-join
    # (plain equality never matches NULL), re-emitting matched rows as
    # fabricated misses. Nullable payload column exercises eqNullSafe.
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 30)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 2 == 0, F.col("value")).alias("maybe_null"),
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    cols = ["event_id", "maybe_null", "r_event_id"]
    b = interval_join_bucketed(purchases, clicks, "user_id", "ts", "ts", "10 minutes", "left")
    n = interval_join_naive(purchases, clicks, "user_id", "ts", "ts", "10 minutes", "left")
    assert purchases.where(F.col("maybe_null").isNull()).count() > 0  # non-vacuous
    assert _norm(b, cols) == _norm(n, cols)
