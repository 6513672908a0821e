"""Structural invariants of the round-7 third-wave operators
(plans/analytics4.py + the reworked MMR re-rank) — conservation laws
and bounds that must hold on ANY input, complementing the exact
DuckDB-oracle parity (which pins the values on THIS input)."""

from __future__ import annotations

import duckdb
import pytest

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module", autouse=True)
def _loaded():
    _ensure_loaded()


def _rows(spark, name):
    return REGISTRY[name].fn(spark, SF).collect()


def _n_attributed_conversions() -> int:
    """Ground truth, independently of the operator: conversions that
    have at least one strictly-earlier touch by the same user."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    # a purchase is an attributed conversion iff the user has a touch
    # whose next-purchase (by (ts, event_id) order) is that purchase —
    # equivalently: count distinct next-conversion groups over touches
    [(n,)] = con.execute(
        """
        WITH marked AS (
          SELECT user_id, event_type,
                 MIN(CASE WHEN event_type = 'purchase'
                          THEN epoch_us(ts) END) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
                 ) AS nc
          FROM events
        )
        SELECT COUNT(DISTINCT (user_id, nc)) FROM marked
        WHERE event_type IN ('click', 'signup', 'view') AND nc IS NOT NULL
        """
    ).fetchall()
    return n


def test_attribution_conservation(spark):
    """Each attributed conversion hands out exactly one first-touch
    credit, one last-touch credit, and <= 1e6 ppm of linear credit
    (floor rounding only ever loses ppm, never creates it)."""
    rows = _rows(spark, "win_attribution")
    n_conv = _n_attributed_conversions()
    assert sum(r["first_touch"] for r in rows) == n_conv
    assert sum(r["last_touch"] for r in rows) == n_conv
    total_ppm = sum(r["linear_ppm"] for r in rows)
    assert total_ppm <= n_conv * 1_000_000
    # floor(1e6/n)*n >= 1e6 - n + 1 per conversion; touches/conversion
    # is tape-bounded, so the loss is a tiny fraction
    assert total_ppm > n_conv * 900_000


def test_gini_bounds(spark):
    """0 <= G < 1 for non-negative values, and n/sums positive."""
    rows = _rows(spark, "stats_gini")
    assert rows
    for r in rows:
        assert r["n"] > 0 and r["sy"] > 0
        assert 0.0 <= r["gini"] < 1.0


def test_rfm_segments_partition_users(spark):
    """Segment user counts sum to the distinct-user total; every code
    is a valid 4x4x4 cell; quartile buckets are near-balanced (NTILE
    guarantees sizes differ by at most 1 per metric)."""
    rows = _rows(spark, "agg_rfm_segments")
    con = duckdb.connect()
    [(n_users,)] = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchall()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        d1, d2, d3 = r["segment"] // 100, r["segment"] // 10 % 10, r["segment"] % 10
        assert 1 <= d1 <= 4 and 1 <= d2 <= 4 and 1 <= d3 <= 4
        assert r["n_users"] > 0
    # per-metric marginals: each quartile holds floor/ceil(n/4) users
    for pick in (lambda s: s // 100, lambda s: s // 10 % 10, lambda s: s % 10):
        marg = {}
        for r in rows:
            marg[pick(r["segment"])] = marg.get(pick(r["segment"]), 0) + r["n_users"]
        assert sum(marg.values()) == n_users
        assert max(marg.values()) - min(marg.values()) <= 1


def test_benford_complete_and_ppm_bounded(spark):
    """All nine digits present exactly once; observed ppm sums to at
    most 1e6 (floor loses at most 8 ppm across nine digits)."""
    rows = _rows(spark, "dq_benford")
    assert [r["digit"] for r in rows] == list(range(1, 10))
    tot_ppm = sum(r["obs_ppm"] for r in rows)
    assert 1_000_000 - 8 <= tot_ppm <= 1_000_000
    for r in rows:
        assert r["dev_ppm"] == abs(r["obs_ppm"] - r["exp_ppm"])


def test_ols_sums_consistent(spark):
    """The emitted sufficient statistics reproduce the emitted slope
    and intercept exactly (the derivation is a pure function of the
    five integers), and sxx*n - sx^2 > 0 (x is non-degenerate)."""
    rows = _rows(spark, "stats_ols_group")
    for r in rows:
        den = r["n"] * r["sxx"] - r["sx"] * r["sx"]
        assert den > 0
        slope = float(r["n"] * r["sxy"] - r["sx"] * r["sy"]) / float(den) / 100
        assert r["slope"] == slope
        intercept = (r["sy"] / 100 - slope * r["sx"]) / r["n"]
        assert r["intercept"] == intercept


def test_top_paths_counts_positive_and_sorted(spark):
    rows = _rows(spark, "win_top_paths")
    assert 0 < len(rows) <= 20
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= 5
        assert all(s for s in steps)


def test_mmr_picks_distinct_and_first_is_top_sim(spark):
    """5 distinct picks; rank-1 is the highest-similarity candidate
    (MMR with an empty selected set reduces to pure relevance)."""
    rows = _rows(spark, "sim_mmr_topk")
    assert len(rows) == 5
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 5
    assert [r["pick_rank"] for r in rows] == [1, 2, 3, 4, 5]
    # the query vector itself (vec_id 0, sim 1.0) must be pick 1
    assert rows[0]["vec_id"] == 0


def test_referential_integrity_counts(spark):
    rows = {r["check_name"]: r for r in _rows(spark, "dq_referential_integrity")}
    assert len(rows) == 4
    con = duckdb.connect()
    [(n_li,)] = con.execute(
        f"SELECT COUNT(*) FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    r = rows["lineitem.l_orderkey -> orders.o_orderkey"]
    assert r["n_checked"] == n_li
    for r in rows.values():
        assert 0 <= r["n_violations"] <= r["n_checked"]


def test_market_basket_bounds(spark):
    """Pair count never exceeds either marginal; support <= 1e6 ppm;
    the item pair is lexicographically ordered; lift reproduces from
    the emitted integers exactly."""
    rows = _rows(spark, "agg_market_basket")
    assert rows
    for r in rows:
        assert r["item_a"] < r["item_b"]
        assert 0 < r["n_pair"] <= min(r["n_a"], r["n_b"])
        assert 0 <= r["support_ppm"] <= 1_000_000
        assert r["lift"] == float(r["n_pair"]) * r["n_sessions"] / r["n_a"] / r["n_b"]


def test_time_to_convert_quartiles_ordered(spark):
    [r] = _rows(spark, "win_time_to_convert")
    assert r["n_converted"] > 0
    assert 0 <= r["p25_sec"] <= r["p50_sec"] <= r["p75_sec"] <= r["max_sec"]


def test_hy_lag_zero_equals_base_estimator(spark):
    """The lead-lag scan's lag-0 row must equal ms_hayashi_yoshida
    exactly (same pairs, same integer sum)."""
    [base] = _rows(spark, "ms_hayashi_yoshida")
    lag0 = {r["lag_sec"]: r for r in _rows(spark, "ms_hy_lead_lag")}[0]
    assert lag0["n_pairs"] == base["n_pairs"]
    assert lag0["sum_e6"] == base["sum_e6"]


def test_epps_corr_bounds_and_grid_coverage(spark):
    rows = _rows(spark, "ms_epps_effect")
    assert [r["grid_sec"] for r in rows] == [600, 3600, 21600]
    for r in rows:
        assert r["n"] > 1
        # the sums are floor-quantized per row, so Cauchy-Schwarz is
        # only guaranteed up to quantization noise — allow a small
        # tolerance instead of promising |corr| <= 1 on any input
        assert -1.01 <= r["corr"] <= 1.01
        # Pearson reproduces exactly from the emitted integer sums
        # (guard the degenerate constant-series case explicitly)
        n = float(r["n"])
        num = n * r["sxy"] - float(r["sx"]) * r["sy"] / 1e6
        import math
        den2 = (n * r["sxx"] - float(r["sx"]) * r["sx"] / 1e6) * (
            n * r["syy"] - float(r["sy"]) * r["sy"] / 1e6
        )
        assert den2 > 0, "constant return series — corr undefined"
        assert r["corr"] == num / math.sqrt(den2)
