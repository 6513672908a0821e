"""Microstructure estimator invariants (plans/microstructure.py) —
bounds and identities the value-level oracle can't articulate."""

from __future__ import annotations

import math

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_realized_vol_bounds(spark, sf_dir):
    rows = REGISTRY["ms_realized_vol"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["rv"] >= 0 and r["bv"] >= 0
        assert r["n_returns"] > 0


def test_roll_spread_nonnegative_and_clamped(spark, sf_dir):
    for r in REGISTRY["ms_roll_spread"].fn(spark, sf_dir).collect():
        assert r["roll_spread"] >= 0
        if r["autocov"] < 0:
            assert math.isclose(
                r["roll_spread"], 2 * math.sqrt(-r["autocov"]), rel_tol=1e-12
            )
        else:
            assert r["roll_spread"] == 0.0, "positive autocov clamps to zero"


def test_imbalance_and_autocorr_are_bounded(spark, sf_dir):
    for r in REGISTRY["ms_ofi_forward_returns"].fn(spark, sf_dir).collect():
        assert -1.0 <= r["imbalance"] <= 1.0
        assert r["buy_qty"] >= 0 and r["sell_qty"] >= 0
    for r in REGISTRY["ms_tick_rule_autocorr"].fn(spark, sf_dir).collect():
        assert -1.0 <= r["autocorr"] <= 1.0
        assert 0.0 <= r["buy_fraction"] <= 1.0
        assert abs(r["sum_prod"]) <= r["n_pairs"], "±1 products bound the sum"


def test_amihud_nonnegative_and_bucket_complete(spark, sf_dir):
    rows = REGISTRY["ms_amihud_illiq"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["amihud"] >= 0, "|ret|/dv is nonnegative by construction"
        assert r["n_buckets"] > 0


def test_kyle_flow_matches_ofi_imbalance_sums(spark, sf_dir):
    """Cross-estimator identity: Kyle's per-symbol net signed volume
    must equal sum(buy_qty - sell_qty) over ms_ofi_forward_returns'
    buckets — both walk the same tape with the same signing."""
    kyle = {
        r["sym"]: r for r in REGISTRY["ms_kyle_lambda"].fn(spark, sf_dir).collect()
    }
    net: dict[int, int] = {}
    for r in REGISTRY["ms_ofi_forward_returns"].fn(spark, sf_dir).collect():
        net[r["sym"]] = net.get(r["sym"], 0) + (r["buy_qty"] - r["sell_qty"])
    assert set(kyle) == set(net)
    for sym, k in kyle.items():
        assert k["net_signed_volume"] == net[sym]
        assert k["kyle_lambda"] is not None, "synthetic flow has nonzero variance"


def test_forward_return_is_next_buckets_label(spark, sf_dir):
    """fwd_ret on bucket k must equal the close-to-close return into
    bucket k+1, and only each symbol's LAST bucket may be NULL."""
    rows = REGISTRY["ms_ofi_forward_returns"].fn(spark, sf_dir).collect()
    by_sym: dict[int, list] = {}
    for r in rows:
        by_sym.setdefault(r["sym"], []).append(r)
    for sym, rs in by_sym.items():
        rs.sort(key=lambda r: r["bucket"])
        nulls = [i for i, r in enumerate(rs) if r["fwd_ret"] is None]
        assert nulls == [len(rs) - 1], f"sym {sym}: only the last bucket lacks a label"


def test_microprice_leans_toward_the_heavier_side(spark, sf_dir):
    """Algebraic identity of the Stoikov microprice: premium over mid
    = (bq - aq)/(bq + aq) * half_spread, so its SIGN must match the
    size-imbalance sign row by row. Checked on the per-row projection
    the registered aggregate sums."""
    from pyspark.sql import functions as F

    from binance_etl_spark.catalog import load

    e = load(spark, sf_dir, "events").where(F.col("value") > 0).limit(2000)
    q = e.select(
        (F.col("value") - (F.col("event_id") % 5 + 1)).alias("bid"),
        (F.col("value") + (F.col("event_id") % 5 + 1)).alias("ask"),
        (F.col("event_id") % 7 + 1).alias("bq"),
        (F.col("event_id") % 11 + 1).alias("aq"),
    ).select(
        (
            (F.col("ask") * F.col("bq") + F.col("bid") * F.col("aq"))
            / (F.col("bq") + F.col("aq"))
            - (F.col("bid") + F.col("ask")) / 2
        ).alias("prem"),
        (
            (F.col("bq") - F.col("aq"))
            / (F.col("bq") + F.col("aq"))
            * (F.col("ask") - F.col("bid"))
            / 2
        ).alias("expected"),
    )
    # exact in the reals; in doubles the subtraction of two near-equal
    # quote-scale numbers leaves ulp-level noise, so compare with an
    # absolute tolerance far above ulp yet far below one tick
    bad = q.where(F.abs(F.col("prem") - F.col("expected")) > 1e-6).count()
    assert bad == 0
    assert REGISTRY["ms_microprice"].fn(spark, sf_dir).count() > 0
