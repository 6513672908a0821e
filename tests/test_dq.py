"""Data-quality expectation suite (plans/dq.py) — report/quarantine
consistency and the plan shapes the docstrings claim."""

from __future__ import annotations

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _report(spark, sf_dir):
    return {
        r["constraint_name"]: r
        for r in REGISTRY["dq_expectations"].fn(spark, sf_dir).collect()
    }


def test_report_is_internally_consistent(spark, sf_dir):
    rep = _report(spark, sf_dir)
    assert len(rep) == 7
    for name, r in rep.items():
        assert r["passed"] == (r["violations"] == 0), name
        assert abs(r["violation_rate"] - r["violations"] / r["n_rows"]) < 1e-15
        assert 0 <= r["violations"] <= r["n_rows"]
    # clean-by-construction constraints on the synthetic data
    for name in (
        "quantity_not_null",
        "quantity_in_range",
        "discount_in_range",
        "returnflag_domain",
        "orderkey_references_orders",
    ):
        assert rep[name]["passed"], name
    # the warn threshold must actually trip (otherwise the rule is dead)
    assert not rep["warn_high_discount"]["passed"]


def test_quarantine_cross_checks_the_report(spark, sf_dir):
    rep = _report(spark, sf_dir)
    rows = REGISTRY["dq_quarantine"].fn(spark, sf_dir).collect()
    # reason-string layout is self-consistent
    for r in rows:
        reasons = r["reasons"].split(",")
        assert r["n_reasons"] == len(reasons) >= 1
        assert set(reasons) <= {"high_discount", "bulk_quantity", "high_tax"}
    # the high_discount reason count IS the report's violation count
    n_hd = sum(1 for r in rows if "high_discount" in r["reasons"].split(","))
    assert n_hd == rep["warn_high_discount"]["violations"]


def test_quarantine_plan_is_scan_filter_sort_only(spark, sf_dir):
    df = REGISTRY["dq_quarantine"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # only the parity-only output sort may exchange; no join, no agg
    assert "Join" not in plan and "HashAggregate" not in plan
    assert plan.count("Exchange") <= 1


def test_expectations_single_scan_and_anti_join(spark, sf_dir):
    df = REGISTRY["dq_expectations"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "partial_sum" in plan or "partial_count" in plan
