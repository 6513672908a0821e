"""Loud, fast, NAMED parity checks for the two keys whose only driver
CORRECTNESS row dates to round 1 (both were hash misses then, fixed
since, never driver-resampled: VERDICT r5 item 7). They already run
inside the full parametrized oracle sweep, but a regression there is
one line in 450+; a dedicated module makes it unmissable — and these
two cover the two scan paths (CSV round-trip, REST-snapshot fixture)
a driver re-sample would hit first."""

from __future__ import annotations

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.parity import compare

_ensure_loaded()


def test_scan_csv_roundtrip_parity(spark, sf_dir):
    q = REGISTRY["scan_csv_roundtrip"]
    compare(spark, sf_dir, "scan_csv_roundtrip", q.fn, q.oracle)


def test_src_snapshot_fixture_parity(spark, sf_dir):
    q = REGISTRY["src_snapshot_fixture"]
    compare(spark, sf_dir, "src_snapshot_fixture", q.fn, q.oracle)
