"""Every registered query with an oracle must hash-match DuckDB at sf0.01
— the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.parity import compare

_ensure_loaded()

WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    compare(spark, sf_dir, name, q.fn, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
