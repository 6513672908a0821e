"""Every registered query with an oracle must hash-match DuckDB at sf0.01
— the local twin of the driver's CORRECTNESS gate.

BESK_PARITY_SHARD="i/M" (set by scripts/shard_tests.py) slices the
parametrization to the keys whose md5 lands in shard i of M, so the
~330-oracle sweep — the suite's longest single file — spreads across
parallel worker processes. Unset = the full surface (CI default).
"""

from __future__ import annotations

import hashlib
import os

import pytest

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.parity import compare

_ensure_loaded()


def _shard(names: list[str]) -> list[str]:
    spec = os.environ.get("BESK_PARITY_SHARD")
    if not spec:
        return names
    i, m = (int(x) for x in spec.split("/"))
    return [
        n
        for n in names
        if int(hashlib.md5(n.encode()).hexdigest(), 16) % m == i
    ]


WITH_ORACLE = _shard(sorted(n for n, q in REGISTRY.items() if q.oracle is not None))
ROWS_ONLY = _shard(sorted(n for n, q in REGISTRY.items() if q.oracle is None))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    compare(spark, sf_dir, name, q.fn, q.oracle)


if ROWS_ONLY:
    # defined only when this shard HOLDS rows-only keys — an empty
    # parametrize would register as a skip in 5 of 8 shards (only 4
    # rows-only queries exist), and the sharded suite aims for 0
    # skipped (r10 verdict item 4)
    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_runs(spark, sf_dir, name):
        q = REGISTRY[name]
        df = q.fn(spark, sf_dir)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0


if os.environ.get("BESK_PARITY_SHARD", "0/1").split("/")[0] == "0":
    # COLLECTED only in parity shard 0 — not skipped elsewhere, so
    # non-zero shards report 0 skipped (r10 verdict item 4)
    def test_entry_smoke(spark):
        import __spark_entry__ as entrymod

        df = entrymod.entry(spark)
        rows = df.collect()
        assert len(rows) > 0
