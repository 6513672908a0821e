"""Driver-twin TYPED-HASH rotation over the least-recently-sampled keys.

The driver's correctness gate hashes each result after sorting columns
by name — a channel the local parity suite's typed-tuple comparison is
STRICTER than in value terms but DIFFERENT from in normalization terms
(NULL placement in a sort, float rendering). The registry dtype lint
closed the type-kind channel (VERDICT r6); this module closes the
hash-normalization channel: every round it takes the 50 oracle keys
whose most recent driver sample is OLDEST (never-sampled first), runs
the Spark query AND the DuckDB oracle at sf0.01, and compares a
faithful twin of the driver's order-insensitive value hash — floats
rendered via repr, NULLs as a dedicated token sorted with the row
strings, columns sorted by name. A mismatch here is exactly the class
of miss the driver could flag that value parity would not.

The rotation is DETERMINISTIC (derived from the committed
CORRECTNESS_r*.json artifacts, ties by name) and recorded per round in
QUERIES.md.
"""

from __future__ import annotations

import pytest

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from binance_etl_spark.plans.rotation import rotation_keys
from tests.parity import driver_hash as _driver_hash
from tests.parity import duckdb_conn

_ensure_loaded()


@pytest.mark.parametrize("name", rotation_keys())
def test_driver_hash_rotation(spark, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(q.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()
    assert len(s_rows) == len(d_rows), f"{name}: row count"
    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns"
    sh, dh = _driver_hash(s_cols, s_rows), _driver_hash(d_cols, d_rows)
    assert sh == dh, (
        f"{name}: driver-style hash mismatch (value parity may still "
        f"hold — check float rendering / NULL ordering) {sh} != {dh}"
    )
