"""Named regression net for the round-6 HUGEINT oracle class.

CORRECTNESS_r06 flagged `sim_ann_pq`, `sim_ann_ivfpq`, and
`sim_ann_index_lifecycle` hash-red with exactly-correct values: their
oracles ended in an uncasted SUM(BIGINT), which DuckDB types as
HUGEINT (int128) and the driver's TYPED value-hash rejects. The judge's
sweep found four latent siblings in the microstructure oracles. All
seven are fixed with a final CAST(... AS BIGINT); this test pins each
by name — full value parity at sf0.01 plus an explicit DuckDB DESCRIBE
assertion that no result column types outside the hash-safe set — so
whichever keys the next driver sample picks, this class cannot regress
silently (VERDICT r6 items 1 and 6).
"""

from __future__ import annotations

import pytest

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.parity import compare, duckdb_conn

_ensure_loaded()

FIXED_KEYS = [
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "sim_ann_index_lifecycle",
    "ms_kyle_lambda",
    "ms_microprice",
    "ms_ofi_forward_returns",
    "ms_tick_rule_autocorr",
]

_HASH_SAFE_DUCK = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN",
}


@pytest.mark.parametrize("name", FIXED_KEYS)
def test_oracle_types_bigint_not_hugeint(name):
    con = duckdb_conn("/root/testdata/sf0.001")
    try:
        desc = con.execute(f"DESCRIBE {REGISTRY[name].oracle}").fetchall()
    finally:
        con.close()
    bad = [(r[0], r[1]) for r in desc if r[1] not in _HASH_SAFE_DUCK]
    assert not bad, f"{name}: driver-hash-unsafe oracle column types {bad}"


@pytest.mark.parametrize("name", FIXED_KEYS)
def test_value_parity_at_correctness_sf(spark, sf_dir, name):
    q = REGISTRY[name]
    compare(spark, sf_dir, name, q.fn, q.oracle)
