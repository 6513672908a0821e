"""Registry-wide output-dtype lint (VERDICT r3 item 9).

The round-1 driver hash failures came from output columns whose client-
side normalization differs between Spark and DuckDB: DECIMAL (scale
formatting), TIMESTAMP/DATE (tz + ISO rendering), and any nested type
(array/map/struct/variant/binary renderings are engine-specific). The
registry contract is therefore: every registered query's OUTPUT schema
uses only primitive numerics (any integer/float width — they hash as
plain numbers in both engines), string, and boolean. This test walks
the full registry and fails on any column outside that set, so a new
operator cannot re-introduce the failure mode."""

from __future__ import annotations

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

SF_DIR = "/root/testdata/sf0.001"

ALLOWED = {
    "double",
    "float",
    "bigint",
    "int",
    "smallint",
    "tinyint",
    "string",
    "boolean",
}


def test_every_registered_query_outputs_hashable_primitives(spark):
    _ensure_loaded()
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, ent in sorted(REGISTRY.items()):
        df = ent.fn(spark, SF_DIR)
        bad = [(c, t) for c, t in df.dtypes if t not in ALLOWED]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "registered queries must output only primitive numeric/string/"
        f"boolean columns (decimal/timestamp/date/nested types hash "
        f"differently across engines): {offenders}"
    )
