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


# ---------------------------------------------------------------------------
# Registry growth guard (VERDICT r5 item 9): past ~230 queries a new
# operator can silently land without any scale accountability. Every
# `llm`- or `join`-tagged registration — the two families where a bad
# plan (all-pairs join, unbucketed candidate generation, driver
# collect) becomes a 100 TB outage — must either be plan-pinned in
# tests/test_plan_pins.py or carry an explicit scale/plan note in its
# registry doc. This is a lint over metadata, not execution: it keeps
# the DOCUMENTED scale posture growing in lockstep with the surface.
# ---------------------------------------------------------------------------

_SCALE_NOTE_KEYWORDS = (
    "scale",
    "shuffle",
    "broadcast",
    "blocked",
    "banded",
    "bucket",
    "push",          # pushed / pushdown
    "partition",
    "o(",            # complexity statements
    "equi-join",
    "100 tb",
    "map-side",
    "prune",
    "pointer-jumping",
    "takeordered",
    "top-k",
    "all-pairs",
    "codegen",
    "driver-side",
    "collect",
)


def test_llm_and_join_queries_carry_plan_pin_or_scale_note():
    import os

    _ensure_loaded()
    pins_path = os.path.join(os.path.dirname(__file__), "test_plan_pins.py")
    with open(pins_path) as f:
        pinned_source = f.read()
    offenders = []
    for name, ent in sorted(REGISTRY.items()):
        if not ({"llm", "join"} & set(ent.tags)):
            continue
        if name in pinned_source:  # plan-property pinned
            continue
        doc = ent.doc.lower()
        if any(kw in doc for kw in _SCALE_NOTE_KEYWORDS):
            continue
        offenders.append(name)
    assert not offenders, (
        "every llm/join-tagged query needs a plan pin in "
        f"test_plan_pins.py or a scale note in its doc; missing: {offenders}"
    )
