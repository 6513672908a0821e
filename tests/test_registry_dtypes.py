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

import hashlib
import os

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

SF_DIR = "/root/testdata/sf0.001"


def _lint_keys() -> list[str]:
    """Registry keys this run lints. The FULL suite walks everything;
    the default FAST profile (see tests/conftest.py) walks md5 shard
    i/M (BESK_REGISTRY_SHARD, default 0/8) — executing all ~340
    entries at sf0.001 is the single most expensive test in the suite
    (~7 min serial), and the full walk still runs under
    BESK_FULL_SUITE=1 / scripts/shard_tests.py."""
    _ensure_loaded()
    names = sorted(REGISTRY)
    if os.environ.get("BESK_FULL_SUITE") == "1":
        return names
    spec = os.environ.get("BESK_REGISTRY_SHARD", "0/8")
    i, m = (int(x) for x in spec.split("/"))
    return [
        n
        for n in names
        if int(hashlib.md5(n.encode()).hexdigest(), 16) % m == i
    ]

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


# ent.fn can be eager (index/lifecycle queries do real commits), so the
# per-query Spark dtypes are computed once and shared by both the
# primitives lint and the DuckDB-kind cross-check below.
_SPARK_DTYPES: dict[str, dict[str, str]] = {}


def _spark_dtypes(spark, name: str) -> dict[str, str]:
    if name not in _SPARK_DTYPES:
        _SPARK_DTYPES[name] = dict(REGISTRY[name].fn(spark, SF_DIR).dtypes)
    return _SPARK_DTYPES[name]


def test_every_registered_query_outputs_hashable_primitives(spark):
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name in _lint_keys():
        bad = [(c, t) for c, t in _spark_dtypes(spark, name).items() if t not in ALLOWED]
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


# ---------------------------------------------------------------------------
# Oracle-side dtype lint (VERDICT r6 items 1+3). Round 6's only red
# rows were HUGEINT: an uncasted SUM(BIGINT) types as int128 in DuckDB,
# the Python client hands it back as a plain `int` (so value-level
# parity is blind to it), but the driver hashes TYPED values and
# mismatches Spark's int64. DESCRIBE exposes the logical type without
# executing the query, so this walks all 260+ oracles in seconds and
# bans every type outside the driver-hash-safe set — and cross-checks
# each DuckDB column's type KIND against the Spark plan's dtype kind.
# ---------------------------------------------------------------------------

_DUCK_KIND = {
    "BIGINT": "i", "INTEGER": "i", "SMALLINT": "i", "TINYINT": "i",
    "DOUBLE": "f", "FLOAT": "f",
    "VARCHAR": "s",
    "BOOLEAN": "b",
}

_SPARK_KIND = {
    "bigint": "i", "int": "i", "smallint": "i", "tinyint": "i",
    "double": "f", "float": "f",
    "string": "s",
    "boolean": "b",
}


def _split_top_level(sql: str) -> list[str]:
    """Split a multi-statement oracle on top-level semicolons (quotes
    and `--` line comments protected) — DML-chain oracles stage temp
    tables before their final SELECT, and only that SELECT can be
    DESCRIBEd."""
    parts, part, quote = [], "", None
    comment = False
    prev = ""
    for ch in sql:
        if comment:
            if ch == "\n":
                comment = False
        elif quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "-" and prev == "-":
            comment = True
        elif ch == ";":
            if part.strip():
                parts.append(part)
            part = ""
            prev = ""
            continue
        part += ch
        prev = ch
    if part.strip():
        parts.append(part)
    return parts


def test_every_oracle_types_hash_safe_and_matches_spark(spark):
    from tests.parity import duckdb_conn

    con = duckdb_conn(SF_DIR)
    type_offenders: dict[str, list[tuple[str, str]]] = {}
    kind_offenders: dict[str, list[tuple[str, str, str]]] = {}
    try:
        for name in _lint_keys():
            ent = REGISTRY[name]
            if ent.oracle is None:
                continue
            stmts = _split_top_level(ent.oracle)
            for prep in stmts[:-1]:
                con.execute(prep)
            desc = con.execute(f"DESCRIBE {stmts[-1]}").fetchall()
            duck = {row[0]: row[1] for row in desc}
            bad = [(c, t) for c, t in duck.items() if t not in _DUCK_KIND]
            if bad:
                type_offenders[name] = bad
                continue
            sdtypes = _spark_dtypes(spark, name)
            drift = [
                (c, t, sdtypes.get(c, "<missing>"))
                for c, t in duck.items()
                if _DUCK_KIND[t] != _SPARK_KIND.get(sdtypes.get(c, ""), "?")
            ]
            if drift:
                kind_offenders[name] = drift
    finally:
        con.close()
    assert not type_offenders, (
        "oracle result columns must type as BIGINT/INTEGER/DOUBLE/"
        "VARCHAR/BOOLEAN in DuckDB (HUGEINT and friends break the "
        f"driver's typed value-hash — CAST the final column): {type_offenders}"
    )
    assert not kind_offenders, (
        "oracle column type-kind must match the Spark plan's dtype "
        f"(col, duckdb_type, spark_dtype): {kind_offenders}"
    )
