"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + sorted
values exactly (stricter than the driver's hash — if this passes, the
driver's order-insensitive value-hash passes).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from binance_etl_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("ts", _dt.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if v is None:
        return ("null",)
    if isinstance(v, list):
        return ("l", tuple(_norm(x) for x in v))
    return ("s", str(v))


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed)


# Python-client types a registered query may emit. The round-1 driver
# failures were ALL dtype-normalization drift (Decimal scale, DATE /
# TIMESTAMP client formatting, HUGEINT) — the registry rule is that
# results leave as double/bigint/string/bool only, so any engine's
# client hasher stringifies them identically. Enforced on BOTH engines'
# raw client values for every oracle, so a future driver sample is
# green by construction.
_HASH_SAFE_TYPES = (int, float, str, bool, type(None))


def _assert_hash_safe(name: str, cols, rows, engine: str) -> None:
    for j, c in enumerate(cols):
        for r in rows:
            v = r[j]
            if isinstance(v, list):
                bad = [x for x in v if not isinstance(x, _HASH_SAFE_TYPES)]
                assert not bad, (
                    f"{name}: {engine} column {c!r} emits list of "
                    f"{type(bad[0]).__name__} — registry outputs must be "
                    "double/bigint/string/bool (driver-hash-safe)"
                )
            else:
                assert isinstance(v, _HASH_SAFE_TYPES), (
                    f"{name}: {engine} column {c!r} emits "
                    f"{type(v).__name__} ({v!r}) — registry outputs must be "
                    "double/bigint/string/bool (driver-hash-safe)"
                )


def driver_hash(cols: list[str], rows: list[tuple]) -> str:
    """Twin of the driver's order-insensitive typed value hash: columns
    sorted by name, every value rendered to a canonical string (floats
    via repr — the rendering channel; NULL as a dedicated token — the
    ordering channel), rows sorted AS STRINGS, md5 over the lot. Kept
    here so the parity suite, the bare sweep, and the rotation test all
    compare through the SAME comparator."""
    import hashlib

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def render(v) -> str:
        if v is None:
            return "\\N"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, list):
            return "[" + ",".join(render(x) for x in v) + "]"
        return str(v)

    lines = sorted("\x1f".join(render(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def _col_type_tags(cols, rows) -> dict[str, set]:
    tags: dict[str, set] = {c: set() for c in cols}
    for r in rows:
        for j, c in enumerate(cols):
            if r[j] is not None:
                tags[c].add(_norm(r[j])[0])
    return tags


def compare(spark, sf_dir: str, name: str, fn, oracle: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    # Driver-hash preconditions: only hash-stable client types leave a
    # query, and both engines agree on every column's type kind.
    _assert_hash_safe(name, s_cols, s_rows, "spark")
    _assert_hash_safe(name, d_cols, d_rows, "duckdb")
    s_tags, d_tags = _col_type_tags(s_cols, s_rows), _col_type_tags(d_cols, d_rows)
    for c in s_cols:
        assert s_tags[c] == d_tags[c], (
            f"{name}: column {c!r} type-kind drift spark={s_tags[c]} duckdb={d_tags[c]}"
        )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_sorted = _sorted_rows(s_cols, s_rows)
    d_sorted = _sorted_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, f"{name}: first value mismatch at sorted row {i}:\n spark={a}\n duck ={b}"
    # The driver-twin typed hash on top of value parity: value-equal
    # results can still hash-differ through the rendering/ordering
    # channels (float repr, NULL token placement) — every oracle gets
    # the exact driver comparison, not just the 50-key rotation.
    sh, dh = driver_hash(s_cols, s_rows), driver_hash(d_cols, d_rows)
    assert sh == dh, (
        f"{name}: driver-style typed hash mismatch (value parity holds "
        f"— float rendering / NULL ordering channel) {sh} != {dh}"
    )
