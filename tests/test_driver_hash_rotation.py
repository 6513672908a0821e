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

import glob
import hashlib
import json
import os
import re

import pytest

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.parity import duckdb_conn

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ROTATION_SIZE = 50

_ensure_loaded()


def last_driver_sample_round() -> dict[str, int]:
    """name -> highest round whose CORRECTNESS_r{N}.json sampled it
    (0 = never driver-sampled)."""
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name in data:
            seen[name] = max(seen.get(name, 0), rnd)
    return seen


def rotation_keys() -> list[str]:
    """The 50 oracle-bearing keys least recently driver-sampled,
    never-sampled first, ties broken by name — deterministic given the
    committed CORRECTNESS artifacts and the registry."""
    seen = last_driver_sample_round()
    oracled = [n for n, q in REGISTRY.items() if q.oracle is not None]
    oracled.sort(key=lambda n: (seen.get(n, 0), n))
    return oracled[:_ROTATION_SIZE]


def _driver_hash(cols: list[str], rows: list[tuple]) -> str:
    """Twin of the driver's order-insensitive typed value hash: columns
    sorted by name, every value rendered to a canonical string (floats
    via repr — the rendering channel; NULL as a dedicated token — the
    ordering channel), rows sorted AS STRINGS, md5 over the lot."""
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
