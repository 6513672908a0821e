"""Driver-sample rotation bookkeeping: which oracle keys has the
driver's CORRECTNESS gate sampled least recently?

Used by tests/test_driver_hash_rotation.py (the per-round driver-twin
typed-hash gate) and scripts/gen_inventory.py (the QUERIES.md record),
so the selection logic lives here — engine-side, no test/dev
dependencies — instead of being duplicated or imported across the
scripts/tests layering."""

from __future__ import annotations

import glob
import json
import os
import re

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
ROTATION_SIZE = 50


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
    """The ROTATION_SIZE oracle-bearing keys least recently
    driver-sampled, never-sampled first, ties broken by name —
    deterministic given the committed CORRECTNESS artifacts and the
    registry."""
    _ensure_loaded()
    seen = last_driver_sample_round()
    oracled = [n for n, q in REGISTRY.items() if q.oracle is not None]
    oracled.sort(key=lambda n: (seen.get(n, 0), n))
    return oracled[:ROTATION_SIZE]
