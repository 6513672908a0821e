"""Bare-session sweep: run every registered query on a BARE SparkSession
(no engine conf, mirroring the driver's harness) and compare against the
DuckDB oracle exactly.  Catches conf-dependent drift the parity suite
(which uses the engine-configured session) cannot see.

The comparator is tests.parity.compare, which since round 9 ALSO
asserts the driver-twin typed hash (columns sorted by name, repr
floats, NULL token) — so a full sweep is the exact driver comparison
over ALL oracles, not just the 50-key rotation.

Usage: python scripts/bare_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.parity import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bare-sweep")
        .getOrCreate()
    )
    _ensure_loaded()
    failed: list[str] = []
    t0 = time.time()
    for name, q in REGISTRY.items():
        t = time.time()
        try:
            if q.oracle is not None:
                compare(spark, sf_dir, name, q.fn, q.oracle)
                status = "ok"
            else:
                n = q.fn(spark, sf_dir).count()
                status = f"rows-only({n})"
        except Exception:
            status = "FAIL"
            failed.append(name)
            traceback.print_exc()
        print(f"{name:32s} {status:14s} {time.time() - t:6.2f}s", flush=True)
    print(f"\n{len(REGISTRY) - len(failed)}/{len(REGISTRY)} ok "
          f"(typed-hash comparator) in "
          f"{time.time() - t0:.1f}s; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
