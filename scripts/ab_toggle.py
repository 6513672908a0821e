"""Interleaved A/B inside ONE JVM: for each entry run conf-A, conf-B,
conf-A, conf-B (AQE coalesce confs are read per query execution, so
runtime toggling is valid). Removes JVM-warmup and page-cache order
effects that poison process-level A/B.

    python scripts/ab_toggle.py entry1 entry2 -- k1=vA1:vB1 k2=vA2:vB2
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _warmup, materialize
from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from binance_etl_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    i = argv.index("--")
    entries = argv[:i]
    toggles = {}
    for kv in argv[i + 1:]:
        k, v = kv.split("=", 1)
        va, vb = v.split(":", 1)
        toggles[k] = (va, vb)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark("besk-abt")
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)
    res: dict[str, list] = {}
    for e in entries:
        walls = []
        for rep in range(4):
            side = rep % 2
            for k, (va, vb) in toggles.items():
                spark.conf.set(k, vb if side else va)
            t0 = time.perf_counter()
            materialize(REGISTRY[e].fn(spark, sf_dir))
            walls.append(round(time.perf_counter() - t0, 3))
        res[e] = walls
        a = min(walls[0], walls[2])
        b = min(walls[1], walls[3])
        print(f"# {e}: A={walls[0]},{walls[2]} B={walls[1]},{walls[3]} "
              f"-> bestA {a} bestB {b} ratio {b/a:.2f}", file=sys.stderr)
    print("ABT " + json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
