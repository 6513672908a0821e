"""Quick A/B: run a subset of registry entries bench-style with
optional extra Spark conf (passed as K=V args), print per-entry wall.

    python scripts/ab_entries.py entry1 entry2 -- k1=v1 k2=v2
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
    entries, conf = argv, {}
    if "--" in argv:
        i = argv.index("--")
        entries = argv[:i]
        conf = dict(kv.split("=", 1) for kv in argv[i + 1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark("besk-ab", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)
    out = {}
    for e in entries:
        t0 = time.perf_counter()
        n = materialize(REGISTRY[e].fn(spark, sf_dir))
        out[e] = round(time.perf_counter() - t0, 3)
        print(f"# {e}: {out[e]}s ({n} rows)", file=sys.stderr)
    print("AB " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
