"""Capture .explain("formatted") for registry entries into plans/r11/.

    python scripts/explain_plans.py TAG entry1 entry2 ...

Writes plans/r11/<entry>_<TAG>.txt for each entry. TAG is normally
"before" (run from a pre-change worktree) or "after" (run at HEAD).
Lifecycle entries (the ones that commit snapshot versions and then
serve) are explained WITHOUT executing their side effects where
possible: the registered fn runs (some must, to build the serve
frame), so each entry runs under a scratch TMPDIR exactly like the
bench does.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from binance_etl_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    entries = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "BESK_PLANS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    _ensure_loaded()
    spark = get_spark("besk-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in entries:
        spark.sparkContext.setJobDescription(f"explain: {name}")
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            # _jdf explain goes to jvm stdout; use the captured string API
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in-file
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with io.open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
