"""Profile one registry entry with sub-phase instrumentation.

Monkeypatches the snapshot-table machinery (write_version, merge_into,
read_version, select_files*), DataFrame.localCheckpoint and
DataFrame.count so each call reports its wall, then runs the entry
bench-style (materialize = xxhash64 reduce over all columns).  The
output is the measurement ledger guide §1 asks for before any change:
where the seconds actually go inside a multi-commit lifecycle op.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_entry.py \
        text_spans_incremental [more_entries ...] [--repeat N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from bench import _warmup, materialize
from binance_etl_spark.plans.registry import REGISTRY, _ensure_loaded
from binance_etl_spark.session import get_spark

LEDGER: list[tuple[str, float, str]] = []


def _wrap(mod, name, label=None):
    orig = getattr(mod, name)
    lab = label or name

    def timed(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        dt = time.perf_counter() - t0
        ctx = ""
        for x in a:
            if isinstance(x, str) and "/" in x:
                ctx = x.rsplit("/", 2)[-1]
                break
        LEDGER.append((lab, dt, ctx))
        return out

    setattr(mod, name, timed)
    return orig


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    from binance_etl_spark.operators import dedup as D
    from binance_etl_spark.operators import snapshots as SNAP

    for fname in ("write_version", "merge_into", "read_version",
                  "main_versions", "_find_batch_commit", "delete_keys",
                  "select_files_point", "assert_serial_apply",
                  "_enforce_unique", "_enforce_expectations",
                  "_write_bloom_index", "_file_stats", "_stage_files",
                  "_live_rows", "select_files_keys", "_carry_dv",
                  "_bloom_manifest_fields"):
        if hasattr(SNAP, fname):
            _wrap(SNAP, fname, f"SNAP.{fname}")
    _wrap(D, "connected_components", "D.connected_components")

    from pyspark.sql.classic.dataframe import DataFrame as CDataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    orig_ckpt = CDataFrame.localCheckpoint
    orig_count = CDataFrame.count
    orig_collect = CDataFrame.collect
    orig_parquet = DataFrameWriter.parquet

    def collect(self):
        t0 = time.perf_counter()
        out = orig_collect(self)
        LEDGER.append(("df.collect", time.perf_counter() - t0, f"n={len(out)}"))
        return out

    def wparquet(self, path, **kw):
        t0 = time.perf_counter()
        out = orig_parquet(self, path, **kw)
        LEDGER.append(("write.parquet", time.perf_counter() - t0,
                       path.rsplit("/", 2)[-2] + "/" + path.rsplit("/", 2)[-1]))
        return out

    CDataFrame.collect = collect
    DataFrameWriter.parquet = wparquet

    def ckpt(self, eager=True):
        t0 = time.perf_counter()
        out = orig_ckpt(self, eager)
        LEDGER.append(("df.localCheckpoint", time.perf_counter() - t0,
                       f"eager={eager} nparts={out.rdd.getNumPartitions() if eager else '?'}"))
        return out

    def count(self):
        t0 = time.perf_counter()
        out = orig_count(self)
        LEDGER.append(("df.count", time.perf_counter() - t0, f"n={out}"))
        return out

    CDataFrame.localCheckpoint = ckpt
    CDataFrame.count = count

    spark = get_spark("besk-profile")
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)

    for entry in args:
        for it in range(repeat):
            LEDGER.clear()
            t0 = time.perf_counter()
            df = REGISTRY[entry].fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            n = materialize(df)
            total = time.perf_counter() - t0
            print(f"\n=== {entry} run {it}: total {total:.3f}s "
                  f"(build {t_build:.3f}s, materialize {total - t_build:.3f}s, "
                  f"{n} rows)")
            by_label: dict[str, float] = {}
            for lab, dt, ctx in LEDGER:
                by_label[lab] = by_label.get(lab, 0.0) + dt
                if dt >= 0.15:
                    print(f"  {dt:7.3f}s  {lab:28s} {ctx}")
            print("  -- totals by label --")
            for lab, dt in sorted(by_label.items(), key=lambda x: -x[1]):
                nn = sum(1 for l, _, _ in LEDGER if l == lab)
                print(f"  {dt:7.3f}s  {lab} x{nn}")
    spark.stop()


if __name__ == "__main__":
    main()
