"""Sinks: reference-compatible CSV layout + partitioned parquet.

The reference appends one CSV pair per (symbol, market):
`{symbol}.{market}.trades.csv` / `{symbol}.{market}.depth.csv` with a
header written once (reference storage.py:57-75). A consumer of those
files can point at `write_reference_csv` output and see the same
shape. Internally the engine prefers parquet partitioned by
(market, symbol) — columnar, prunable, exactly-once under streaming
checkpoints (pipelines.write_table_stream).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_reference_csv(df: DataFrame, out_dir: str, symbol: str, market: str, table: str) -> str:
    """Batch write in the reference's exact file naming:
    {symbol}.{market}.{table}.csv, header once, single file.

    Single-file output implies coalesce(1) — this sink is a
    compatibility exporter for per-symbol consumers, not the scale
    path (use the partitioned parquet sink for that); per-symbol files
    are naturally small because the split key IS the file key.
    """
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, f"__tmp_{symbol}_{market}_{table}")
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    final = os.path.join(out_dir, f"{symbol}.{market}.{table}.csv")
    shutil.move(part, final)
    shutil.rmtree(tmp)
    return final
