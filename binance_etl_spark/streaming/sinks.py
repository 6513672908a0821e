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
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def foreach_batch_upsert(
    state_path: str,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> Callable[[DataFrame, int], None]:
    """Streaming upsert sink: maintain latest-row-per-key state in a
    parquet table via writeStream.foreachBatch.

    Each micro-batch merges into the existing state (union + keep
    row_number()=1 per key ordered by `order_cols` DESC) and swaps the
    table atomically (write to a side directory, rename). The merge is
    IDEMPOTENT: replaying a batch after a checkpoint-less restart
    reproduces the same state, because "latest by order_cols" is a pure
    function of the union of rows seen — this is the exactly-once
    upsert story the reference's lossy CSV tail cannot give
    (reference base.py:39-45 drops buffered rows on stop).

    Scale shape: this is compact-on-write (the whole state rewrites per
    batch), right when state is bounded (one row per live key — e.g.
    top-of-book per symbol). For unbounded history at 100 TB the same
    foreachBatch body targets a MERGE-capable table format instead;
    the streaming plumbing is unchanged.
    """
    ordering = [F.col(c).desc() for c in order_cols]

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = batch_df
        if os.path.isdir(state_path):
            old = spark.read.parquet(state_path)
            new = old.unionByName(batch_df.select(*old.columns))
        w = Window.partitionBy(*key_cols).orderBy(*ordering)
        merged = (
            new.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        tmp = state_path.rstrip("/") + ".__staging"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(state_path):
            shutil.rmtree(state_path)
        os.rename(tmp, state_path)

    return apply
