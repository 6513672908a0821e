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
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recover_state(state_path: str) -> None:
    """Heal a crash inside `_swap_state`'s rename window. The old table
    is renamed to the DETERMINISTIC `<path>.__old` before the new one
    moves in, so the disk state decides what happened:

    - live missing, `.__old` present  -> crashed between the two
      renames: the old table is the last committed state; restore it.
    - live present, `.__old` present  -> crashed after the second
      rename but before cleanup: `.__old` is superseded; drop it.

    Callers that read the state path before merging (every
    foreach_batch body below) run this first, so a retried micro-batch
    after a mid-swap crash merges against the committed state instead
    of silently starting from empty — the rename-aside pattern keeps
    the data on disk, this makes the RETRY actually use it.

    Also sweeps orphaned `.__staging_*` dirs (a crash during the
    staging write leaves one behind per attempt). Safe because these
    sinks are single-writer per state path (one foreachBatch stream):
    no concurrent writer's in-flight staging can be here."""
    base = state_path.rstrip("/")
    old = base + ".__old"
    if os.path.isdir(old):
        if os.path.isdir(state_path):
            shutil.rmtree(old)
        else:
            os.rename(old, state_path)
    for stale in glob.glob(base + ".__staging_*"):
        shutil.rmtree(stale, ignore_errors=True)


def _swap_state(df: DataFrame, state_path: str) -> None:
    """Crash-safe state-table swap: write to a staging dir, move the
    live table ASIDE (rename, not delete), move staging into place,
    only then delete the old copy. Every crash point leaves either the
    old or the new complete table on disk — never neither — which
    matters because earlier micro-batches are already committed in the
    checkpoint and cannot be replayed to rebuild lost state; paired
    with `recover_state`, a retry after any crash point resumes from
    a committed table."""
    recover_state(state_path)
    staging = state_path.rstrip("/") + f".__staging_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    old = state_path.rstrip("/") + ".__old"
    if os.path.isdir(state_path):
        os.rename(state_path, old)
    os.rename(staging, state_path)
    if os.path.isdir(old):
        shutil.rmtree(old)


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
        recover_state(state_path)
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
        _swap_state(merged, state_path)

    return apply


def foreach_batch_agg_merge(
    state_path: str,
    key_cols: Sequence[str],
    count_col: str = "n",
    sum_col: str | None = None,
    sum_src: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Streaming incremental aggregate view: maintain per-key running
    (count, exact decimal sum) in a parquet table via foreachBatch.

    Unlike the latest-row upsert, an additive merge is NOT naturally
    idempotent — re-applying a micro-batch would double-count. Exactly-
    once therefore rides on Spark's micro-batch contract: every state
    row carries the last applied `batch_id`, and a batch whose id is
    <= the stored maximum is skipped (restarts with the SAME checkpoint
    re-offer the same ids). The swap is atomic (staging dir + rename),
    so a crash between write and rename re-applies cleanly.

    This is materialized-view maintenance at its 100 TB shape: the
    stream's partial aggregate is map-side combined per micro-batch,
    and state stays O(distinct keys) regardless of stream length —
    the engine-side generalization of the reference's monotone counters
    (reference base.py:30,76-81).
    """

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        recover_state(state_path)
        spark = batch_df.sparkSession
        keys = list(key_cols)
        agg = [F.count(F.lit(1)).cast("bigint").alias(count_col)]
        if sum_col is not None:
            agg.append(
                F.sum(F.col(sum_src or sum_col).cast("decimal(20,6)"))
                .cast("decimal(38,6)")
                .alias(sum_col)
            )
        partial = batch_df.groupBy(*keys).agg(*agg)
        if os.path.isdir(state_path):
            old = spark.read.parquet(state_path)
            # max() is None when the state table has zero rows (an
            # empty first micro-batch writes a schema-only parquet) —
            # treat as "nothing applied yet", not a TypeError.
            last_applied = old.agg(F.max("__batch_id")).first()[0]
            if last_applied is not None and last_applied >= batch_id:
                return  # replayed micro-batch: already merged
            merged = (
                old.drop("__batch_id")
                .unionByName(partial)
                .groupBy(*keys)
                .agg(
                    F.sum(count_col).cast("bigint").alias(count_col),
                    *(
                        [F.sum(sum_col).cast("decimal(38,6)").alias(sum_col)]
                        if sum_col is not None
                        else []
                    ),
                )
            )
        else:
            merged = partial
        out = merged.withColumn("__batch_id", F.lit(batch_id))
        _swap_state(out, state_path)

    return apply


def write_range_sorted(df: DataFrame, path: str, col: str, n_files: int) -> None:
    """Batch layout writer: range-partition on `col`, sort within each
    partition, write parquet — every output file covers a DISJOINT
    value range of `col` (asserted against parquet footer min/max in
    tests/test_layout.py).

    This is the data-skipping layout for 100 TB scans: a reader with a
    predicate on `col` prunes whole files from the footer stats alone
    (and row groups within them), turning point/range lookups into
    O(matching files) I/O. repartitionByRange samples the column to
    build balanced range bounds, so skew in `col` does not produce
    giant files.
    """
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def foreach_batch_scd2(
    state_path: str,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> Callable[[DataFrame, int], None]:
    """Streaming SCD TYPE-2 sink: maintain full per-key version history
    with validity intervals via writeStream.foreachBatch — the CDC
    history table the latest-row upsert throws away (batch twin:
    plans/timeseries.py ts_scd2_history).

    State rows are (keys..., attrs..., ts_col [= valid_from],
    tiebreaks..., valid_to, is_current): valid_to = next version's
    valid_from (lead over the key window), open interval for the
    current row. The merge is IDEMPOTENT: the state is a pure function
    of the distinct change set seen — each batch re-derives intervals
    from (prior versions' change rows) UNION (batch rows), deduped on
    (keys, ts, tiebreaks) — so replaying any batch after a
    checkpoint-less restart reproduces the identical table.

    Scale shape: compact-on-write like foreach_batch_upsert — correct
    while per-key history is bounded; at 100 TB the same body targets
    a MERGE-capable table format and only closes the previous-current
    rows of keys present in the batch (O(batch), not O(state)).
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    ties = list(tiebreak_cols)
    change_cols = keys + attrs + [ts_col] + ties

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        recover_state(state_path)
        spark = batch_df.sparkSession
        changes = batch_df.select(*change_cols)
        if os.path.isdir(state_path):
            old = spark.read.parquet(state_path)
            changes = old.select(*change_cols).unionByName(changes)
        changes = changes.dropDuplicates(keys + [ts_col] + ties)
        w = Window.partitionBy(*keys).orderBy(ts_col, *ties)
        versioned = changes.select(
            "*",
            F.lead(ts_col).over(w).alias("valid_to"),
        ).withColumn("is_current", F.col("valid_to").isNull())
        _swap_state(versioned, state_path)

    return apply
