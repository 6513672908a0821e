"""Small-file compaction — the table-maintenance op every streaming
lakehouse needs.

A micro-batched file sink (the engine's, or the reference's CSV chunks
— storage.py:22-36 flushes every 1000 rows) accretes many small files;
at 100 TB small files destroy scan throughput (per-file open cost,
tiny row groups, starved vectorized readers) and overload the file
listing. Compaction rewrites a directory to ~target-sized files and
swaps it atomically.

Sizing comes from the actual on-disk bytes (not row counts), so the
result aligns with `spark.sql.files.maxPartitionBytes` and one scan
task maps to one file. coalesce() is used instead of repartition():
merging files needs NO shuffle — each output task just reads a few
input files end-to-end.
"""

from __future__ import annotations

import glob
import math
import os
import shutil

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if not f.startswith(("_", "."))
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_key: list[str] | None = None,
) -> int:
    """Rewrite the parquet directory at `path` into
    ceil(bytes / target_file_bytes) files. Returns the new file count.
    Atomic: writes a staging dir, then swaps.

    sort_key (r10 ADVICE, fixed r11): with no key, the
    under-partitioned fallback below uses ROUND-ROBIN
    repartition(n_files), which destroys any existing row clustering
    (e.g. a range layout by key) in the rewritten directory — unlike
    the coalesce path, which preserves input order within partitions.
    Callers relying on key-clustered files (bloom/zone prune
    effectiveness, sorted scans) pass sort_key=[cols]: the rewrite
    becomes repartitionByRange(n_files, keys) + sortWithinPartitions —
    one range shuffle that RESTORES clustering no matter how
    fragmented the input layout was (also what
    operators/snapshots.compact does via the table's partition spec)."""
    total = dir_bytes(path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    staging = path.rstrip("/") + ".__compacting"
    df = spark.read.parquet(path)
    if sort_key:
        df = df.repartitionByRange(n_files, *sort_key).sortWithinPartitions(
            *sort_key
        )
    else:
        # coalesce is the no-shuffle narrow path but can only REDUCE
        # the partition count — a scan planned with fewer partitions
        # than n_files (few cores, small openCost-packed splits) would
        # silently under-split; fall back to round-robin repartition.
        df = (
            df.coalesce(n_files)
            if df.rdd.getNumPartitions() >= n_files
            else df.repartition(n_files)
        )
    df.write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    # report the files actually written (empty partitions write none)
    return len(glob.glob(os.path.join(path, "part-*.parquet")))
