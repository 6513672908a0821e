"""Compaction: many small files -> few target-sized files, same rows."""

from __future__ import annotations

import glob
import tempfile

from binance_etl_spark.catalog import load
from binance_etl_spark.operators.compact import compact_parquet, dir_bytes

SF_DIR = "/root/testdata/sf0.01"


def test_compact_reduces_files_and_preserves_rows(spark):
    path = tempfile.mkdtemp(prefix="besk_compact_") + "/li"
    li = load(spark, SF_DIR, "lineitem")
    li.repartition(64).write.parquet(path)  # simulate micro-batch litter
    before_files = len(glob.glob(path + "/part-*.parquet"))
    assert before_files == 64
    want = li.count()

    total = dir_bytes(path)
    n = compact_parquet(spark, path, target_file_bytes=max(1, total // 4))
    after = glob.glob(path + "/part-*.parquet")
    assert len(after) == n <= 8
    assert spark.read.parquet(path).count() == want


def test_compact_sort_key_restores_clustering(spark):
    """sort_key compaction RANGE-clusters the rewrite: every output
    file owns a disjoint l_orderkey interval, even from round-robin
    litter (the r10-ADVICE clustering-loss fix, not just a caveat)."""
    path = tempfile.mkdtemp(prefix="besk_compact_") + "/li"
    li = load(spark, SF_DIR, "lineitem")
    li.repartition(64).write.parquet(path)  # round-robin: zero clustering
    want = li.count()

    total = dir_bytes(path)
    n = compact_parquet(
        spark, path, target_file_bytes=max(1, total // 4), sort_key=["l_orderkey"]
    )
    assert 1 < n <= 8
    assert spark.read.parquet(path).count() == want
    # per-file [min, max] l_orderkey ranges must not overlap
    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(path + "/part-*.parquet"):
        t = pq.read_table(f, columns=["l_orderkey"])["l_orderkey"]
        ranges.append((t[0].as_py(), t[-1].as_py(), min(t.to_pylist()), max(t.to_pylist())))
    # sorted within each file (first == min, last == max)
    assert all(first == lo and last == hi for first, last, lo, hi in ranges)
    spans = sorted((lo, hi) for _, _, lo, hi in ranges)
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))
