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
