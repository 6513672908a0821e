"""RocksDB state store: the production streaming-state backend.

The default HDFS-backed state store keeps every key in executor heap —
fine for tests, fatal for 100 TB streaming state (billions of keys).
Spark bundles RocksDBStateStoreProvider (off-heap, spill-to-disk,
incremental checkpointing); this test pins that (a) the provider
actually engages in this build and (b) swapping the backend does NOT
change query results — the state contract is provider-agnostic, so
the engine can run RocksDB in production and default in unit tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F

ROCKS = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _run_windowed_count(spark, src_dir: str, ckpt: str, name: str):
    stream = (
        spark.readStream.schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT")
        .parquet(src_dir)
        .withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "6 hours"), (F.col("user_id") % 7).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        f"select window.start as ws, g, n from {name} order by ws, g"
    ).collect()
    spark.catalog.dropTempView(name)
    return [tuple(r) for r in rows]


def test_rocksdb_backend_matches_default_backend(spark, tmp_path):
    src = str(tmp_path / "src")
    (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select("event_id", "ts", "user_id")
        .limit(20000)
        .write.parquet(src)
    )
    prev = spark.conf.get(PROVIDER_KEY, None)
    try:
        default_rows = _run_windowed_count(
            spark, src, str(tmp_path / "ck_default"), "st_default"
        )
        spark.conf.set(PROVIDER_KEY, ROCKS)
        rocks_rows = _run_windowed_count(
            spark, src, str(tmp_path / "ck_rocks"), "st_rocks"
        )
    finally:
        if prev is None:
            spark.conf.unset(PROVIDER_KEY)
        else:
            spark.conf.set(PROVIDER_KEY, prev)
    assert default_rows == rocks_rows
    assert len(rocks_rows) > 0
