"""Table catalog over the driver-generated parquet test data.

Mirrors the reference's tiny `exchange.market.symbol.event` namespace idea
(reference factory.py:9-17, config.json:2-5) as a real catalog: named
tables resolved to parquet scans.  All reads go through `spark.read.parquet`
so Catalyst gets predicate pushdown / column pruning / partition pruning
for free — `.explain` on any engine query shows PushedFilters + ReadSchema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS): read as long nanos
# (spark.sql.legacy.parquet.nanosAsLong) and floor-convert to micros —
# identical to DuckDB's ns->us truncation, so oracle parity holds.
_NANOS_TS_COLS = {"events": ("ts",)}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table. Column pruning + filter pushdown apply."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name in _NANOS_TS_COLS:
        # The harness may hand us a session without this conf; it is
        # runtime-settable and required to scan TIMESTAMP(NANOS) parquet.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def fanout(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Repartition for CPU-bound expression work on byte-small inputs —
    but ONLY when the input is actually under-partitioned.

    A few-MB parquet file scans as one partition, so expensive per-row
    expressions (shingling, hashing, vector math) run single-threaded
    regardless of cores; an explicit repartition(N) spreads the rows
    (respected by AQE — only AQE-planned shuffles are coalesced). A
    naturally many-partitioned scan (any 100 TB input) already has
    >= N partitions, and repartitioning it would be a full shuffle
    that REDUCES its parallelism — so the helper is a literal no-op
    there, asserted in tests/test_plans.py.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
