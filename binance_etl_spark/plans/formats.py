"""Source/sink format coverage beyond parquet+CSV: JSON-lines and ORC
round-trips.

The reference's only format is CSV (storage.py:63-75), and its raw
input is JSON text frames (base.py:47-54) — JSONL is therefore the
native interchange shape for its message logs (FIXTURES.md §B uses it
for replay fixtures). ORC rounds out the columnar formats Spark ships
with. Both queries prove write -> read -> aggregate value fidelity by
oracling against the ORIGINAL parquet table: any loss or type drift in
the round-trip breaks the hash.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.functions.parity import dsum, sql_dsum
from binance_etl_spark.plans.registry import register


@register(
    "scan_jsonl_roundtrip",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_id
    FROM documents GROUP BY lang
    """,
    doc="JSON-lines sink + source round-trip (the reference's raw-frame "
    "interchange format, FIXTURES.md §B / base.py:47-54): write "
    "documents metadata as JSONL, read back with an explicit schema "
    "(schema-on-read, no inference pass — at scale an inference scan "
    "doubles I/O), aggregate. Oracle runs on the original table, so the "
    "hash proves lossless value fidelity through the text format.",
    tags=("scan", "sink", "format"),
)
def scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = tempfile.mkdtemp(prefix="besk_jsonl_rt_") + "/documents_jsonl"
    d.write.mode("overwrite").json(path)
    back = spark.read.schema("doc_id BIGINT, lang STRING, n_chars BIGINT").json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
    )


@register(
    "scan_orc_roundtrip",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n, {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="ORC sink + source round-trip: write a lineitem projection to "
    "ORC, read it back, aggregate; oracle on the original parquet. ORC "
    "carries the same pushdown/pruning contract as parquet "
    "(PushedFilters/ReadSchema reach the reader), so either columnar "
    "format slots into the 100 TB layout unchanged.",
    tags=("scan", "sink", "format"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    path = tempfile.mkdtemp(prefix="besk_orc_rt_") + "/lineitem_orc"
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("sum_price")
    )


@register(
    "sink_zorder_prune",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n, MIN(o_orderkey) AS min_key
    FROM orders
    WHERE o_custkey <= 300 AND o_totalprice <= 200000
    GROUP BY o_orderstatus
    """,
    doc="Z-order (Morton-curve) clustered layout round-trip "
    "(operators/zorder.py): orders written clustered on "
    "(o_custkey, o_totalprice), read back through a 2-D predicate, "
    "aggregated; oracle on the original table proves the layout is "
    "lossless. Each output file covers a small rectangle of the 2-D "
    "value space, so footer stats prune files for predicates on "
    "EITHER column (measured in tests/test_zorder.py) — the Delta/"
    "Iceberg Z-ORDER maintenance op, built from plain codegen'd "
    "Catalyst expressions.",
    tags=("sink", "layout", "scan"),
)
def sink_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from binance_etl_spark.operators.zorder import write_zordered

    o = load(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="besk_zq_") + "/orders_z"
    write_zordered(o, path, ("o_custkey", "o_totalprice"), n_files=8)
    back = spark.read.parquet(path)
    return (
        back.where((F.col("o_custkey") <= 300) & (F.col("o_totalprice") <= 200000))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.min("o_orderkey").alias("min_key"))
    )
