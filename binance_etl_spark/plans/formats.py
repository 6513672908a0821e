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


@register(
    "sink_compact_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events GROUP BY event_type
    """,
    doc="Small-file COMPACTION round-trip — the table-maintenance op "
    "every streaming sink needs at 100 TB (a micro-batch sink emits "
    "per-trigger files; thousands of KB-files destroy scan throughput "
    "and NameNode/listing budgets). events is first written as 64 "
    "shards, then compacted to 4 via repartition (a full shuffle — "
    "correct for compaction, which REQUIRES redistribution), and the "
    "aggregate over the compacted table oracles against the ORIGINAL "
    "table: compaction must be byte-lossless. File counts asserted in "
    "tests/test_layout.py.",
    tags=("sink", "layout", "maintenance"),
)
def sink_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    frag = tempfile.mkdtemp(prefix="besk_frag_") + "/events_64"
    e.repartition(64).write.mode("overwrite").parquet(frag)
    compacted = tempfile.mkdtemp(prefix="besk_compact_") + "/events_4"
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(compacted)
    back = spark.read.parquet(compacted)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@register(
    "scan_schema_evolution",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, lang FROM documents WHERE doc_id < 100
    ), v2 AS (
      SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id >= 100 AND doc_id < 200
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_v1_rows,
           CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS total_chars_v2
    FROM (SELECT doc_id, lang, NULL AS n_chars FROM v1
          UNION ALL SELECT * FROM v2)
    GROUP BY lang
    """,
    doc="SCHEMA EVOLUTION round-trip: a v1 batch (doc_id, lang) and a "
    "widened v2 batch (+ n_chars) land in the same parquet directory; "
    "the read uses mergeSchema so v1 rows surface the new column as "
    "NULL. This is the add-a-column lifecycle every long-lived 100 TB "
    "table goes through — the oracle proves old rows stay readable and "
    "null-semantics are exact. (Columnar formats make this metadata-"
    "only; rewriting history is never required.)",
    tags=("scan", "format", "maintenance"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="besk_evo_") + "/docs_evolving"
    d.where(F.col("doc_id") < 100).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(path)
    d.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200)).select(
        "doc_id", "lang", "n_chars"
    ).write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", True).parquet(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_chars").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_v1_rows"),
        F.sum(F.coalesce("n_chars", F.lit(0))).cast("bigint").alias("total_chars_v2"),
    )


@register(
    "scan_xml_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_e6,
           MIN(event_id) AS min_id
    FROM events WHERE user_id < 40 GROUP BY event_type
    """,
    doc="XML sink + source round-trip (Spark 4 ships XML built-in): "
    "write an events slice as XML rows, read back with an explicit "
    "schema (no inference pass), aggregate with e6 fixed-point value "
    "sums. Oracle runs on the original parquet table, so the hash "
    "proves lossless value fidelity through the markup format — the "
    "interchange shape half of enterprise feeds still arrive in.",
    tags=("scan", "sink", "format"),
)
def scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").where(F.col("user_id") < 40).select(
        "event_id", "event_type", F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("v6")
    )
    path = tempfile.mkdtemp(prefix="besk_xml_rt_") + "/events_xml"
    e.write.mode("overwrite").format("xml").option("rootTag", "events").option(
        "rowTag", "event"
    ).save(path)
    back = (
        spark.read.schema("event_id BIGINT, event_type STRING, v6 BIGINT")
        .format("xml")
        .option("rowTag", "event")
        .load(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v6").cast("bigint").alias("sum_value_e6"),
        F.min("event_id").alias("min_id"),
    )


@register(
    "scan_binaryfile_assets",
    oracle="""
    WITH assets(file_name, payload_str) AS (
      VALUES ('img/asset_1.bin', 'fake-jpeg-bytes-aaaaaaaaaaaaaaaa'),
             ('img/asset_2.bin', 'fake-png-bytes-bbbbbbbbbbbbbbbbbbbbbbbb'),
             ('aud/asset_3.bin', 'fake-wav-bytes-cccccccccccc'),
             ('vid/asset_4.bin', 'fake-mp4-bytes-dddddddddddddddddddddddddddddddd')
    )
    SELECT file_name,
           octet_length(encode(payload_str)) AS byte_len,
           sha256(payload_str) AS content_hash
    FROM assets ORDER BY file_name
    """,
    doc="binaryFile-format ingest — the multimodal front door: raw "
    "asset files (images/audio/video) land as (path, length, content "
    "binary) rows straight off the DataSource, one task per file "
    "group, recursiveFileLookup walking nested modality directories. "
    "Metadata (length, sha256) is computed JVM-side; the bytes never "
    "cross into Python here — decode stages (mm_image_decode etc.) "
    "consume the same binary column downstream. At 100 TB this is the "
    "scan shape for blob corpora: no row-group format overhead, "
    "file-granular parallelism, partition pruning by directory.",
    tags=("scan", "format", "multimodal"),
)
def scan_binaryfile_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    payloads = {
        "img/asset_1.bin": "fake-jpeg-bytes-aaaaaaaaaaaaaaaa",
        "img/asset_2.bin": "fake-png-bytes-bbbbbbbbbbbbbbbbbbbbbbbb",
        "aud/asset_3.bin": "fake-wav-bytes-cccccccccccc",
        "vid/asset_4.bin": "fake-mp4-bytes-dddddddddddddddddddddddddddddddd",
    }
    root = tempfile.mkdtemp(prefix="besk_binf_")
    for rel, s in payloads.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(s.encode())
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.bin")
        .load(root)
    )
    # modality dir + file name, independent of the temp root
    name = F.regexp_extract("path", r"([^/]+/[^/]+)$", 1)
    return raw.select(
        name.alias("file_name"),
        F.col("length").cast("bigint").alias("byte_len"),
        F.sha2("content", 256).alias("content_hash"),
    ).orderBy("file_name")
