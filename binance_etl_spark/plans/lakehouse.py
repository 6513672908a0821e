"""Lakehouse-format operators over the snapshot commit log, wave 2:
write-audit-publish staging and bloom-pruned point deletes.

- sink_snapshot_wap: the Iceberg WAP pattern (operators/snapshots.py
  refs section) — stage on a branch, prove staged data is INVISIBLE
  to default readers, audit, then fast-forward publish atomically.
- sink_bloom_delete_keys: GDPR erasure by key via per-file manifest
  BLOOM FILTERS — the affected-file scan opens only files whose bloom
  says MAYBE, instead of scanning the table.

Reference parity note: the reference ETL (binance_etl, ~539 LoC) has
no table format; these are north-star extension operators per
SURVEY.md §2.12, mirroring the Iceberg/Delta features a 100 TB
training-corpus store needs (staged ingestion audits; erasure requests
that don't table-scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binance_etl_spark.catalog import load
from binance_etl_spark.plans.registry import register


@register(
    "sink_snapshot_wap",
    oracle="""
    SELECT 'staged_invisible' AS phase, COUNT(*) AS n,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events WHERE event_id < 1000
    UNION ALL
    SELECT 'published', COUNT(*), MIN(event_id), MAX(event_id)
    FROM events WHERE event_id < 2000
    """,
    doc="Write-audit-publish (WAP) staging over the snapshot log "
    "(operators/snapshots.py refs: create_branch / write_branch / "
    "publish_branch — the Iceberg WAP contract): events <1000 commit "
    "to main, events 1000..1999 are STAGED on a branch. The query "
    "reads the default (main) snapshot while the staged commit exists "
    "— proving branch commits are invisible to every default reader — "
    "then AUDITS the staged snapshot with a CHECK predicate and "
    "publishes by fast-forwarding main onto the branch head's file "
    "list BY NAME: zero data I/O, one atomic manifest replace, and "
    "readers see exactly the audited bytes. A failed audit leaves "
    "main untouched (pinned in tests/test_snapshot_refs.py, along "
    "with non-fast-forward refusal, vacuum ref-pinning, and the "
    "change-stream skipping staged commits). At 100 TB this is how "
    "ingestion lands: quarantine-by-default, publish-after-audit.",
    tags=("sink", "layout", "versioning"),
)
def sink_snapshot_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    e = load(spark, sf_dir, "events").select("event_id", "event_type")
    table = tempfile.mkdtemp(prefix="besk_wap_") + "/events_wap"
    SNAP.write_version(e.where(F.col("event_id") < 1000), table, mode="append")
    SNAP.create_branch(table, "staging")
    SNAP.write_branch(
        e.where((F.col("event_id") >= 1000) & (F.col("event_id") < 2000)),
        table,
        "staging",
    )

    def stats(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        ).select(F.lit(phase).alias("phase"), "n", "min_id", "max_id")

    # default read WHILE the staged commit exists: must not see it
    pre = stats(SNAP.read_version(spark, table), "staged_invisible")
    SNAP.publish_branch(
        table, "staging", spark=spark, audit={"ids_in_range": "event_id < 2000"}
    )
    post = stats(SNAP.read_version(spark, table), "published")
    return pre.unionByName(post)


@register(
    "sink_bloom_delete_keys",
    oracle="""
    SELECT 1 AS version, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 2, lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM documents WHERE doc_id NOT IN (3, 7, 11) GROUP BY lang
    """,
    doc="Point-delete by key via manifest BLOOM FILTERS "
    "(operators/snapshots.py: bloom_cols / select_files_point / "
    "delete_keys): the corpus commits range-partitioned with a "
    "per-file bloom over doc_id (built in one column-pruned "
    "distributed pass, stored as 256-byte bitmaps in the manifest), "
    "then three erasure-request keys delete through the bloom-pruned "
    "path — only files whose bloom answers MAYBE are opened by the "
    "affected-file scan; every definitely-absent file is skipped with "
    "ZERO I/O, driver-side, before Spark sees a path. At 100 TB with "
    "blooms on the id column an erasure batch touches a handful of "
    "files instead of scanning the table — min/max stats cannot do "
    "this for high-cardinality keys (every file's range spans the "
    "probe). No false negatives by construction; files without blooms "
    "stay candidates (tests/test_snapshot_blooms.py pins skipping, "
    "inheritance through appends/compaction, and the no-bloom "
    "degradation). The query value-checks pre- and post-delete "
    "snapshots per language.",
    tags=("sink", "layout", "versioning", "llm"),
)
def sink_bloom_delete_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_bloomdel_") + "/docs_bloom"
    SNAP.write_version(
        d.repartitionByRange(4, "doc_id"), table, bloom_cols=["doc_id"]
    )
    SNAP.delete_keys(spark, table, "doc_id", [3, 7, 11])

    def stats(df: DataFrame, v: int) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        ).select(F.lit(v).alias("version"), "lang", "n_docs", "sum_chars")

    v1 = stats(SNAP.read_version(spark, table, version=1), 1)
    v2 = stats(SNAP.read_version(spark, table), 2)
    return v1.unionByName(v2)


@register(
    "sink_delete_mor",
    oracle="""
    SELECT 'v1' AS phase, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'mor_deleted', lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM documents WHERE doc_id % 7 <> 3 GROUP BY lang
    UNION ALL
    SELECT 'purged', lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM documents WHERE doc_id % 7 <> 3 GROUP BY lang
    """,
    doc="Merge-on-read DELETE via deletion vectors "
    "(operators/snapshots.py::delete_where_mor — the Delta deletion-"
    "vector / Iceberg v2 positional-delete shape): the corpus commits "
    "as v1, then every doc with doc_id %% 7 = 3 is deleted WITHOUT "
    "touching a single data file — one scan records (file, "
    "row_position) pairs into a sidecar dataset the manifest carries, "
    "and every reader (read_version, read_changes, count_rows, the "
    "CoW maintenance ops) anti-joins it. The query value-checks all "
    "three lifecycle phases: the pre-delete snapshot, the MOR-deleted "
    "snapshot (file list verbatim, vector applied), and the post-"
    "compact snapshot where the vector has been PURGED into clean "
    "files (compaction reads through the DV filter by construction) — "
    "same values, zero vector. At 100 TB this is the difference "
    "between an erasure batch that rewrites 10 TB to drop 10k rows "
    "and one that writes a megabyte sidecar; maintenance folds the "
    "vectors in on its own schedule. Carried-file/rewritten-file DV "
    "semantics, CDC delta, vacuum retention, and no-resurrection "
    "under CoW/merge are pinned in tests/test_deletion_vectors.py.",
    tags=("sink", "layout", "versioning", "llm"),
)
def sink_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_mor_") + "/docs_mor"
    SNAP.write_version(d.repartitionByRange(4, "doc_id"), table)
    v2 = SNAP.delete_where_mor(spark, table, "doc_id % 7 = 3")
    v3 = SNAP.compact(spark, table, target_files=2)

    def stats(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        ).select(F.lit(phase).alias("phase"), "lang", "n_docs", "sum_chars")

    return (
        stats(SNAP.read_version(spark, table, version=1), "v1")
        .unionByName(stats(SNAP.read_version(spark, table, version=v2), "mor_deleted"))
        .unionByName(stats(SNAP.read_version(spark, table, version=v3), "purged"))
    )


@register(
    "sink_update_where",
    oracle="""
    WITH upd AS (
      SELECT doc_id, lang,
             CASE WHEN lang = 'en' THEN n_chars + 1000 ELSE n_chars END
               AS n_chars
      FROM documents
    )
    SELECT 'cow' AS path, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM upd GROUP BY lang
    UNION ALL
    SELECT 'mor', lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM upd GROUP BY lang
    """,
    doc="SQL UPDATE over the snapshot log, both execution strategies "
    "(operators/snapshots.py::update_where / update_where_mor — the "
    "Delta UPDATE and DV-update shapes): two copies of the corpus "
    "each run `UPDATE SET n_chars = n_chars + 1000 WHERE lang = "
    "'en'`; the copy-on-write path rewrites ONLY the files holding a "
    "matching row (untouched files carry by name), while the merge-"
    "on-read path rewrites NOTHING — matching rows' old versions are "
    "tombstoned by position into the deletion vector and the updated "
    "rows append as delta files, so write volume is O(matching rows). "
    "The query value-checks both snapshots against the same CASE-WHEN "
    "oracle, proving the two strategies value-identical. SET right-"
    "hand sides see the pre-update row (swap test), CHECK "
    "expectations gate both paths, CDC reports the MOR update as its "
    "delete+insert pair, and compaction folds the vector + delta "
    "files away — pinned in tests/test_snapshot_update.py.",
    tags=("sink", "layout", "versioning"),
)
def sink_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    base = tempfile.mkdtemp(prefix="besk_upd_")
    cow, mor = base + "/docs_cow", base + "/docs_mor"
    ranged = d.repartitionByRange(4, "doc_id")
    SNAP.write_version(ranged, cow)
    SNAP.write_version(ranged, mor)
    SNAP.update_where(spark, cow, "lang = 'en'", {"n_chars": "n_chars + 1000"})
    SNAP.update_where_mor(spark, mor, "lang = 'en'", {"n_chars": "n_chars + 1000"})

    def stats(df: DataFrame, path: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        ).select(F.lit(path).alias("path"), "lang", "n_docs", "sum_chars")

    return stats(SNAP.read_version(spark, cow), "cow").unionByName(
        stats(SNAP.read_version(spark, mor), "mor")
    )


@register(
    "sink_clone_restore",
    oracle="""
    SELECT 'restored' AS phase, COUNT(*) AS n, MIN(event_id) AS min_id,
           MAX(event_id) AS max_id
    FROM events WHERE event_id < 1000
    UNION ALL
    SELECT 'clone', COUNT(*), MIN(event_id), MAX(event_id)
    FROM events WHERE event_id < 1000 AND event_id % 5 <> 0
    """,
    doc="SHALLOW CLONE + RESTORE lifecycle over the snapshot log "
    "(operators/snapshots.py::shallow_clone / restore — the Delta "
    "shallow-clone and RESTORE shapes): events <1000 commit to the "
    "source table; a shallow clone forks it ZERO-COPY (v1 references "
    "the source's data files in place by absolute path — no bytes "
    "move) and runs a clone-LOCAL delete of every fifth event, which "
    "rewrites only affected borrowed files into clone-local ones; "
    "meanwhile the source suffers a bad delete and ROLLS BACK via "
    "restore — a new version carrying the pre-delete file list by "
    "name, zero data I/O, bad commit kept in history for forensics. "
    "The query value-checks both end states: the restored source "
    "equals the original corpus; the clone shows only its own edit. "
    "Clone vacuum can never reach source bytes (table-root guard), "
    "borrowed deletion vectors and bloom indexes keep working through "
    "path canonicalization — pinned in "
    "tests/test_snapshot_clone_restore.py. At 100 TB this is how "
    "experiments fork a corpus: try a cleanup recipe on a clone, "
    "diff, throw it away.",
    tags=("sink", "layout", "versioning"),
)
def sink_clone_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    e = load(spark, sf_dir, "events").select("event_id", "event_type")
    base = tempfile.mkdtemp(prefix="besk_clone_")
    src, clone = base + "/events_src", base + "/events_clone"
    SNAP.write_version(
        e.where(F.col("event_id") < 1000).repartitionByRange(4, "event_id"), src
    )
    SNAP.shallow_clone(src, clone)
    SNAP.delete_where(spark, clone, "event_id % 5 = 0")  # clone-local edit
    SNAP.delete_where(spark, src, "event_id < 500")  # the "bad" commit
    SNAP.restore(src, 1)  # zero-copy rollback

    def stats(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        ).select(F.lit(phase).alias("phase"), "n", "min_id", "max_id")

    return stats(SNAP.read_version(spark, src), "restored").unionByName(
        stats(SNAP.read_version(spark, clone), "clone")
    )


@register(
    "sink_compact_zorder",
    oracle="""
    SELECT 'clustered' AS phase, COUNT(*) AS n,
           CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
           CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT))
                AS BIGINT) AS sum_price_c
    FROM orders
    UNION ALL
    SELECT 'slice', COUNT(*),
           CAST(SUM(o_custkey) AS BIGINT),
           CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT))
                AS BIGINT)
    FROM orders
    WHERE o_custkey <= 200 AND CAST(o_totalprice AS DOUBLE) <= 50000
    """,
    doc="OPTIMIZE ZORDER over the snapshot log "
    "(operators/snapshots.py::compact(zorder_by=...) + "
    "operators/zorder.py): orders commits as an 8-file snapshot, then "
    "maintenance rewrites it clustered on the Morton curve of "
    "(o_custkey, o_totalprice) with per-file stats for both columns "
    "recorded in the new manifest. The query value-checks the "
    "clustered snapshot (row- and value-preserving — full-table "
    "checksum) AND a 2-D slice read through the PRUNED file set "
    "returned by select_files on each dimension, proving skipping is "
    "an I/O optimization, never a filter. At 100 TB this is the "
    "layout maintenance that turns (key, amount)-style dashboards "
    "from full scans into a handful of rectangle files; measured "
    "skip ratios are pinned in tests/test_zorder.py and "
    "tests/test_snapshot_refs.py::test_compact_zorder_clusters_and_prunes.",
    tags=("sink", "layout", "versioning"),
)
def sink_compact_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    table = tempfile.mkdtemp(prefix="besk_zc_") + "/orders_z"
    SNAP.write_version(o.repartition(8), table)
    v = SNAP.compact(
        spark, table, target_files=8, zorder_by=["o_custkey", "o_totalprice"]
    )

    price_c = F.floor(F.col("o_totalprice").cast("double") * 100).cast("bigint")

    def stats(df: DataFrame, phase: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_custkey").cast("bigint").alias("sum_cust"),
            F.sum(price_c).alias("sum_price_c"),
        ).select(F.lit(phase).alias("phase"), "n", "sum_cust", "sum_price_c")

    full = stats(SNAP.read_version(spark, table, v), "clustered")
    # 2-D slice through the stats-PRUNED file set of each dimension
    kept_a, _ = SNAP.select_files(table, v, "o_custkey", 0, 200)
    kept = [f for f in kept_a]
    sliced = (
        spark.read.parquet(*[_os.path.join(table, f) for f in kept])
        .where(
            (F.col("o_custkey") <= 200)
            & (F.col("o_totalprice").cast("double") <= 50000)
        )
    )
    return full.unionByName(stats(sliced, "slice"))


@register(
    "sink_partition_prune",
    oracle="""
    SELECT 'full' AS phase, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    UNION ALL
    SELECT 'pruned_read', lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM documents WHERE lang = 'en' GROUP BY lang
    """,
    doc="Metadata partitioning over the snapshot log "
    "(operators/snapshots.py::write_version(partition_by=...) — the "
    "Iceberg hidden-partition shape): the corpus commits range-"
    "clustered on lang with one partition per distinct value; the "
    "columns stay IN the data files (no Hive directories, nothing "
    "lost on per-file reads) and their per-file min/max collapse to "
    "equality in the manifest, so a partition-equality read prunes "
    "its file set from METADATA alone (select_files, zero file "
    "opens) before Spark plans a scan. The query value-checks the "
    "full snapshot AND the lang='en' slice read through the pruned "
    "file list — pruning as pure I/O optimization, never a filter. "
    "At 100 TB this is partition pruning without the Hive-layout "
    "taxes: rewrites, clones, and deletion vectors need no special "
    "casing because a partitioned table is an ordinary table "
    "(tests/test_snapshots.py::test_partition_by_prunes_from_metadata).",
    tags=("sink", "layout", "versioning"),
)
def sink_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_part_") + "/docs_part"
    SNAP.write_version(d, table, partition_by=["lang"])

    def stats(df: DataFrame, phase: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        ).select(F.lit(phase).alias("phase"), "lang", "n_docs", "sum_chars")

    full = stats(SNAP.read_version(spark, table), "full")
    kept, _skipped = SNAP.select_files(table, None, "lang", "en", "en")
    sliced = spark.read.parquet(
        *[_os.path.join(table, f) for f in kept]
    ).where(F.col("lang") == "en")
    return full.unionByName(stats(sliced, "pruned_read"))


@register(
    "sink_batch_source_read",
    oracle="""
    WITH final AS (
      SELECT doc_id, lang, n_chars, CAST(NULL AS DOUBLE) AS quality
      FROM documents WHERE doc_id % 5 <> 2
      UNION ALL
      SELECT doc_id, lang, n_chars, 0.5 FROM documents WHERE doc_id % 5 = 2
    )
    SELECT 'pushdown_read' AS phase, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(quality) AS BIGINT) AS n_quality
    FROM final WHERE doc_id < 30 GROUP BY lang
    UNION ALL
    SELECT 'time_travel', lang, COUNT(*),
           CAST(SUM(n_chars) AS BIGINT), 0
    FROM documents GROUP BY lang
    """,
    doc="The BATCH snapshot DataSource (sources/snapshot_batch.py): "
    "spark.read.format('snapshot') serves one consistent snapshot "
    "through the standard reader API — manifest-pinned schema, "
    "deletion vectors applied INSIDE the scan (each file partition "
    "drops its DV positions executor-side), pre-evolution files "
    "serving NULL for later columns, and manifest-stats FILE PRUNING "
    "via the Python DataSource pushFilters hook (a doc_id range "
    "predicate skips files whose min/max cannot match, driver-side, "
    "zero file opens — every filter is returned unhandled so Spark "
    "still row-filters). The query proves the full lifecycle: v1 in "
    "range-clustered files + MOR delete + metadata-only ADD COLUMNS + "
    "delta append, then a filtered read of the latest snapshot AND a "
    "versionAsOf time-travel read of v1. Scale: one Arrow-batched "
    "partition per KEPT file, the DV sidecar read per-task with a "
    "file-path predicate (the whole vector never ships through the "
    "driver); pruning behavior pinned in "
    "tests/test_snapshot_batch_source.py.",
    tags=("sink", "layout", "versioning", "scan"),
)
def sink_batch_source_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.sources.snapshot_batch import read_snapshot

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_bsrc_") + "/docs"
    SNAP.write_version(d.repartitionByRange(4, "doc_id"), table, stats_cols=["doc_id"])
    SNAP.delete_where_mor(spark, table, "doc_id % 5 = 2")
    SNAP.add_columns(table, {"quality": "double"})
    SNAP.write_version(
        d.where(F.col("doc_id") % 5 == 2).withColumn("quality", F.lit(0.5)),
        table,
        mode="append",
        stats_cols=["doc_id"],
    )

    latest = read_snapshot(spark, table, prune=True).where(F.col("doc_id") < 30)
    leg1 = latest.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.count("quality").cast("bigint").alias("n_quality"),
    ).select(F.lit("pushdown_read").alias("phase"), "lang", "n_docs", "sum_chars", "n_quality")
    v1 = read_snapshot(spark, table, version=1)
    leg2 = v1.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    ).select(
        F.lit("time_travel").alias("phase"),
        "lang",
        "n_docs",
        "sum_chars",
        F.lit(0).cast("bigint").alias("n_quality"),
    )
    return leg1.unionByName(leg2)


@register(
    "sink_unique_key_guard",
    oracle="""
    SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_live,
           CAST(2 AS INT) AS n_refused,
           CAST(2 * COUNT(*) AS BIGINT) AS n_distinct_keys,
           CAST(2 AS INT) AS n_versions
    FROM documents
    """,
    doc="PRIMARY-KEY enforcement lifecycle over the snapshot log "
    "(operators/snapshots.py::_enforce_unique, inherited table "
    "property like CHECK constraints): the corpus commits as v1 with "
    "unique_keys=[doc_id], an append REPEATING a key inside its own "
    "batch is refused, an append COLLIDING with a live key is refused "
    "(both leave no version behind — the staged bytes are cleaned, "
    "pinned in tests/test_snapshots.py), and a key-shifted copy "
    "commits cleanly as v2 — after which the table provably holds "
    "2N rows with 2N distinct keys. The vs-table probe bloom-prunes "
    "candidate files for small batches (<= 1024 distinct keys) and "
    "falls back to ONE key-projected column-pruned scan + semi-join "
    "for wide batches like this one — the stated O(table-scan) cost "
    "of PK enforcement without an index, paid per commit, never "
    "hidden. DV-deleted keys free their slots (re-insert allowed).",
    tags=("sink", "layout", "versioning", "llm"),
)
def sink_unique_key_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_uk_") + "/docs_pk"
    SNAP.write_version(d, table, unique_keys=["doc_id"])

    n_refused = 0
    dup = d.limit(1).unionByName(d.limit(1))  # same key twice in one batch
    try:
        SNAP.write_version(dup, table)
    except ValueError:
        n_refused += 1
    try:  # every key collides with a live one
        SNAP.write_version(d.limit(5), table)
    except ValueError:
        n_refused += 1

    shifted = d.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "n_chars"
    )
    SNAP.write_version(shifted, table)  # clean append, inherits the PK

    live = SNAP.read_version(spark, table)
    return live.agg(
        F.count(F.lit(1)).alias("n_live"),
        F.lit(n_refused).cast("int").alias("n_refused"),
        F.countDistinct("doc_id").alias("n_distinct_keys"),
        F.lit(len(SNAP.main_versions(table))).cast("int").alias("n_versions"),
    )


# --- sink_sql_dml: the ANSI-text DML front door -----------------------
#
# The DML rows above run through Python APIs; this one is driven by
# SHARED SQL TEXT (operators/sql_dml.py): the DELETE and UPDATE
# statements below execute VERBATIM on this engine (parsed to
# delete_where / update_where) and on the DuckDB oracle (executed as
# DuckDB DML on a temp copy); the MERGE executes here through the real
# parser (lowered to merge_into) and on the oracle via its standard
# DELETE+INSERT rewrite (DuckDB 1.0 has no MERGE). The TPC-H treatment
# for table maintenance.

_DML_BASE_SQL = (
    "SELECT event_id, user_id, event_type, value FROM events"
)

# source view: whole-row updates, CDC tombstones, and fresh inserts —
# disjoint deterministic slices of the base, keys unique by design
_DML_SOURCE_SQL = """
    SELECT event_id, user_id, 'merged' AS event_type, value * 3 AS value
    FROM events_dml_base WHERE event_id % 13 = 1
    UNION ALL
    SELECT event_id, user_id, 'tombstone' AS event_type, value
    FROM events_dml_base WHERE event_id % 13 = 5
    UNION ALL
    SELECT event_id + 1000000000 AS event_id, user_id,
           'inserted' AS event_type, value
    FROM events_dml_base WHERE event_id % 13 = 8
"""

_DML_DELETE = (
    "DELETE FROM events_dml WHERE event_type = 'click' AND event_id % 7 = 3"
)
_DML_UPDATE = (
    "UPDATE events_dml SET value = value + 1000, event_type = 'boosted' "
    "WHERE event_type = 'view' AND event_id % 11 = 0"
)
_DML_MERGE = (
    "MERGE INTO events_dml AS t USING events_dml_updates AS s "
    "ON t.event_id = s.event_id "
    "WHEN MATCHED AND s.event_type = 'tombstone' THEN DELETE "
    "WHEN MATCHED THEN UPDATE SET * "
    "WHEN NOT MATCHED THEN INSERT *"
)

_DML_FINAL_SQL = """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_value_e2,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events_dml GROUP BY event_type ORDER BY event_type
"""


@register(
    "sink_sql_dml",
    oracle=f"""
    CREATE OR REPLACE TEMP TABLE events_dml_base AS {_DML_BASE_SQL};
    CREATE OR REPLACE TEMP TABLE events_dml AS SELECT * FROM events_dml_base;
    CREATE OR REPLACE TEMP TABLE events_dml_updates AS {_DML_SOURCE_SQL};
    {_DML_DELETE};
    {_DML_UPDATE};
    CREATE OR REPLACE TEMP TABLE events_dml_premerge_keys AS
      SELECT event_id FROM events_dml;
    DELETE FROM events_dml
      WHERE event_id IN (SELECT event_id FROM events_dml_updates);
    INSERT INTO events_dml
      SELECT * FROM events_dml_updates
      WHERE event_type <> 'tombstone'
         OR event_id NOT IN (SELECT event_id FROM events_dml_premerge_keys);
    {_DML_FINAL_SQL}
    """,
    doc="ANSI-text DML chain over one snapshot table "
    "(operators/sql_dml.py): DELETE, UPDATE and a guarded-DELETE MERGE "
    "(tombstone/replace/insert) execute from shared SQL strings — the "
    "DELETE/UPDATE text runs verbatim on both engines; the MERGE "
    "lowers to merge_into here (delete_matched_only=True: ANSI "
    "semantics, so a tombstone whose key was already deleted INSERTS "
    "via WHEN NOT MATCHED — the corner the DML model fuzzer caught) "
    "and to its ANSI DELETE+INSERT rewrite on the oracle, with "
    "matched-ness evaluated against the pre-merge key set. Scale posture is the underlying operators': "
    "affected-file-only copy-on-write rewrites, broadcast key "
    "semi-joins, untouched files carried by name — the text front end "
    "adds zero plan weight.",
    tags=("sink", "dml", "sql", "versioning"),
)
def sink_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.operators.sql_dml import execute_dml

    base = spark.sql(
        _DML_BASE_SQL.replace("FROM events", "FROM {e}"),
        e=load(spark, sf_dir, "events"),
    )
    table = tempfile.mkdtemp(prefix="besk_sqldml_") + "/events_dml"
    SNAP.write_version(base.repartition(4), table)

    base.createOrReplaceTempView("events_dml_base")
    spark.sql(_DML_SOURCE_SQL).createOrReplaceTempView("events_dml_updates")

    for stmt in (_DML_DELETE, _DML_UPDATE, _DML_MERGE):
        execute_dml(spark, stmt, {"events_dml": table})

    SNAP.read_version(spark, table).createOrReplaceTempView("events_dml")
    return spark.sql(_DML_FINAL_SQL)


# --- sink_sql_merge_cols: column-level ANSI MERGE -------------------
#
# The star-mode chain above is the CDC shape; this is the WAREHOUSE
# shape — MERGE with column assignments and an explicit INSERT list,
# where the source carries a DIFFERENT schema than the target (a
# (key, delta) feed). The engine lowers it by constructing the
# effective whole-row source (operators/sql_dml.py COLUMN mode); the
# oracle runs DuckDB's UPDATE..FROM + anti-join INSERT rewrite.

_MC_SOURCE_SQL = """
    SELECT event_id, value * 0.5 AS delta
    FROM events_dml_base WHERE event_id % 9 = 2
    UNION ALL
    SELECT event_id + 2000000000 AS event_id, 42.0 AS delta
    FROM events_dml_base WHERE event_id % 9 = 4
"""

_MC_MERGE = (
    "MERGE INTO events_cols AS t USING events_cols_updates AS s "
    "ON t.event_id = s.event_id "
    "WHEN MATCHED THEN UPDATE SET value = t.value + s.delta, "
    "event_type = 'adjusted' "
    "WHEN NOT MATCHED THEN INSERT (event_id, user_id, event_type, value) "
    "VALUES (s.event_id, -1, 'inserted', s.delta)"
)

_MC_FINAL_SQL = """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_value_e2,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events_cols GROUP BY event_type ORDER BY event_type
"""


@register(
    "sink_sql_merge_cols",
    oracle=f"""
    CREATE OR REPLACE TEMP TABLE events_dml_base AS {_DML_BASE_SQL};
    CREATE OR REPLACE TEMP TABLE events_cols AS
      SELECT * FROM events_dml_base;
    CREATE OR REPLACE TEMP TABLE events_cols_updates AS {_MC_SOURCE_SQL};
    INSERT INTO events_cols
      SELECT s.event_id, -1, 'inserted', s.delta
      FROM events_cols_updates s LEFT JOIN events_dml_base t
        ON t.event_id = s.event_id
      WHERE t.event_id IS NULL;
    UPDATE events_cols
      SET value = events_cols.value + s.delta, event_type = 'adjusted'
      FROM events_cols_updates s
      WHERE events_cols.event_id = s.event_id
        AND events_cols.event_type <> 'inserted';
    {_MC_FINAL_SQL}
    """,
    doc="Column-level ANSI MERGE (UPDATE SET col = expr referencing "
    "t./s., INSERT (cols) VALUES (exprs)) over a source whose schema "
    "differs from the target's — lowered by constructing the "
    "effective whole-row source (one key join, broadcast for small "
    "feeds) into the same affected-file-only copy-on-write merge "
    "commit. Oracle = the UPDATE..FROM + anti-join INSERT rewrite. "
    "Scale posture: merge_into's (only files holding matched keys "
    "rewrite; untouched files carry by name).",
    tags=("sink", "dml", "sql", "versioning"),
)
def sink_sql_merge_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.operators.sql_dml import execute_dml

    base = spark.sql(
        _DML_BASE_SQL.replace("FROM events", "FROM {e}"),
        e=load(spark, sf_dir, "events"),
    )
    table = tempfile.mkdtemp(prefix="besk_sqlmc_") + "/events_cols"
    SNAP.write_version(base.repartition(4), table)

    base.createOrReplaceTempView("events_dml_base")
    spark.sql(_MC_SOURCE_SQL).createOrReplaceTempView("events_cols_updates")

    execute_dml(spark, _MC_MERGE, {"events_cols": table})

    SNAP.read_version(spark, table).createOrReplaceTempView("events_cols")
    return spark.sql(_MC_FINAL_SQL)


# --- sink_sql_rf_tpch: the TPC-H refresh functions ---------------------
#
# TPC-H is queries (Q1-Q22, all shipped as shared text) PLUS the
# refresh streams: RF1 inserts a new-sales slice, RF2 deletes an
# old-sales slice (spec 2.27-2.28). This runs both as ANSI text
# against a snapshot copy of lineitem through the same front end the
# warehouse chain uses, then re-runs the Q1 pricing summary over the
# maintained table — completing the TPC-H story with its maintenance
# half. Deterministic slices stand in for the spec's generated
# refresh files: RF1 re-keys the l_orderkey % 97 = 11 rows by +1e9,
# RF2 deletes l_orderkey % 97 = 29.

_RF_BASE_SQL = (
    "SELECT l_orderkey, l_quantity, l_extendedprice, l_discount, l_tax, "
    "l_returnflag, l_linestatus FROM lineitem"
)
_RF1_INSERT = (
    "INSERT INTO li_rf SELECT l_orderkey + 1000000000, l_quantity, "
    "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus "
    "FROM li_rf_base WHERE l_orderkey % 97 = 11"
)
_RF2_DELETE = "DELETE FROM li_rf WHERE l_orderkey % 97 = 29"
_RF_FINAL_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS sum_qty_e2,
           CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS sum_base_e2,
           COUNT(*) AS count_order
    FROM li_rf GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


@register(
    "sink_sql_rf_tpch",
    oracle=f"""
    CREATE OR REPLACE TEMP TABLE li_rf_base AS {_RF_BASE_SQL};
    CREATE OR REPLACE TEMP TABLE li_rf AS SELECT * FROM li_rf_base;
    {_RF1_INSERT};
    {_RF2_DELETE};
    {_RF_FINAL_SQL}
    """,
    doc="TPC-H refresh functions as ANSI text over the snapshot log: "
    "RF1 (INSERT INTO ... SELECT, a new-sales slice re-keyed clear of "
    "the key space) and RF2 (DELETE of an old-sales slice) execute "
    "through the DML front end against a snapshot copy of lineitem, "
    "then the Q1 pricing summary re-runs over the maintained table — "
    "the maintenance half of TPC-H, driven by the same shared "
    "statements on both engines. Scale posture is the committers': "
    "RF1 is a pure append commit; RF2 rewrites only the files holding "
    "deleted keys and carries the rest by name.",
    tags=("sink", "dml", "sql", "versioning"),
)
def sink_sql_rf_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP
    from binance_etl_spark.operators.sql_dml import execute_dml

    base = spark.sql(
        _RF_BASE_SQL.replace("FROM lineitem", "FROM {li}"),
        li=load(spark, sf_dir, "lineitem"),
    )
    table = tempfile.mkdtemp(prefix="besk_rf_") + "/li_rf"
    SNAP.write_version(base.repartition(8), table)
    base.createOrReplaceTempView("li_rf_base")
    for stmt in (_RF1_INSERT, _RF2_DELETE):
        execute_dml(spark, stmt, {"li_rf": table})
    SNAP.read_version(spark, table).createOrReplaceTempView("li_rf")
    return spark.sql(_RF_FINAL_SQL)


@register(
    "sink_rename_column",
    oracle="""
    SELECT 'v1' AS phase, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE doc_id % 2 = 0 GROUP BY lang
    UNION ALL
    SELECT 'head', 'all', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM documents
    """,
    doc="ALTER TABLE RENAME/DROP COLUMN lifecycle over the snapshot "
    "log (operators/snapshots.py::rename_column / drop_column — the "
    "Delta column-mapping model): the even half of documents commits, "
    "n_chars RENAMES to chars (metadata-only: files keep the "
    "immutable PHYSICAL name, only the manifest's logical schema and "
    "logical->physical map change — ZERO bytes move at any table "
    "size), the odd half appends under the NEW logical name (its "
    "files physically carry the old one), lang DROPS (bytes stay in "
    "place, unread; the physical name joins the retired ledger so it "
    "can never alias back). The query value-checks v1 through time "
    "travel under its OWN original names and the head under the "
    "post-rename schema — totals must equal plain per-name "
    "aggregation of the source. Constraint guards, stats-pruning "
    "translation, DV reads, restore/clone and the batch DataSource "
    "under mapping are pinned in tests/test_column_mapping.py.",
    tags=("sink", "layout", "versioning"),
)
def sink_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from binance_etl_spark.operators import snapshots as SNAP

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = tempfile.mkdtemp(prefix="besk_rencol_") + "/docs"
    SNAP.write_version(
        d.where(F.col("doc_id") % 2 == 0).repartitionByRange(2, "doc_id"),
        table,
    )
    SNAP.rename_column(table, "n_chars", "chars")
    SNAP.write_version(
        d.where(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", F.col("n_chars").alias("chars")
        ),
        table,
    )
    SNAP.drop_column(table, "lang")
    v1 = (
        SNAP.read_version(spark, table, SNAP.versions(table)[0])
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .select(F.lit("v1").alias("phase"), "lang", "n_docs", "sum_chars")
    )
    head = (
        SNAP.read_version(spark, table)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chars").cast("bigint").alias("sum_chars"),
        )
        .select(
            F.lit("head").alias("phase"),
            F.lit("all").alias("lang"),
            "n_docs",
            "sum_chars",
        )
    )
    return v1.unionByName(head)
