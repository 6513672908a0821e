"""Batch Python DataSource over the snapshot commit log — the reader
API symmetry partner of sources/snapshot_stream.py: where that tails a
table (`spark.readStream.format("snapshot_changes")`), this reads one
consistent snapshot through the STANDARD batch reader surface,

    spark.read.format("snapshot").option("path", t)
        [.option("versionAsOf", n)].load(),

so any Spark consumer — including ones that know nothing about this
repo's `operators.snapshots` module — gets:

- manifest-pinned schema (reads deterministic under schema evolution;
  files from before an additive evolution serve NULL for later
  columns, exactly like `read_version`);
- deletion-vector application INSIDE the scan: each file partition
  drops its DV positions executor-side while reading, so merge-on-read
  deletes are invisible without any caller-visible anti-join;
- manifest-stats FILE PRUNING via `pushFilters`: =, <, <=, >, >=, IN
  predicates on stats-bearing columns skip files whose min/max ranges
  cannot match, decided driver-side with ZERO file opens — the
  Iceberg/Delta data-skipping move surfaced through the Python
  DataSource filter-pushdown API. Every filter is returned as
  unhandled (pruning is an I/O optimization, never a row filter), so
  Spark still applies the full predicate to scanned rows.

Scale: one partition per kept file (the natural parallel unit;
executors read parquet + their file's DV slice directly — no driver
data path), Arrow record batches end-to-end (no per-row Python). The
DV sidecar is read per-partition with a file-path predicate pushed to
the parquet dataset reader, so a 10k-file table with one huge DV never
ships the whole vector through the driver or to every task.

Reference parity note: the reference ETL (binance_etl, ~539 LoC) has
no table format; north-star extension per SURVEY.md §2.12/FORMAT.md.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructField, StructType

from binance_etl_spark.operators.snapshots import (
    _load_manifest,
    _manifest_schema,
    main_versions,
    versions,
)


class _FilePart(InputPartition):
    def __init__(self, path: str, dv_keys: list[str], dv_dir: str | None):
        self.path = path
        # Every spelling of this file the DV sidecar may record in `f`:
        # the manifest's own, plus — for a sidecar borrowed from a
        # shallow clone's source table — the source-relative form
        # (borrowed sidecars keep source-relative `f` entries while the
        # clone manifest lists the same files absolutely; matching only
        # the clone spelling would silently serve deleted rows). Mirrors
        # operators/snapshots._dv_df's canonicalization.
        self.dv_keys = dv_keys
        self.dv_dir = dv_dir


def _resolve_manifest(options: dict) -> dict:
    import os as _os

    table_dir = options["path"]
    v = options.get("versionasof")
    ts = options.get("timestampasof")
    if v is not None and ts is not None:
        raise ValueError("versionAsOf and timestampAsOf are mutually exclusive")
    if v is not None:
        version = int(v)
        if version not in versions(table_dir):
            raise FileNotFoundError(f"snapshot v{version} not committed in {table_dir}")
    elif ts is not None:
        # the read_version_as_of contract: manifest mtime gates
        # eligibility, version number orders the log
        from binance_etl_spark.operators.snapshots import _manifest_dir

        mdir = _manifest_dir(table_dir)
        eligible = [
            mv
            for mv in main_versions(table_dir)
            if _os.path.getmtime(_os.path.join(mdir, f"v{mv}.json")) <= float(ts)
        ]
        if not eligible:
            raise FileNotFoundError(
                f"{table_dir}: no snapshot committed at or before ts={ts}"
            )
        version = eligible[-1]
    else:
        main = main_versions(table_dir)
        if not main:
            raise FileNotFoundError(f"no main-line snapshots in {table_dir}")
        version = main[-1]
    return _load_manifest(table_dir, version)


def _batch_schema(options: dict) -> StructType:
    schema = _manifest_schema(_resolve_manifest(options))
    if schema is None:
        raise ValueError(
            f"{options['path']}: manifest predates versioned schemas; "
            "recommit (any append) to enable the batch source"
        )
    # nullable like every evolved read: pre-evolution files serve NULL
    return StructType([StructField(f.name, f.dataType, True) for f in schema.fields])


class SnapshotBatchReader(DataSourceReader):
    """Default reader: NO pushFilters. Spark 4.1's Python-DataSource
    filter pushdown mis-associates scans when one load() relation is
    scanned under DIFFERENT pushed filters in a single query (observed:
    a join between an is_doc=0 leg and an is_doc=1 leg of the same
    relation returned zero rows even though each scan's reader planned
    the correct files — the per-scan partition lists get crossed).
    Identical scans (no pushdown) reuse safely, so the default reader
    implements none and stats pruning is OPT-IN per read via
    .option("pruneFiles", "true") — see SnapshotPruningBatchReader's
    single-scan contract."""

    def __init__(self, options: dict, schema: StructType):
        self.table_dir = options["path"]
        self.manifest = _resolve_manifest(options)
        self.spark_schema = schema
        # logical -> physical column names (metadata-only renames):
        # files carry PHYSICAL names; the scan serves LOGICAL ones
        self.col_map: dict = dict(self.manifest.get("column_mapping", {}))

    def _kept_files(self) -> list[str]:
        return list(self.manifest["files"])

    def partitions(self):
        dv_rel = self.manifest.get("dv")
        dv_dir = (
            (dv_rel if os.path.isabs(dv_rel) else os.path.join(self.table_dir, dv_rel))
            if dv_rel
            else None
        )
        # borrowed (absolute) sidecar => also match source-relative `f`
        src_root = (
            os.path.dirname(os.path.dirname(dv_rel))
            if dv_rel and os.path.isabs(dv_rel)
            else None
        )
        parts = []
        for rel in self._kept_files():
            path = rel if os.path.isabs(rel) else os.path.join(self.table_dir, rel)
            keys = [rel]
            if src_root and rel.startswith(src_root + "/"):
                keys.append(rel[len(src_root) + 1 :])
            parts.append(_FilePart(path, keys, dv_dir))
        return parts or [_FilePart("", [], None)]

    def read(self, partition: _FilePart):
        if not partition.path:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self.spark_schema)
        deleted: set[int] = set()
        if partition.dv_dir:
            # file-path predicate pushes into the sidecar dataset read:
            # each task loads only ITS file's positions
            dv = pq.read_table(
                partition.dv_dir,
                filters=[("f", "in", partition.dv_keys)],
                columns=["pos"],
            )
            deleted = set(dv.column("pos").to_pylist())

        pf = pq.ParquetFile(partition.path)
        present = set(pf.schema_arrow.names)
        phys = {f.name: self.col_map.get(f.name, f.name) for f in target}
        want = [phys[f.name] for f in target if phys[f.name] in present]
        offset = 0
        for batch in pf.iter_batches(columns=want or None):
            n = batch.num_rows
            if deleted:
                mask = pa.array(
                    [offset + i not in deleted for i in range(n)], type=pa.bool_()
                )
                batch = batch.filter(mask)
            offset += n
            if batch.num_rows == 0:
                continue
            arrays = []
            for field in target:
                if phys[field.name] in present:
                    col = batch.column(
                        batch.schema.get_field_index(phys[field.name])
                    )
                    if col.type != field.type:
                        col = col.cast(field.type)
                    arrays.append(col)
                else:  # pre-evolution file: later columns are NULL
                    arrays.append(pa.nulls(batch.num_rows, type=field.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=target)


class SnapshotPruningBatchReader(SnapshotBatchReader):
    """Opt-in stats-pruning reader (.option("pruneFiles", "true")):
    implements pushFilters so =, <, <=, >, >=, IN predicates on
    stats-bearing columns skip files driver-side with zero opens.

    CONTRACT: use on a relation consumed by ONE scan shape per query
    (the overwhelmingly common case — read, filter, aggregate). Do NOT
    reuse a single pruned load() under conflicting filters inside one
    query: Spark's Python-source pushdown crosses the per-scan
    partition lists (see SnapshotBatchReader's docstring); take a
    fresh read_snapshot() per leg instead. As defense in depth, when
    this reader DOES receive multiple pushFilters calls it keeps the
    UNION of every call's survivors, so over-pruning can never drop a
    sibling leg's files."""

    def __init__(self, options: dict, schema: StructType):
        super().__init__(options, schema)
        self._range_sets: list[list[tuple[str, object, object]]] = []

    def pushFilters(self, filters):
        ranges: list[tuple[str, object, object]] = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            if isinstance(f, EqualTo):
                ranges.append((col, f.value, f.value))
            elif isinstance(f, In):
                vals = list(f.value)
                if vals and all(v is not None for v in vals):
                    ranges.append((col, min(vals), max(vals)))
            elif isinstance(f, GreaterThan) or isinstance(f, GreaterThanOrEqual):
                # closed bound is conservative for the strict case
                ranges.append((col, f.value, None))
            elif isinstance(f, LessThan) or isinstance(f, LessThanOrEqual):
                ranges.append((col, None, f.value))
        self._range_sets.append(ranges)
        return filters  # all unhandled: Spark re-applies row-level

    def _kept_files(self) -> list[str]:
        stats = self.manifest.get("stats", {})
        # Stats are keyed by PHYSICAL names; translate into a LOCAL
        # list (never mutate self._range_sets: Spark may interleave
        # partitions()/pushFilters calls, and re-translating an
        # already-translated name must stay impossible by construction,
        # not by the ledger's no-collision invariant).
        range_sets = self._range_sets
        if self.col_map:
            range_sets = [
                [(self.col_map.get(c, c), lo, hi) for c, lo, hi in rs]
                for rs in range_sets
            ]

        def excluded_by(fstats: dict, ranges) -> bool:
            for col, lo, hi in ranges:
                mm = fstats.get(col)
                if mm is None:
                    continue  # no stats -> cannot exclude
                if (hi is not None and mm[0] > hi) or (
                    lo is not None and mm[1] < lo
                ):
                    return True
            return False

        kept = []
        for rel in self.manifest["files"]:
            fstats = stats.get(rel, {})
            # keep unless EVERY scan's range-set excludes it
            if range_sets and all(
                excluded_by(fstats, rs) for rs in range_sets
            ):
                continue
            kept.append(rel)
        return kept


class SnapshotBatchDataSource(DataSource):
    """spark.read.format("snapshot").option("path", t).load()"""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self) -> StructType:
        return _batch_schema(self.options)

    def reader(self, schema) -> SnapshotBatchReader:
        if str(self.options.get("prunefiles", "false")).lower() == "true":
            return SnapshotPruningBatchReader(self.options, schema)
        return SnapshotBatchReader(self.options, schema)


_REGISTERED: set[str] = set()


def register(spark) -> None:
    key = spark.sparkContext.applicationId
    if key not in _REGISTERED:
        spark.dataSource.register(SnapshotBatchDataSource)
        # pushFilters is rejected outright while this flag is off (a
        # bare/driver session leaves it at the false default), and it
        # is runtime-settable — flip it here so stats pruning works on
        # ANY session that reads through this source.
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        _REGISTERED.add(key)


def read_snapshot(
    spark,
    table_dir: str,
    version: int | None = None,
    timestamp: float | None = None,
    prune: bool = False,
):
    """One consistent snapshot through the standard batch reader.
    `version` is the Delta `versionAsOf` twin; `timestamp` (unix
    seconds) is `timestampAsOf` — newest snapshot committed at or
    before that wall clock (manifest mtime, read_version_as_of's
    contract). `prune=True` enables manifest-stats file pruning for
    this relation — opt-in because of the Spark Python-source
    pushdown hazard documented on SnapshotPruningBatchReader: only
    prune a relation consumed by one scan shape per query."""
    register(spark)
    r = spark.read.format("snapshot").option("path", os.fspath(table_dir))
    if version is not None:
        r = r.option("versionAsOf", str(version))
    if timestamp is not None:
        r = r.option("timestampAsOf", repr(float(timestamp)))
    if prune:
        r = r.option("pruneFiles", "true")
    return r.load()
