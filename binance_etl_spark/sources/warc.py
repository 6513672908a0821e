"""WARC-style crawl-archive source: PySpark 4 Python Data Source over
minimal WARC/1.0 files — the ingestion format of web-corpus pipelines
(Common-Crawl-shaped training data arrives as WARC record streams).

Writer (`write_warc`) serializes 'response' records with the standard
header block (WARC-Type / WARC-Record-ID / WARC-Target-URI /
Content-Length, CRLF line ends, blank-line separator, double-CRLF
record terminator); the reader parses exactly that grammar back.

Scale design — BYTE-OFFSET partitions, not line skipping: WARC records
are length-prefixed (Content-Length), so one cheap driver-side pass
builds the record offset index and executors ``seek()`` straight to
their slice — each partition reads only its own bytes (unlike the
replay JSONL source's O(file) line skip, acceptable there because
frame logs are small). Real crawl archives ship this index beside the
archive (cdx); here it is derived because fixtures are tiny. Payloads
are yielded as Arrow RecordBatches (binary column), never per-row
Python tuples.
"""

from __future__ import annotations

import glob as _glob
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_CRLF = "\r\n"
WARC_SCHEMA = (
    "record_id STRING, warc_type STRING, target_uri STRING, "
    "content_length BIGINT, payload BINARY"
)


def _write_records(f, records) -> int:
    n = 0
    for record_id, uri, payload in records:
        header = (
            f"WARC/1.0{_CRLF}"
            f"WARC-Type: response{_CRLF}"
            f"WARC-Record-ID: <{record_id}>{_CRLF}"
            f"WARC-Target-URI: {uri}{_CRLF}"
            f"Content-Length: {len(payload)}{_CRLF}"
            f"{_CRLF}"
        )
        f.write(header.encode("utf-8"))
        f.write(payload)
        f.write((_CRLF * 2).encode())
        n += 1
    return n


def write_warc(records, path: str) -> int:
    """Serialize ``(record_id, target_uri, payload: bytes)`` tuples as
    minimal WARC/1.0 response records into ONE file. Single-process
    helper (fixtures/tests); the scale path is the sharded DataSource
    writer below (`df.write.format("warc")`), which streams one shard
    per task with no driver collect."""
    with open(path, "wb") as f:
        return _write_records(f, records)


def _index_offsets(path: str) -> list[int]:
    """Driver-side offset index: one sequential pass, header-only reads
    (payloads are SKIPPED via Content-Length seek)."""
    offsets = []
    with open(path, "rb") as f:
        size = os.fstat(f.fileno()).st_size
        while f.tell() < size:
            start = f.tell()
            line = f.readline()
            if not line.strip():
                continue  # stray separator
            if not line.startswith(b"WARC/"):
                raise ValueError(f"{path}: not a WARC record at byte {start}")
            offsets.append(start)
            clen = None
            while True:
                h = f.readline()
                if h in (b"\r\n", b"\n", b""):
                    break
                if h.lower().startswith(b"content-length:"):
                    clen = int(h.split(b":", 1)[1].strip())
            if clen is None:
                raise ValueError(f"{path}: record at {start} has no Content-Length")
            f.seek(clen + 4, os.SEEK_CUR)  # payload + CRLF CRLF
    return offsets


def _parse_records(path: str, start_byte: int, end_byte: int):
    """Parse records whose header starts in [start_byte, end_byte)."""
    out = []
    with open(path, "rb") as f:
        f.seek(start_byte)
        while f.tell() < end_byte:
            line = f.readline()
            if not line.strip():
                continue
            headers = {}
            while True:
                h = f.readline()
                if h in (b"\r\n", b"\n", b""):
                    break
                k, _, v = h.decode("utf-8").partition(":")
                headers[k.strip().lower()] = v.strip()
            clen = int(headers["content-length"])
            payload = f.read(clen)
            f.read(4)  # record terminator CRLF CRLF
            out.append(
                (
                    headers.get("warc-record-id", "").strip("<>"),
                    headers.get("warc-type", ""),
                    headers.get("warc-target-uri", ""),
                    clen,
                    payload,
                )
            )
    return out


@dataclass
class _ByteRange(InputPartition):
    path: str
    start: int
    end: int  # exclusive byte offset


class WarcBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.records_per_partition = int(options.get("recordsperpartition", 1024))

    def _files(self) -> list[str]:
        # A directory scans every shard in it (the sharded writer's
        # layout); a plain path is a single archive file.
        if os.path.isdir(self.path):
            return sorted(_glob.glob(os.path.join(self.path, "*.warc")))
        return [self.path]

    def partitions(self):
        step = max(1, self.records_per_partition)
        parts = []
        for path in self._files():
            offs = _index_offsets(path)
            if not offs:
                continue
            size = os.path.getsize(path)
            for i in range(0, len(offs), step):
                end = offs[i + step] if i + step < len(offs) else size
                parts.append(_ByteRange(path, offs[i], end))
        return parts or [_ByteRange(self.path if not os.path.isdir(self.path) else os.devnull, 0, 0)]

    def read(self, partition: _ByteRange):
        import pyarrow as pa

        recs = _parse_records(partition.path, partition.start, partition.end)
        if not recs:
            return
        ids, types, uris, lens, payloads = zip(*recs)
        yield pa.record_batch(
            [
                pa.array(ids, pa.string()),
                pa.array(types, pa.string()),
                pa.array(uris, pa.string()),
                pa.array(lens, pa.int64()),
                pa.array(payloads, pa.binary()),
            ],
            names=[
                "record_id",
                "warc_type",
                "target_uri",
                "content_length",
                "payload",
            ],
        )


@dataclass
class _Shard(WriterCommitMessage):
    tmp_path: str
    rows: int


class WarcShardWriter(DataSourceWriter):
    """Executor-side sharded WARC writer: each task streams its
    partition into a private dot-prefixed temp shard; the driver's
    commit() renames temps into final `part-*.warc` shards only after
    every task succeeded, then sweeps this job's stray temps (failed /
    speculative attempts). Same task-temp + driver-rename protocol as
    refsink.py:69-107 — O(1) driver memory, no collect, no shared-file
    contention; a 100 TB corpus writes as many shards as it has tasks.

    Input schema: (record_id STRING, target_uri STRING,
    payload BINARY) — the writer half of the reader's grammar."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink requires a 'path' option")
        names = [f.name for f in schema.fields]
        for required in ("record_id", "target_uri", "payload"):
            if required not in names:
                raise ValueError(f"warc sink input must carry '{required}' (got {names})")
        self.overwrite = overwrite
        self.job = uuid.uuid4().hex[:12]

    # -- executor side ----------------------------------------------------
    def write(self, iterator) -> _Shard:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".tmp-{self.job}-part-{uuid.uuid4().hex}.warc")
        with open(tmp, "wb") as f:
            n = _write_records(
                f,
                (
                    (row["record_id"], row["target_uri"], bytes(row["payload"]))
                    for row in iterator
                ),
            )
        return _Shard(tmp_path=tmp, rows=n)

    # -- driver side ------------------------------------------------------
    def commit(self, messages) -> None:
        # Publish the new shards FIRST, then delete stale part files
        # from other job ids (finals are job-id-namespaced, so there is
        # no name collision). Ordering matters in overwrite mode: a
        # driver crash mid-commit then leaves a mixed-but-readable
        # directory, never an empty one — the same rename-aside
        # discipline as refsink/_swap_state, where delete is always the
        # last step after the replacement is visible.
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{self.job}-{i:05d}.warc")
            os.replace(m.tmp_path, final)
        if self.overwrite:
            for old in _glob.glob(os.path.join(self.path, "part-*.warc")):
                if f"part-{self.job}-" not in os.path.basename(old):
                    os.remove(old)
        for stray in _glob.glob(os.path.join(self.path, f".tmp-{self.job}-part-*.warc")):
            os.remove(stray)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class WarcDataSource(DataSource):
    """spark.read.format("warc").option("path", ...).load() and
    df.write.format("warc").option("path", dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> WarcBatchReader:
        return WarcBatchReader(self.options)

    def writer(self, schema, overwrite: bool) -> WarcShardWriter:
        return WarcShardWriter(self.options, schema, overwrite)


def register(spark) -> None:
    spark.dataSource.register(WarcDataSource)


def read_warc(spark, path: str, records_per_partition: int = 1024):
    register(spark)
    return (
        spark.read.format("warc")
        .option("path", os.fspath(path))
        .option("recordsPerPartition", str(records_per_partition))
        .load()
    )


def write_warc_sharded(df, out_dir: str, mode: str = "overwrite") -> None:
    """Distributed write: df(record_id, target_uri, payload) -> one
    WARC shard per task under `out_dir` (read back with read_warc on
    the directory)."""
    register(df.sparkSession)
    df.write.format("warc").option("path", os.fspath(out_dir)).mode(mode).save()
