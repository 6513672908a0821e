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

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_CRLF = "\r\n"
WARC_SCHEMA = (
    "record_id STRING, warc_type STRING, target_uri STRING, "
    "content_length BIGINT, payload BINARY"
)


def write_warc(records, path: str) -> int:
    """Serialize ``(record_id, target_uri, payload: bytes)`` tuples as
    minimal WARC/1.0 response records. Returns the record count."""
    n = 0
    with open(path, "wb") as f:
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

    def partitions(self):
        offs = _index_offsets(self.path)
        if not offs:
            return [_ByteRange(self.path, 0, 0)]
        size = os.path.getsize(self.path)
        step = max(1, self.records_per_partition)
        parts = []
        for i in range(0, len(offs), step):
            end = offs[i + step] if i + step < len(offs) else size
            parts.append(_ByteRange(self.path, offs[i], end))
        return parts

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


class WarcDataSource(DataSource):
    """spark.read.format("warc").option("path", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> WarcBatchReader:
        return WarcBatchReader(self.options)


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
