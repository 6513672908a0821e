"""Reference-layout CSV sink: PySpark 4 Python Data Source WRITER,
batch (RefCsvWriter) and streaming (RefCsvStreamWriter).

The write-side twin of sources/replay.py — together they complete the
full Python DataSource matrix (batch read / stream read / batch write
/ stream write).
Reproduces the reference's CSV sink contract (storage.py:57-75):
header-once, append-only chunks, one logical table per
`{symbol}.{market}.{table}` name — but with a real distributed commit
protocol instead of the reference's lossy in-process buffer (rows
under batch_size are dropped on stop, base.py:39-45; this sink loses
nothing).

Commit protocol (the part a single-process sink never needs): each
task writes its partition to a private dot-prefixed temp file and
returns the path as its WriterCommitMessage; the driver's `commit()`
renames the reported temp files into uniquely-named final parts only
after every task succeeded, then sweeps any stray temps (failed or
speculatively-duplicated attempts that never reported); `abort()`
removes the reported ones. Appends never collide: part names carry a
per-job token, so re-appending adds files instead of clobbering the
previous batch; overwrite mode clears prior parts first. At scale
each task streams its own file: no driver collect, no shared-file
contention, O(1) driver memory.

Filesystem note: rename-based commit assumes driver and executors
share one filesystem (local mode, NFS, or any posix-rename object
store mount). A multi-node HDFS/S3 deployment would swap the
os.replace calls for the corresponding FileSystem.rename — the
protocol shape (task-temp -> driver-publish) is unchanged.
"""

from __future__ import annotations

import csv
import glob
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _Part(WriterCommitMessage):
    tmp_path: str
    rows: int


class RefCsvWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ref_csv sink requires a 'path' option")
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite
        # Job token minted once on the driver and shipped to every task
        # via writer pickling: temp AND final part names carry it, so
        # two concurrent append jobs against the same table never touch
        # each other's files (commit sweeps only its own token's temps).
        self.job = uuid.uuid4().hex[:12]

    # -- executor side ----------------------------------------------------
    def write(self, iterator) -> _Part:
        tmp = os.path.join(self.path, f".tmp-{self.job}-part-{uuid.uuid4().hex}.csv")
        os.makedirs(self.path, exist_ok=True)
        n = 0
        # Header-once-per-file (storage.py:67,74): every part is a
        # self-contained reference-format CSV, so both the reference's
        # pandas consumers and spark.read.csv(header=True) — which
        # skips one header line PER FILE — parse the layout directly.
        with open(tmp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(self.columns)
            for row in iterator:
                w.writerow([row[c] for c in self.columns])
                n += 1
        return _Part(tmp_path=tmp, rows=n)

    # -- driver side ------------------------------------------------------
    def commit(self, messages) -> None:
        # Publish via O(1) renames only after every task succeeded.
        # Final names carry the job token so a second append-mode
        # write can never clobber an earlier batch's parts.
        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.csv")):
                os.remove(old)
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{self.job}-{i:05d}.csv")
            os.replace(m.tmp_path, final)
        # Sweep temps from THIS job's attempts that never reported a
        # commit message (task failures, lost speculative duplicates) —
        # after a successful commit they are garbage by definition.
        # Token-scoped on purpose: a concurrent append job's in-flight
        # temps carry a different token and must survive our commit.
        for stray in glob.glob(os.path.join(self.path, f".tmp-{self.job}-part-*.csv")):
            os.remove(stray)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class RefCsvStreamWriter(DataSourceStreamWriter):
    """Streaming twin: `df.writeStream.format("ref_csv")...` — the
    exactly-once streaming version of the reference's lossy CSV sink
    (reference base.py:39-45 drops sub-batch rows on stop; this sink
    publishes every micro-batch atomically and loses nothing).

    Exactly-once story: final part names are DETERMINISTIC in
    (batchId, task index). A batch replayed after a crash re-runs its
    tasks and commit() re-publishes over the SAME final names
    (os.replace is atomic), so replay is idempotent at file
    granularity — the streaming analog of the batch writer's job-token
    isolation, keyed by batch id instead.
    """

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ref_csv stream sink requires a 'path' option")
        self.columns = [f.name for f in schema.fields]
        self.job = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _Part:
        tmp = os.path.join(self.path, f".tmp-{self.job}-part-{uuid.uuid4().hex}.csv")
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(tmp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(self.columns)
            for row in iterator:
                w.writerow([row[c] for c in self.columns])
                n += 1
        return _Part(tmp_path=tmp, rows=n)

    def commit(self, messages, batchId: int) -> None:
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = os.path.join(self.path, f"part-b{batchId:010d}-{i:05d}.csv")
            os.replace(m.tmp_path, final)
        for stray in glob.glob(os.path.join(self.path, f".tmp-{self.job}-part-*.csv")):
            os.remove(stray)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class RefCsvDataSource(DataSource):
    """`df.write.format("ref_csv").option("path", dir).save()` (batch)
    and `df.writeStream.format("ref_csv")...` (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "ref_csv"

    def writer(self, schema, overwrite: bool) -> RefCsvWriter:
        return RefCsvWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> RefCsvStreamWriter:
        return RefCsvStreamWriter(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(RefCsvDataSource)
