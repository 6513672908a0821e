"""Streaming progress monitoring — the engine twin of the reference's
per-ETL stats logging (reference base.py:30,76-81 keeps monotone
message counters and logs them periodically; spot_depth_etl logs book
sync transitions).

Spark-native shape: a `StreamingQueryListener` receives every
micro-batch's progress event on the driver — rows/sec, batch duration,
state size — for ALL queries at once, with zero per-record cost (the
metrics already exist in the engine; the listener just taps them).
`ProgressMonitor.snapshot()` turns the history into a DataFrame so the
monitoring data is queryable with the same engine it monitors.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id STRING, query_name STRING, batch_id BIGINT, "
    "num_input_rows BIGINT, batch_duration_ms BIGINT, "
    "input_rows_per_second DOUBLE, sink_description STRING"
)


class ProgressMonitor(StreamingQueryListener):
    """Collects per-micro-batch progress rows for every streaming query
    on the session. Thread-safe: listener callbacks arrive on Spark's
    listener bus thread."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._rows: list[tuple] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        # progress objects expose .json (string) portably
        d = json.loads(p.json) if hasattr(p, "json") else p
        row = (
            str(d.get("id", "")),
            d.get("name") or "",
            int(d.get("batchId", -1)),
            int(d.get("numInputRows", 0)),
            int(d.get("batchDuration", 0)),
            float(d.get("inputRowsPerSecond") or 0.0),
            str((d.get("sink") or {}).get("description", "")),
        )
        with self._lock:
            self._rows.append(row)

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # pragma: no cover - Spark 3.5+
        pass

    # -- consumer API -------------------------------------------------------
    def wait_for_batches(self, n: int = 1, timeout_s: float = 15.0) -> bool:
        """Listener events arrive on the bus thread ASYNCHRONOUSLY —
        poll until >= n progress rows landed (or timeout). Callers that
        just stopped a query must wait before snapshotting."""
        import time

        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self._lock:
                if len(self._rows) >= n:
                    return True
            time.sleep(0.1)
        with self._lock:
            return len(self._rows) >= n

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """Progress history as a DataFrame (queryable, sinkable)."""
        with self._lock:
            rows = list(self._rows)
        return spark.createDataFrame(rows, PROGRESS_SCHEMA)


def attach(spark: SparkSession) -> ProgressMonitor:
    """Register a fresh monitor on the session's listener bus."""
    mon = ProgressMonitor()
    spark.streams.addListener(mon)
    return mon


def detach(spark: SparkSession, mon: ProgressMonitor) -> None:
    spark.streams.removeListener(mon)
