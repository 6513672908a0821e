"""Streaming count-min-sketch maintenance: keep a corpus-wide token
frequency sketch up to date as document micro-batches arrive.

Mergeability is the whole point of the sketch (operators/text.py):
sketch(A ∪ B) = cellwise-sum(sketch(A), sketch(B)), so the streaming
maintenance is: per batch, build the batch's 4x256 sketch (bounded
map-side agg) and ADD it to the persisted state — no token-level state
is ever kept, and the state file stays <= 1024 rows forever while the
stream can be unbounded. Contrast with the exact streaming alternative
(a running groupBy over every distinct token): that state grows with
vocabulary and must be checkpointed wholesale.

Exactly-once posture: like streaming/dedup_stream.py, the state swap is
crash-safe (write aside -> rename old away -> rename new in -> drop
old), and a `_seen_batches` ledger inside the state directory makes a
REPLAYED micro-batch (restart without checkpoint) a no-op instead of a
double-count — CMS adds are not idempotent by themselves, so the
ledger provides the idempotency the band-join state got for free.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_etl_spark.operators.text import cms_cells, cms_merge
from binance_etl_spark.streaming.dedup_stream import _swap_write

_SCHEMA = "d INT, bucket INT, c LONG"


def read_sketch(spark, state_path: str) -> DataFrame:
    """Current sketch state ((d, bucket, c), <= 1024 rows); empty
    sketch if no batch has committed yet."""
    cells = os.path.join(state_path, "cells")
    if os.path.isdir(cells):
        return spark.read.parquet(cells)
    return spark.createDataFrame([], _SCHEMA)


def _ledger_path(state_path: str) -> str:
    return os.path.join(state_path, "_seen_batches.json")


def _seen(state_path: str) -> set[int]:
    try:
        with open(_ledger_path(state_path)) as f:
            return set(json.load(f))
    except FileNotFoundError:
        return set()


def foreach_batch_cms(state_path: str, id_col: str = "doc_id", text_col: str = "text"):
    """foreachBatch body: tokenize the batch, build its sketch, merge
    into state. Batch-id idempotent via the ledger."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(state_path, exist_ok=True)
        if batch_id in _seen(state_path):
            return  # replayed batch: already merged
        spark = batch_df.sparkSession
        toks = batch_df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        batch_cells = cms_cells(toks)
        merged = cms_merge(read_sketch(spark, state_path), batch_cells)
        # Materialize BEFORE the swap: `merged` lazily reads the state
        # parquet being replaced.
        rows = merged.collect()  # <= 1024 rows by construction
        _swap_write(
            spark.createDataFrame(rows, _SCHEMA), os.path.join(state_path, "cells")
        )
        ledger = sorted(_seen(state_path) | {batch_id})
        tmp = _ledger_path(state_path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ledger, f)
        os.replace(tmp, _ledger_path(state_path))

    return apply
