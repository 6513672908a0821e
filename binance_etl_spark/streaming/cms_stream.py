"""Streaming count-min-sketch maintenance: keep a corpus-wide token
frequency sketch up to date as document micro-batches arrive.

Mergeability is the whole point of the sketch (operators/text.py):
sketch(A ∪ B) = cellwise-sum(sketch(A), sketch(B)), so the streaming
maintenance is: per batch, build the batch's 4x256 sketch (bounded
map-side agg) and ADD it to the persisted state — no token-level state
is ever kept, and the state stays <= 1024 rows forever while the
stream can be unbounded. Contrast with the exact streaming alternative
(a running groupBy over every distinct token): that state grows with
vocabulary and must be checkpointed wholesale.

Exactly-once posture: CMS adds are NOT idempotent, so the commit must
publish the merged sketch and the seen-batch ledger as ONE atomic unit
— otherwise a crash between the two leaves a sketch that already
contains batch N with a ledger that does not, and the replayed batch
double-counts silently (the CMS overcount guarantee masks it). The
commit here is a MANIFEST-POINTER swap: each commit writes a fresh
immutable version directory holding BOTH the sketch parquet and the
ledger, then publishes it with a single atomic os.replace of the
CURRENT pointer file. Every crash point leaves CURRENT referencing a
complete (sketch, ledger) pair from the same commit — there is no
ordering window at all, and no state is ever lost mid-swap (unlike a
rename-aside swap, which has an instant where the live path is empty).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binance_etl_spark.operators.text import cms_cells, cms_merge

_SCHEMA = "d INT, bucket INT, c LONG"
_CURRENT = "CURRENT"
_LEDGER = "_seen_batches.json"


def _current_version(state_path: str) -> str | None:
    """Name of the committed version dir, or None before first commit."""
    try:
        with open(os.path.join(state_path, _CURRENT)) as f:
            name = f.read().strip()
    except FileNotFoundError:
        return None
    return name or None


def _version_dir(state_path: str, name: str) -> str:
    return os.path.join(state_path, name)


def read_sketch(spark, state_path: str) -> DataFrame:
    """Current sketch state ((d, bucket, c), <= 1024 rows); empty
    sketch if no batch has committed yet."""
    name = _current_version(state_path)
    if name is not None:
        # Spark's parquet reader skips the _-prefixed ledger file.
        return spark.read.parquet(os.path.join(_version_dir(state_path, name), "cells"))
    return spark.createDataFrame([], _SCHEMA)


def _seen(state_path: str) -> set[int]:
    name = _current_version(state_path)
    if name is None:
        return set()
    with open(os.path.join(_version_dir(state_path, name), _LEDGER)) as f:
        return set(json.load(f))


def _commit(state_path: str, cells_df: DataFrame, ledger: set[int]) -> None:
    """Write an immutable version dir (sketch + ledger), publish it with
    one atomic pointer replace, then GC unreferenced versions."""
    name = f"v{max(ledger):012d}_{uuid.uuid4().hex[:8]}"
    vdir = _version_dir(state_path, name)
    cells_df.write.mode("overwrite").parquet(os.path.join(vdir, "cells"))
    with open(os.path.join(vdir, _LEDGER), "w") as f:
        json.dump(sorted(ledger), f)
    prev = _current_version(state_path)
    tmp = os.path.join(state_path, f".{_CURRENT}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        f.write(name)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(state_path, _CURRENT))  # THE commit point
    # GC: anything not referenced by CURRENT (prev version, crashed
    # staging dirs from failed commits). Best-effort — a leftover dir is
    # garbage, never state.
    live = _current_version(state_path)
    for entry in os.listdir(state_path):
        p = os.path.join(state_path, entry)
        if entry.startswith("v") and entry != live and os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
    _ = prev


def foreach_batch_cms(state_path: str, id_col: str = "doc_id", text_col: str = "text"):
    """foreachBatch body: tokenize the batch, build its sketch, merge
    into state. Batch-id idempotent via the ledger; sketch + ledger
    commit in ONE atomic pointer swap (see module docstring)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(state_path, exist_ok=True)
        seen = _seen(state_path)
        if batch_id in seen:
            return  # replayed batch: already merged
        spark = batch_df.sparkSession
        toks = batch_df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        batch_cells = cms_cells(toks)
        merged = cms_merge(read_sketch(spark, state_path), batch_cells)
        # Materialize BEFORE the commit: `merged` lazily reads the
        # current version's parquet, which GC is about to retire.
        rows = merged.collect()  # <= 1024 rows by construction
        _commit(
            state_path,
            spark.createDataFrame(rows, _SCHEMA),
            seen | {batch_id},
        )

    return apply
