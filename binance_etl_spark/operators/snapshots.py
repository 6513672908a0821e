"""Manifest-based snapshot versioning for parquet tables — a minimal
Delta/Iceberg-style commit log giving TIME TRAVEL over plain parquet.

Why it belongs in a training-data engine: reproducibility. A training
run must be able to pin "the corpus as of snapshot N" while ingestion
keeps appending; an eval must re-read the exact bytes a model saw.
Directory listings cannot provide that (files appear mid-write, and
compaction/overwrite destroys history). The classic fix is a commit
log: data files are immutable once written, and a VERSIONED MANIFEST
names exactly the files visible in each snapshot.

Design (scale posture):
- data files land under ``data/v<N>/`` first; the manifest commit is a
  single atomic ``os.replace`` LAST — a crash at any earlier point
  leaves orphan data files that no manifest references (invisible,
  sweepable), never a half-visible version.
- ``append`` manifests carry the previous version's file list plus the
  new files — snapshot isolation without rewriting or moving data.
- ``overwrite`` starts a fresh file list; prior versions still resolve
  (their files are never deleted here — retention/VACUUM is a separate
  maintenance decision, like the reference's never-deleting CSV sink,
  storage.py:22-36).
- readers resolve a manifest to concrete paths and hand them to ONE
  ``spark.read.parquet(*paths)`` — pushdown/pruning/AQE all apply; at
  100 TB the manifest read is a driver-side O(files) JSON parse, the
  same cost profile as Delta's checkpointless log replay.

The commit protocol mirrors sources/refsink.py's task-temp + rename
sink; tests/test_snapshots.py covers append/overwrite/time-travel and
the crash-before-commit invisibility property.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_RE = re.compile(r"^v(\d+)\.json$")


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def versions(table_dir: str) -> list[int]:
    """Committed snapshot versions, ascending (empty if none)."""
    mdir = _manifest_dir(table_dir)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        m = _MANIFEST_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _load_manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(table_dir), f"v{version}.json")) as f:
        return json.load(f)


def write_version(df: DataFrame, table_dir: str, mode: str = "append") -> int:
    """Commit ``df`` as the next snapshot of ``table_dir``.

    mode='append': the new snapshot sees prior files + the new ones.
    mode='overwrite': the new snapshot sees only the new files (prior
    snapshots remain readable).
    Returns the committed version number. Data is written BEFORE the
    manifest; the manifest replace is the atomic commit point.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown snapshot mode {mode!r}")
    prior = versions(table_dir)
    v = (prior[-1] + 1) if prior else 1
    rel_dir = os.path.join("data", f"v{v}")
    staging = os.path.join(table_dir, rel_dir)
    df.write.mode("overwrite").parquet(staging)
    new_files = sorted(
        os.path.join(rel_dir, name)
        for name in os.listdir(staging)
        if name.endswith(".parquet")
    )
    carried = (
        _load_manifest(table_dir, prior[-1])["files"]
        if prior and mode == "append"
        else []
    )
    manifest = {"version": v, "mode": mode, "files": carried + new_files}
    mdir = _manifest_dir(table_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-v{v}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(mdir, f"v{v}.json"))  # atomic commit
    return v


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read snapshot ``version`` (default: latest committed)."""
    vs = versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no committed snapshots in {table_dir}")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise FileNotFoundError(f"snapshot v{version} not committed in {table_dir}")
    manifest = _load_manifest(table_dir, version)
    paths = [os.path.join(table_dir, rel) for rel in manifest["files"]]
    return spark.read.parquet(*paths)
