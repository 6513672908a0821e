"""BigQuery staging sink — the storage provider the reference leaves
as "todo: support bigquery" (reference factory.py:40-42).

The container has neither network nor the google-cloud-bigquery
package, and BigQuery's own bulk-ingest contract doesn't need them at
write time: production loads are STAGED — engines write parquet to
object storage and submit a load job referencing the files (the
GCS-to-BigQuery load path; streaming inserts are for row-trickle, not
ETL). So the sink writes exactly that contract:

- data as parquet shards under ``<dir>/data/`` (for streaming: one
  ``batch=<id>/`` dir per micro-batch, rewritten on replay — the same
  exactly-once-by-overwrite discipline as dedup_stream's output);
- ``_bq_load_manifest.json`` per commit: target table, source_format
  PARQUET, the shard URIs, write disposition, and the Spark schema
  mapped to BigQuery column types — the literal payload of a
  ``bq load`` / LoadJobConfig call.

``submit_load_job`` closes the loop when the optional
google-cloud-bigquery package IS present (import-gated exactly like
the binance-connector path in sources/websocket.py); everything else
is dependency-free and fully testable offline.

Scale: the parquet write is the engine's ordinary distributed sink (no
driver collect, one shard per task); the manifest is a driver-side
O(files) listing — the same cost profile as the snapshot commit log.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Spark -> BigQuery type map (public BigQuery load-job type system).
_SCALAR = {
    "bigint": "INT64",
    "int": "INT64",
    "smallint": "INT64",
    "tinyint": "INT64",
    "double": "FLOAT64",
    "float": "FLOAT64",
    "string": "STRING",
    "boolean": "BOOL",
    "binary": "BYTES",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "DATETIME",
}


def _bq_field(field: T.StructField) -> dict:
    dt = field.dataType
    mode = "NULLABLE" if field.nullable else "REQUIRED"
    if isinstance(dt, T.ArrayType):
        inner = _bq_field(T.StructField(field.name, dt.elementType, True))
        inner["mode"] = "REPEATED"
        return inner
    if isinstance(dt, T.StructType):
        return {
            "name": field.name,
            "type": "RECORD",
            "mode": mode,
            "fields": [_bq_field(f) for f in dt.fields],
        }
    if isinstance(dt, T.DecimalType):
        kind = "NUMERIC" if dt.precision <= 38 and dt.scale <= 9 else "BIGNUMERIC"
        return {"name": field.name, "type": kind, "mode": mode}
    simple = dt.simpleString()
    if simple not in _SCALAR:
        raise ValueError(
            f"no BigQuery mapping for Spark type {simple!r} (column {field.name!r})"
        )
    return {"name": field.name, "type": _SCALAR[simple], "mode": mode}


def bq_schema(df: DataFrame) -> list[dict]:
    """Spark schema -> BigQuery load-job schema fields."""
    return [_bq_field(f) for f in df.schema.fields]


def write_bigquery_staging(
    df: DataFrame,
    staging_dir: str,
    table: str,
    write_disposition: str = "WRITE_APPEND",
    subdir: str = "data",
) -> str:
    """Stage ``df`` for a BigQuery load: parquet shards + the load-job
    manifest. Returns the manifest path. The manifest is written LAST
    (atomic rename), so a crash mid-stage leaves shards no manifest
    references — invisible to any loader, same commit discipline as
    the snapshot log."""
    if write_disposition not in ("WRITE_APPEND", "WRITE_TRUNCATE", "WRITE_EMPTY"):
        raise ValueError(f"unknown write_disposition {write_disposition!r}")
    data_dir = os.path.join(staging_dir, subdir)
    df.write.mode("overwrite").parquet(data_dir)
    uris = sorted(
        os.path.join(data_dir, n)
        for n in os.listdir(data_dir)
        if n.endswith(".parquet")
    )
    manifest = {
        "destination_table": table,
        "source_format": "PARQUET",
        "write_disposition": write_disposition,
        "source_uris": uris,
        "schema": bq_schema(df),
    }
    mpath = os.path.join(staging_dir, subdir, "_bq_load_manifest.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, mpath)
    return mpath


def foreach_batch_bigquery(staging_dir: str, table: str):
    """writeStream.foreachBatch body: one staged load per micro-batch
    under ``batch=<id>/`` — a replayed batch REWRITES its own dir and
    manifest (overwrite), so checkpoint recovery never double-stages;
    the loader side dedups on batch dir, matching BigQuery load-job
    idempotency practice (job ids derived from the batch id)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        write_bigquery_staging(
            batch_df,
            staging_dir,
            table,
            write_disposition="WRITE_APPEND",
            subdir=f"batch={batch_id}",
        )

    return apply


def submit_load_job(manifest_path: str):
    """Submit a staged manifest as a real BigQuery load job. Requires
    the optional google-cloud-bigquery package (not in CI — the same
    import gate as the live binance-connector path)."""
    try:
        from google.cloud import bigquery  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "submitting BigQuery load jobs requires the optional "
            "'google-cloud-bigquery' package; the staged parquet + "
            "manifest can also be loaded with `bq load` from the CLI"
        ) from exc

    with open(manifest_path) as f:
        m = json.load(f)
    client = bigquery.Client()  # pragma: no cover
    config = bigquery.LoadJobConfig(  # pragma: no cover
        source_format=bigquery.SourceFormat.PARQUET,
        write_disposition=m["write_disposition"],
    )
    return client.load_table_from_uri(  # pragma: no cover
        m["source_uris"], m["destination_table"], job_config=config
    )
