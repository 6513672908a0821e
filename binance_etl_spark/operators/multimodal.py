"""Multimodal column plumbing (SURVEY.md §2.12): image/audio/video as
opaque `binary` columns with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this
container): `decode_frames` produces deterministic fake frames derived
from the payload bytes, clearly marked. Everything around it — schema,
Arrow batch shape, mapInPandas plumbing, partitioning — is real and is
exactly what a production decode UDF would plug into.

Scale: mapInPandas streams Arrow batches; memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob sizes;
binary columns stay off the Python heap until their batch arrives.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_SCHEMA = (
    "asset_id BIGINT, frame_no INT, byte_offset BIGINT, frame_hash STRING, frame_len INT"
)


def with_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column — JVM-side only."""
    return df.withColumn("byte_len", F.length(F.col(payload_col))).withColumn(
        "content_hash", F.sha2(F.col(payload_col), 256)
    )


def decode_frames(assets: DataFrame, payload_col: str = "payload", n_frames: int = 4) -> DataFrame:
    """STUB decode: emit `n_frames` deterministic fake frames per asset.

    A real implementation would replace `_fake_frames` with an actual
    decoder (PIL/ffmpeg) — the mapInPandas signature, Arrow batching,
    and output schema stay identical.
    """
    import hashlib

    import pandas as pd

    def _fake_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload: bytes = bytes(r[payload_col])
                step = max(1, len(payload) // n_frames)
                for f in range(n_frames):
                    off = f * step
                    chunk = payload[off : off + step]
                    rows.append(
                        {
                            "asset_id": int(r["asset_id"]),
                            "frame_no": f,
                            "byte_offset": off,
                            "frame_hash": hashlib.sha256(chunk).hexdigest(),
                            "frame_len": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows, columns=[
                "asset_id", "frame_no", "byte_offset", "frame_hash", "frame_len"
            ])

    return assets.select("asset_id", payload_col).mapInPandas(_fake_frames, FRAME_SCHEMA)
