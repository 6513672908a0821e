"""Multimodal column plumbing (SURVEY.md §2.12): image/audio/video as
opaque `binary` columns with typed metadata.

Decode surface: `decode_wav` is a REAL decoder (RIFF/WAVE parsing via
stdlib wave+struct — PCM frames actually extracted from the bytes).
The VIDEO decode step is STUBBED (ffmpeg/PIL are not in this
container): `decode_frames` produces deterministic fake frames derived
from the payload bytes, clearly marked. Everything around both —
schema, Arrow batch shape, mapInPandas plumbing, partitioning — is
real and is exactly what a production decoder plugs into.

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


WAV_STATS_SCHEMA = (
    "clip_id BIGINT, sample_rate INT, n_channels INT, n_samples BIGINT, "
    "sum_amp BIGINT, min_amp INT, max_amp INT"
)


def decode_wav(assets: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode: parse RIFF/WAVE binary payloads (stdlib
    `wave` + struct — no external libs) and reduce PCM16 samples to
    per-clip stats. This is the actual decode path, not a stub: the
    bytes go through header parsing and frame extraction inside
    mapInPandas, Arrow-batched, executor-side.
    """
    import io
    import struct

    import pandas as pd

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import wave

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                with wave.open(io.BytesIO(bytes(r[payload_col])), "rb") as w:
                    n, ch, sr = w.getnframes(), w.getnchannels(), w.getframerate()
                    samples = struct.unpack(f"<{n * ch}h", w.readframes(n))
                rows.append(
                    {
                        "clip_id": int(r["clip_id"]),
                        "sample_rate": sr,
                        "n_channels": ch,
                        "n_samples": n,
                        "sum_amp": sum(samples),
                        "min_amp": min(samples),
                        "max_amp": max(samples),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "sample_rate", "n_channels", "n_samples",
                    "sum_amp", "min_amp", "max_amp",
                ],
            )

    return assets.select("clip_id", payload_col).mapInPandas(_decode, WAV_STATS_SCHEMA)


BMP_STATS_SCHEMA = (
    "img_id BIGINT, width INT, height INT, "
    "sum_b BIGINT, sum_g BIGINT, sum_r BIGINT"
)


def decode_bmp(assets: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode: parse 24-bit BMP payloads byte-by-byte —
    BITMAPFILEHEADER (pixel-array offset), BITMAPINFOHEADER (dims,
    bpp), bottom-up row order, 4-byte row padding — and reduce pixels
    to per-channel sums. Pure stdlib struct; runs executor-side over
    Arrow batches.
    """
    import struct

    import pandas as pd

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[payload_col])
                assert data[:2] == b"BM", "not a BMP payload"
                (pix_off,) = struct.unpack_from("<I", data, 10)
                w, h = struct.unpack_from("<ii", data, 18)
                (bpp,) = struct.unpack_from("<H", data, 28)
                assert bpp == 24, f"only 24-bit BMP supported, got {bpp}"
                row_size = (w * 3 + 3) // 4 * 4
                sb = sg = sr = 0
                for y in range(abs(h)):
                    base = pix_off + y * row_size
                    for x in range(w):
                        o = base + x * 3
                        sb += data[o]
                        sg += data[o + 1]
                        sr += data[o + 2]
                rows.append(
                    {
                        "img_id": int(r["img_id"]),
                        "width": w,
                        "height": abs(h),
                        "sum_b": sb,
                        "sum_g": sg,
                        "sum_r": sr,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["img_id", "width", "height", "sum_b", "sum_g", "sum_r"]
            )

    return assets.select("img_id", payload_col).mapInPandas(_decode, BMP_STATS_SCHEMA)


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


AHASH_SCHEMA = "img_id BIGINT, blocks ARRAY<BIGINT>"


def ahash_blocks_bmp(assets: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL perceptual-hash front half: parse 16x16 24-bit BMP payloads
    (54-byte header, bottom-up rows, no padding at width 16) and emit
    the 64 average-hash block values — 2x2 pixel blocks, gray =
    (B+G+R) div 3, block value = (sum of 4 grays) div 4, array index =
    block_y*8 + block_x. Integer-exact, so a SQL oracle can recompute
    the identical values from a generative pixel formula. mapInPandas,
    Arrow-batched, executor-side — the same plumbing a production
    pHash (DCT) decoder plugs into.
    """
    import pandas as pd

    def _decode(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                buf = bytes(r[payload_col])
                w = h = 16
                row_size = w * 3  # 48 bytes, already 4-aligned
                gray = [[0] * w for _ in range(h)]
                for ry in range(h):  # stored bottom-up
                    y = h - 1 - ry
                    base = 54 + ry * row_size
                    for x in range(w):
                        b, g, rr = buf[base + 3 * x : base + 3 * x + 3]
                        gray[y][x] = (b + g + rr) // 3
                blocks = []
                for by in range(8):
                    for bx in range(8):
                        s = (
                            gray[2 * by][2 * bx]
                            + gray[2 * by][2 * bx + 1]
                            + gray[2 * by + 1][2 * bx]
                            + gray[2 * by + 1][2 * bx + 1]
                        )
                        blocks.append(s // 4)
                rows.append({"img_id": int(r["img_id"]), "blocks": blocks})
            yield pd.DataFrame(rows, columns=["img_id", "blocks"])

    return assets.mapInPandas(_decode, AHASH_SCHEMA)


AFP_SCHEMA = "clip_id BIGINT, energies ARRAY<BIGINT>"


def fingerprint_wav_energies(
    assets: DataFrame, n_blocks: int = 65, block: int = 4, payload_col: str = "payload"
) -> DataFrame:
    """REAL audio-fingerprint front half: parse RIFF/WAVE PCM16 mono
    payloads (stdlib wave + struct) and emit per-block absolute-energy
    sums (`n_blocks` blocks of `block` samples). The Haitsma-Kalker
    family derives sign-of-energy-delta bits from exactly these
    integer block energies, so a SQL oracle can recompute them from a
    generative sample formula. mapInPandas, Arrow-batched.
    """
    import io
    import struct

    import pandas as pd

    def _decode(batches):
        import wave

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                with wave.open(io.BytesIO(bytes(r[payload_col])), "rb") as w:
                    n = w.getnframes()
                    samples = struct.unpack(f"<{n}h", w.readframes(n))
                energies = [
                    sum(abs(s) for s in samples[b * block : (b + 1) * block])
                    for b in range(n_blocks)
                ]
                rows.append({"clip_id": int(r["clip_id"]), "energies": energies})
            yield pd.DataFrame(rows, columns=["clip_id", "energies"])

    return assets.mapInPandas(_decode, AFP_SCHEMA)
