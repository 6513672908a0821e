"""RIFF/AVI container decode: structural validation beyond the value
oracle (which tests/test_oracle_parity.py::mm_frame_sample covers).
The walker must reject malformed containers loudly — silent garbage
rows are the multimodal-pipeline failure mode this guards against."""

from __future__ import annotations

import pytest

from binance_etl_spark.operators.multimodal import decode_avi_frames
from binance_etl_spark.plans.llm_ops import _AVI_FLEN, _make_avi


def _df(spark, payload: bytes):
    return spark.createDataFrame([(0, bytearray(payload))], "video_id BIGINT, payload BINARY")


def test_decode_walks_real_container(spark):
    avi = _make_avi(3)  # video 3: 9 frames
    rows = decode_avi_frames(_df(spark, avi), stride=1).collect()
    assert [r["frame_no"] for r in rows] == list(range(9))
    assert all(r["n_frames"] == 9 and r["width"] == 16 and r["height"] == 8 for r in rows)
    assert all(r["frame_len"] == _AVI_FLEN for r in rows)
    # offsets are the real positions of the chunk payloads in the file
    for r in rows:
        off = r["byte_offset"]
        assert bytes(avi[off - 8 : off - 4]) == b"00db"
        assert sum(avi[off : off + _AVI_FLEN]) == r["sum_px"]


def test_decode_rejects_bad_signature(spark):
    avi = _make_avi(0)
    avi[8:12] = b"WAVE"  # right RIFF, wrong form type
    with pytest.raises(Exception, match="not a RIFF/AVI payload"):
        decode_avi_frames(_df(spark, avi)).collect()


def test_decode_rejects_frame_count_mismatch(spark):
    import struct

    avi = _make_avi(0)
    # corrupt avih dwTotalFrames (avih data starts at 12 + 12 + 8 = 32;
    # dwTotalFrames at +16)
    assert bytes(avi[24:28]) == b"avih"
    avi[32 + 16 : 32 + 20] = struct.pack("<I", 99)
    with pytest.raises(Exception, match="declares 99 frames"):
        decode_avi_frames(_df(spark, avi)).collect()


def test_decode_rejects_truncated_header(spark):
    with pytest.raises(Exception):
        decode_avi_frames(_df(spark, b"RIFF\x00\x00")).collect()
