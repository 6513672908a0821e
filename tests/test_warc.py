"""WARC source (sources/warc.py): writer/reader round trip, byte-offset
partitioning, and malformed-input errors."""

from __future__ import annotations

import pytest

from binance_etl_spark.sources import warc as W


def _write(tmp_path, n=10, prefix="r"):
    path = str(tmp_path / "t.warc")
    recs = [
        (f"urn:{prefix}:{i}", f"http://x/{i}", f"payload {i} " .encode() * (i + 1))
        for i in range(n)
    ]
    assert W.write_warc(recs, path) == n
    return path, recs


def test_round_trip_bytes_exact(spark, tmp_path):
    path, recs = _write(tmp_path)
    got = {r["record_id"]: r for r in W.read_warc(spark, path).collect()}
    assert len(got) == len(recs)
    for rid, uri, payload in recs:
        r = got[rid]
        assert r["target_uri"] == uri
        assert r["warc_type"] == "response"
        assert r["content_length"] == len(payload)
        assert bytes(r["payload"]) == payload


def test_byte_offset_partitions_cover_disjointly(spark, tmp_path):
    path, recs = _write(tmp_path, n=50)
    df = W.read_warc(spark, path, records_per_partition=7)
    assert df.rdd.getNumPartitions() == 8  # ceil(50 / 7)
    # no loss, no duplication across partition boundaries
    ids = [r["record_id"] for r in df.collect()]
    assert sorted(ids) == sorted(rid for rid, _, _ in recs)


def test_empty_archive_is_empty_scan(spark, tmp_path):
    path = str(tmp_path / "empty.warc")
    W.write_warc([], path)
    assert W.read_warc(spark, path).count() == 0


def test_non_warc_input_raises(tmp_path):
    path = str(tmp_path / "bad.warc")
    with open(path, "wb") as f:
        f.write(b"HTTP/1.1 200 OK\r\n\r\nnot a warc")
    with pytest.raises(ValueError, match="not a WARC record"):
        W._index_offsets(path)


def test_binary_payloads_survive(spark, tmp_path):
    path = str(tmp_path / "bin.warc")
    payload = bytes(range(256)) * 3  # includes CRLF bytes inside payload
    W.write_warc([("urn:b:1", "http://x/b", payload)], path)
    [r] = W.read_warc(spark, path).collect()
    assert bytes(r["payload"]) == payload


def test_sharded_writer_round_trip_multi_shard(spark, tmp_path):
    # executor-side sharded write: one shard per task, task-temp +
    # driver-rename commit, NO driver collect; directory read sees
    # every shard, byte-exact
    out = str(tmp_path / "corpus")
    df = spark.range(100).repartition(5).selectExpr(
        "concat('urn:doc:', id) AS record_id",
        "concat('http://x/', id) AS target_uri",
        "encode(concat('payload ', id), 'UTF-8') AS payload",
    )
    W.write_warc_sharded(df, out)
    import glob
    import os

    shards = glob.glob(os.path.join(out, "part-*.warc"))
    assert len(shards) == 5, "one committed shard per task"
    assert not glob.glob(os.path.join(out, ".tmp-*")), "temps swept"
    got = {r["record_id"]: r for r in W.read_warc(spark, out).collect()}
    assert len(got) == 100
    for i in range(100):
        r = got[f"urn:doc:{i}"]
        assert bytes(r["payload"]) == f"payload {i}".encode()
        assert r["target_uri"] == f"http://x/{i}"


def test_sharded_writer_overwrite_replaces_prior_parts(spark, tmp_path):
    out = str(tmp_path / "corpus")
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "concat('urn:doc:', id) AS record_id",
        "concat('http://x/', id) AS target_uri",
        "encode(cast(id AS string), 'UTF-8') AS payload",
    )
    W.write_warc_sharded(mk(0, 10), out)
    W.write_warc_sharded(mk(100, 105), out)  # overwrite (default mode)
    ids = sorted(r["record_id"] for r in W.read_warc(spark, out).collect())
    assert ids == sorted(f"urn:doc:{i}" for i in range(100, 105))


def test_sharded_writer_rejects_wrong_schema(spark, tmp_path):
    import pytest as _pytest

    df = spark.range(3).selectExpr("id", "concat('u', id) AS target_uri")
    with _pytest.raises(Exception, match="record_id"):
        W.write_warc_sharded(df, str(tmp_path / "bad"))


def test_overwrite_commit_publishes_before_deleting(tmp_path, monkeypatch):
    """Crash-ordering property (ADVICE r5): in overwrite mode the
    driver commit renames the new shards in FIRST and deletes stale
    prior-job parts LAST — a crash mid-commit leaves a
    mixed-but-readable directory, never an empty one."""
    import os

    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    out = tmp_path / "corpus"
    out.mkdir()
    stale = out / "part-oldjob-00000.warc"
    with open(stale, "wb") as f:
        W._write_records(f, [("urn:old:1", "http://x/old", b"old bytes")])

    schema = StructType(
        [
            StructField("record_id", StringType()),
            StructField("target_uri", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    writer = W.WarcShardWriter({"path": str(out)}, schema, overwrite=True)
    shard = writer.write(
        iter([{"record_id": "urn:new:1", "target_uri": "http://x/new", "payload": b"new"}])
    )
    assert shard.rows == 1

    real_remove = os.remove

    def crash_on_delete(path):
        if "part-oldjob-" in os.path.basename(path):
            raise OSError("injected crash during stale-part delete")
        real_remove(path)

    monkeypatch.setattr(os, "remove", crash_on_delete)
    with pytest.raises(OSError, match="injected crash"):
        writer.commit([shard])
    monkeypatch.undo()

    names = sorted(os.listdir(out))
    finals = [n for n in names if n.startswith("part-") and n.endswith(".warc")]
    # new shard is already published; the stale one survived the crash
    assert any(f"part-{writer.job}-" in n for n in finals)
    assert stale.name in finals, "worst case is mixed-but-readable, never empty"

    # a re-run of commit (retry) converges: stale gone, new shard kept
    writer2 = W.WarcShardWriter({"path": str(out)}, schema, overwrite=True)
    shard2 = writer2.write(
        iter([{"record_id": "urn:new:2", "target_uri": "http://x/n2", "payload": b"n2"}])
    )
    writer2.commit([shard2])
    names = sorted(os.listdir(out))
    assert stale.name not in names
    assert any(f"part-{writer2.job}-" in n for n in names)
