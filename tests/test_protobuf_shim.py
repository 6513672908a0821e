"""Vendored protobuf shim: wire-format unit tests (no Spark needed).

The tWS integration test (test_tws_book_sync.py) proves the shim
against the JVM's real protobuf parser; these tests pin the encoder/
decoder edge cases directly — negative/large varints, unicode, empty
vs unset, oneof switching, nested repeated messages, unknown-field
skip (forward compatibility)."""

from __future__ import annotations

import pytest

from binance_etl_spark.session import ensure_protobuf

ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def _rt(msg, cls):
    out = cls()
    out.ParseFromString(msg.SerializeToString())
    return out


def test_varint_signed_values_roundtrip():
    for v in (0, 1, -1, 127, 128, -128, 2**31 - 1, -(2**31), 2**63 - 1, -(2**63)):
        m = _rt(sm.RegisterTimer(expiryTimestampMs=v), sm.RegisterTimer)
        assert m.expiryTimestampMs == v, v


def test_string_unicode_and_empty():
    m = _rt(sm.StateCallCommand(stateName="ключ-βß—🙂", schema=""), sm.StateCallCommand)
    assert m.stateName == "ключ-βß—🙂"
    # proto3: explicitly-set empty string is indistinguishable from
    # unset on the wire for plain fields — default comes back
    assert m.schema == ""


def test_bytes_with_all_byte_values():
    payload = bytes(range(256))
    m = _rt(sm.SetImplicitKey(key=payload), sm.SetImplicitKey)
    assert m.key == payload


def test_oneof_set_clears_siblings():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(setHandleState=sm.SetHandleState(state=sm.CREATED))
    )
    req.implicitGroupingKeyRequest = sm.ImplicitGroupingKeyRequest(
        removeImplicitKey=sm.RemoveImplicitKey()
    )
    back = _rt(req, sm.StateRequest)
    assert back.HasField("implicitGroupingKeyRequest")
    assert not back.HasField("statefulProcessorCall")
    assert back.WhichOneof("method") == "implicitGroupingKeyRequest"


def test_repeated_nested_messages():
    pairs = [sm.KeyAndValuePair(key=bytes([i]), value=bytes([i, i])) for i in range(20)]
    m = _rt(
        sm.StateResponseWithMapIterator(statusCode=7, kvPair=pairs, requireNextFetch=True),
        sm.StateResponseWithMapIterator,
    )
    assert m.statusCode == 7 and m.requireNextFetch is True
    assert [(p.key, p.value) for p in m.kvPair] == [(p.key, p.value) for p in pairs]


def test_repeated_bytes_order_preserved():
    vals = [b"a", b"", b"ccc", b"dd"]
    m = _rt(sm.ListStatePut(value=vals, fetchWithArrow=False), sm.ListStatePut)
    assert list(m.value) == vals


def test_unknown_fields_skipped():
    # encode a message, then append an unknown field (tag 99, varint)
    base = sm.StateResponse(statusCode=1, value=b"x").SerializeToString()
    unknown = b"\x98\x06\x2a"  # tag varint for (field 99, wire 0), value 42
    m = sm.StateResponse()
    m.ParseFromString(base + unknown)
    assert m.statusCode == 1 and m.value == b"x"


def test_enum_wrapper_and_constants():
    assert sm.HandleState.Value("CLOSED") == sm.CLOSED == 5
    assert sm.HandleState.Name(0) == "PRE_INIT"
    m = _rt(sm.SetHandleState(state=sm.TIMER_PROCESSED), sm.SetHandleState)
    assert m.state == sm.TIMER_PROCESSED


def test_kwarg_none_means_unset():
    m = sm.StateCallCommand(stateName="s", ttl=None)
    assert not m.HasField("ttl")
    assert m.ttl.durationMs == 0  # default instance read


def test_unknown_field_name_raises():
    with pytest.raises(AttributeError):
        sm.StateCallCommand(nope=1)


# --- spec-derived byte goldens ----------------------------------------
# An INDEPENDENT, test-local wire encoder (tag/varint construction
# written out by hand from the protobuf encoding spec) asserts the shim
# produces byte-identical output for representative StateMessage
# shapes. Together with test_tws_book_sync.py — where every shim-encoded
# request is parsed by the JVM's REAL protobuf and every JVM response
# decoded by the shim — this pins shim/real wire equality without a
# protobuf install: two independent encoders agreeing on the spec, and
# a real decoder accepting the bytes end-to-end.


def _vint(v: int) -> bytes:
    # unsigned LEB128; int64 negatives are 10-byte two's complement
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field_no: int, wire_type: int) -> bytes:
    return _vint((field_no << 3) | wire_type)


def _ld(field_no: int, payload: bytes) -> bytes:
    return _tag(field_no, 2) + _vint(len(payload)) + payload


def test_golden_varint_field():
    # RegisterTimer.expiryTimestampMs = field 1, int64 (wire type 0)
    assert sm.RegisterTimer(expiryTimestampMs=1000).SerializeToString() == (
        _tag(1, 0) + _vint(1000)
    )
    assert sm.RegisterTimer(expiryTimestampMs=-1).SerializeToString() == (
        _tag(1, 0) + b"\xff" * 9 + b"\x01"
    )
    # proto3 default (0) is not emitted
    assert sm.RegisterTimer(expiryTimestampMs=0).SerializeToString() == b""


def test_golden_string_and_skipped_defaults():
    # StateCallCommand: stateName=1, schema=2 (strings); unset fields
    # and empty strings are absent from the wire
    m = sm.StateCallCommand(stateName="count", schema="x INT")
    assert m.SerializeToString() == (
        _ld(1, b"count") + _ld(2, b"x INT")
    )
    assert sm.StateCallCommand(stateName="", schema="").SerializeToString() == b""


def test_golden_bytes_field():
    payload = bytes(range(7))
    assert sm.SetImplicitKey(key=payload).SerializeToString() == _ld(1, payload)


def test_golden_nested_oneof_and_enum():
    # PRE_INIT == 0 -> enum default, elided; the nested message set as a
    # oneof member still serializes as an (empty) length-delimited field
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""
    inner = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
    ).SerializeToString()
    assert inner == _ld(1, b"")  # presence of the set oneof member
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
        )
    ).SerializeToString()
    assert req == _ld(2, inner)
    # non-default enums emit a varint
    assert sm.SetHandleState(state=sm.CREATED).SerializeToString() == (
        _tag(1, 0) + _vint(sm.CREATED)
    )
    assert sm.SetHandleState(state=sm.CLOSED).SerializeToString() == (
        _tag(1, 0) + _vint(sm.CLOSED)
    )


def test_golden_repeated_nested():
    pairs = [
        sm.KeyAndValuePair(key=b"\x01", value=b"\x02\x03"),
        sm.KeyAndValuePair(key=b"", value=b"\x04"),  # empty bytes elided
    ]
    each = [_ld(1, b"\x01") + _ld(2, b"\x02\x03"), _ld(2, b"\x04")]
    assert [p.SerializeToString() for p in pairs] == each


def test_shim_only_loads_when_real_protobuf_absent(tmp_path):
    """CI-style guard for the day the sandbox gains a real
    `pip install protobuf`: ensure_protobuf() must PREFER the real
    package — returning 'real', resolving google.protobuf to it, and
    keeping the vendor dir OFF sys.path and PYTHONPATH (a shim that
    shadows a real install would silently downgrade the tWS state
    channel). Simulated with a marker 'real' package in a subprocess."""
    import os
    import subprocess
    import sys
    import textwrap

    pkg = tmp_path / "google" / "protobuf"
    pkg.mkdir(parents=True)
    (tmp_path / "google" / "__init__.py").write_text(
        "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
    )
    (pkg / "__init__.py").write_text("IS_FAKE_REAL = True\n")

    code = textwrap.dedent(
        """
        import os, sys
        sys.path.insert(0, sys.argv[1])          # the fake 'real' install
        sys.path.insert(0, sys.argv[2])          # the repo
        from binance_etl_spark.session import ensure_protobuf, _VENDOR_DIR
        impl = ensure_protobuf()
        import google.protobuf as gp
        assert impl == "real", impl
        assert getattr(gp, "IS_FAKE_REAL", False), gp.__file__
        assert _VENDOR_DIR not in sys.path
        assert _VENDOR_DIR not in os.environ.get("PYTHONPATH", "")
        print("REAL-PREFERRED")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", code, str(tmp_path), "/root/repo"],
        capture_output=True,
        text=True,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        timeout=60,
    )
    assert r.returncode == 0, r.stderr
    assert "REAL-PREFERRED" in r.stdout

    # and in THIS container (no real protobuf) the shim leg engages
    code2 = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, sys.argv[1])
        from binance_etl_spark.session import ensure_protobuf, _VENDOR_DIR
        impl = ensure_protobuf()
        import google.protobuf as gp
        assert impl == "shim", impl
        assert gp.__file__.startswith(_VENDOR_DIR), gp.__file__
        print("SHIM-FALLBACK")
        """
    )
    r2 = subprocess.run(
        [sys.executable, "-c", code2, "/root/repo"],
        capture_output=True,
        text=True,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
        timeout=60,
    )
    assert r2.returncode == 0, r2.stderr
    assert "SHIM-FALLBACK" in r2.stdout
