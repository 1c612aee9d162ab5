"""Protobuf shim runtime tests (r6): wire-format correctness for the
subset the transformWithState state protocol exercises, checked against
PySpark's REAL generated StateMessage_pb2 module (the generated code runs
on top of the shim, so every assertion here exercises descriptor parsing,
class building, and the codec together)."""

from __future__ import annotations

import pytest

from xml_to_parquet_spark.streaming.stateful import HAS_TWS_PROTO, ensure_protobuf

if not HAS_TWS_PROTO:  # pragma: no cover
    pytest.skip("no protobuf runtime (real or shim)", allow_module_level=True)

ensure_protobuf()
import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def _roundtrip(msg, cls):
    out = cls()
    out.ParseFromString(msg.SerializeToString())
    return out


def test_scalar_and_nested_roundtrip():
    m = sm.StateRequest(
        version=7,
        statefulProcessorCall=sm.StatefulProcessorCall(
            getValueState=sm.StateCallCommand(
                stateName="session", schema="start long"
            )
        ),
    )
    r = _roundtrip(m, sm.StateRequest)
    assert r.version == 7
    assert r.statefulProcessorCall.getValueState.stateName == "session"
    assert r.statefulProcessorCall.getValueState.schema == "start long"


def test_known_wire_bytes():
    """Hand-checked against the protobuf encoding spec: field 1 varint 2,
    field 2 length-delimited SetHandleState(state=CREATED)."""
    m = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    assert m.SerializeToString() == bytes.fromhex("080212040a020801")


def test_defaults_and_absent_fields():
    r = sm.StateResponse()
    r.ParseFromString(b"")
    assert r.statusCode == 0
    assert r.errorMessage == ""
    assert r.value == b""


def test_negative_int_and_int64():
    m = sm.StateResponseWithLongTypeVal(statusCode=-3, value=-(1 << 40))
    r = _roundtrip(m, sm.StateResponseWithLongTypeVal)
    assert r.statusCode == -3
    assert r.value == -(1 << 40)


def test_repeated_message_field():
    m = sm.StateResponseWithMapIterator(
        statusCode=0,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    r = _roundtrip(m, sm.StateResponseWithMapIterator)
    assert [(p.key, p.value) for p in r.kvPair] == [
        (b"k1", b"v1"), (b"k2", b"v2")
    ]
    assert r.requireNextFetch is True


def test_repeated_bytes_field():
    m = sm.StateResponseWithListGet(value=[b"a", b"", b"ccc"])
    r = _roundtrip(m, sm.StateResponseWithListGet)
    assert list(r.value) == [b"a", b"", b"ccc"]


def test_oneof_exclusivity():
    req = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"x")
    )
    # setting the sibling arm must clear the first
    req.removeImplicitKey = sm.RemoveImplicitKey()
    r = _roundtrip(req, sm.ImplicitGroupingKeyRequest)
    assert r.HasField("removeImplicitKey")
    assert not r.HasField("setImplicitKey")


def test_empty_submessage_still_serializes():
    """An empty oneof arm (RemoveImplicitKey has no fields) must emit a
    zero-length length-delimited field — presence is the payload."""
    req = sm.ImplicitGroupingKeyRequest(
        removeImplicitKey=sm.RemoveImplicitKey()
    )
    data = req.SerializeToString()
    assert data == bytes.fromhex("1200")  # field 2, len 0
    r = _roundtrip(req, sm.ImplicitGroupingKeyRequest)
    assert r.HasField("removeImplicitKey")


def test_unknown_fields_skipped():
    # field 99 varint + a real statusCode: unknown is ignored, known kept
    payload = bytes.fromhex("b8062a") + bytes.fromhex("0805")
    r = sm.StateResponse()
    r.ParseFromString(payload)
    assert r.statusCode == 5


def test_enum_module_constants_match_proto():
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert (sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) == (3, 4, 5)
    assert sm.HandleState.CLOSED == 5


def test_timer_info_repeated_with_optional_key():
    m = sm.StateResponseWithTimer(
        timer=[
            sm.TimerInfo(key=b"u1", timestampMs=123456789012),
            sm.TimerInfo(timestampMs=5),
        ],
    )
    r = _roundtrip(m, sm.StateResponseWithTimer)
    assert r.timer[0].key == b"u1"
    assert r.timer[0].timestampMs == 123456789012
    assert r.timer[1].key == b""  # absent optional -> default
    assert r.timer[1].timestampMs == 5


def test_shim_varint_primitives():
    # primitives exist only on the shim runtime; with a real protobuf
    # installation the public-API tests above still cover the behavior
    try:
        from google.protobuf._runtime import (
            _dec_varint,
            _enc_varint,
            _zigzag_dec,
            _zigzag_enc,
        )
    except ImportError:
        pytest.skip("real protobuf runtime — no shim internals")
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -(2**63)):
        enc = _enc_varint(v)
        dec, n = _dec_varint(enc, 0)
        assert n == len(enc)
        if v < 0:
            dec -= 1 << 64
        assert dec == v
    for v in (0, -1, 1, -2, 2, 2**31, -(2**31)):
        assert _zigzag_dec(_zigzag_enc(v)) == v


def test_submessage_write_through_read_anchors():
    """Real-protobuf idiom: `msg.sub.field = x` on an ABSENT submessage
    must anchor the submessage into the parent, not silently discard the
    write into a throwaway default instance (r7 ADVICE fix)."""
    m = sm.StateRequest()
    # identity-stable lazy default across reads
    assert m.statefulProcessorCall is m.statefulProcessorCall
    # read alone creates no presence
    assert not m.HasField("statefulProcessorCall")
    # a deep write through two lazy levels anchors the whole chain
    m.statefulProcessorCall.getValueState.stateName = "session"
    assert m.HasField("statefulProcessorCall")
    assert m.statefulProcessorCall.getValueState.stateName == "session"
    # and it survives a wire round-trip
    r = _roundtrip(m, sm.StateRequest)
    assert r.statefulProcessorCall.getValueState.stateName == "session"


def test_stale_lazy_handle_cannot_overwrite_explicit_value():
    """A lazy handle read out BEFORE an explicit submessage assignment
    must not re-anchor on a later first-write and clobber the assigned
    value (r8 ADVICE fix): real protobuf's read handle aliases the live
    field, it never resurrects a replaced default instance."""
    m = sm.StateRequest()
    stale = m.statefulProcessorCall  # lazy handle, not yet anchored
    explicit = type(m.statefulProcessorCall)()
    explicit.getValueState.stateName = "explicit"
    m.statefulProcessorCall = explicit
    # first write through the stale pre-assignment handle: must NOT
    # replace the explicitly-set submessage
    stale.getValueState.stateName = "stale"
    assert m.statefulProcessorCall.getValueState.stateName == "explicit"
    r = _roundtrip(m, sm.StateRequest)
    assert r.statefulProcessorCall.getValueState.stateName == "explicit"


def test_submessage_read_only_stays_absent_on_wire():
    m = sm.StateRequest(version=3)
    _ = m.statefulProcessorCall.getValueState.stateName  # read, no write
    assert m.SerializeToString() == bytes.fromhex("0803")


def test_shim_google_defers_to_real_distribution(tmp_path):
    """The shim's google/__init__ must sort any OTHER sys.path google/
    dir ahead of its own, so a real protobuf distribution wins even when
    the shim path precedes site-packages (worker PYTHONPATH ordering)."""
    import subprocess
    import sys

    from xml_to_parquet_spark.streaming import stateful

    fake_site = tmp_path / "site"
    real_pb = fake_site / "google" / "protobuf"
    real_pb.mkdir(parents=True)
    (real_pb / "__init__.py").write_text("__version__ = 'REAL'\n")
    code = (
        "import sys; sys.path.insert(0, %r); sys.path.append(%r); "
        "import google.protobuf as p; print(p.__version__)"
        % (stateful._PBSHIM_DIR, str(fake_site))
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True,
    )
    assert out.stdout.strip() == "REAL"
