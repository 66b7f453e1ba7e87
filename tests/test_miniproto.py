"""Unit tests for the vendored miniproto runtime (clean-room minimal
google.protobuf stand-in, `vendor/miniproto/google/protobuf/_mini.py`).

The shim's one consumer is PySpark's TWS state protocol, where a wire
bug means a silent hang in a socket handshake — so these tests pin the
encoding against hand-computed byte vectors from the public protobuf
encoding spec, not just round-trips.
"""

from __future__ import annotations

import pytest

from march_mania_spark_lakehouse_spark.vendor import ensure_protobuf

mode = ensure_protobuf()
sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")

from march_mania_spark_lakehouse_spark.vendor.miniproto.google.protobuf import (  # noqa: E402
    _mini,
)


# -- wire primitives, hand-computed vectors --------------------------------


def test_varint_spec_vectors():
    # spec examples: 1 -> 01 ; 150 -> 9601 ; 300 -> ac02
    assert _mini.encode_varint(1) == b"\x01"
    assert _mini.encode_varint(150) == b"\x96\x01"
    assert _mini.encode_varint(300) == b"\xac\x02"
    # max uint64 boundary
    assert _mini.decode_varint(_mini.encode_varint((1 << 64) - 1), 0)[0] == (1 << 64) - 1
    # negative int encodes as 10-byte two's-complement varint
    assert len(_mini.encode_varint(-1)) == 10
    v, _ = _mini.decode_varint(_mini.encode_varint(-1), 0)
    assert _mini._to_signed64(v) == -1


def test_zigzag():
    for raw, enc in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)]:
        assert _mini._zigzag_encode(raw) == enc
        assert _mini._zigzag_decode(enc) == raw


def test_truncated_input_raises():
    with pytest.raises(_mini.DecodeError):
        list(_mini.iter_fields(b"\x0a\x05ab"))  # declared len 5, only 2 bytes
    with pytest.raises(_mini.DecodeError):
        _mini.decode_varint(b"\xff", 0)


# -- message encoding against known protobuf bytes -------------------------


def test_statereques_wire_bytes_hand_verified():
    """StateRequest(version=2, statefulProcessorCall=...setHandleState
    (state=CREATED)) must produce exactly:
    08 02          field1 varint 2
    12 04          field2 len 4
      0a 02        setHandleState (field1 of StatefulProcessorCall) len 2
        08 01      state = CREATED(1)
    """
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    assert req.SerializeToString() == bytes.fromhex("080212040a020801")


def test_empty_submessage_sets_oneof_on_wire():
    """ValueStateCall(stateName='seen', get=Get()) — the empty Get()
    must still appear (zero-length field 3) so the JVM's oneof
    discriminator is set: 0a 04 's' 'e' 'e' 'n' 1a 00."""
    v = sm.ValueStateCall(stateName="seen", get=sm.Get())
    assert v.SerializeToString() == bytes.fromhex("0a047365656e1a00")


def test_implicit_key_request_roundtrip():
    key = b"\x00" * 3 + b"abc"
    msg = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=key)
        )
    )
    out = sm.StateRequest()
    out.ParseFromString(msg.SerializeToString())
    assert out.implicitGroupingKeyRequest.setImplicitKey.key == key


def test_response_parse_including_negative_status_and_defaults():
    raw = sm.StateResponse(statusCode=-1, errorMessage="boom").SerializeToString()
    r = sm.StateResponse()
    r.ParseFromString(raw)
    assert (r.statusCode, r.errorMessage, r.value) == (-1, "boom", b"")
    # unset scalar reads give proto3 defaults
    fresh = sm.StateResponse()
    assert (fresh.statusCode, fresh.errorMessage, fresh.value) == (0, "", b"")


def test_repeated_bytes_roundtrip_and_empty_not_serialized():
    al = sm.AppendList(value=[b"a", b"bb", b""], fetchWithArrow=False)
    out = sm.AppendList()
    out.ParseFromString(al.SerializeToString())
    assert out.value == [b"a", b"bb", b""]
    assert out.fetchWithArrow is False
    assert sm.AppendList().SerializeToString() == b""  # nothing set -> empty


def test_enum_constants_match_proto_declaration_order():
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert sm.HandleState.Name(sm.CLOSED) == "CLOSED"
    assert sm.HandleState.Value("DATA_PROCESSED") == sm.DATA_PROCESSED


def test_unknown_fields_are_skipped():
    # field 999 varint + field 1 (statusCode) = 7
    raw = _mini.encode_varint(999 << 3 | 0) + b"\x2a" + b"\x08\x07"
    r = sm.StateResponse()
    r.ParseFromString(raw)
    assert r.statusCode == 7


def test_utf8_string_field():
    m = sm.ParseStringSchema(schema="état: naïve ✓")
    out = sm.ParseStringSchema()
    out.ParseFromString(m.SerializeToString())
    assert out.schema == "état: naïve ✓"


def test_clear_and_copyfrom():
    m = sm.StateResponse(statusCode=3, value=b"x")
    c = sm.StateResponse()
    c.CopyFrom(m)
    assert c.statusCode == 3 and c.value == b"x"
    m.Clear()
    assert m.SerializeToString() == b""


def test_timer_response_with_repeated_message():
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=100),
            sm.TimerInfo(key=b"k2", timestampMs=200),
        ],
        requireNextFetch=True,
    )
    out = sm.StateResponseWithTimer()
    out.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in out.timer] == [(b"k1", 100), (b"k2", 200)]
    assert out.requireNextFetch is True


# -- property-based round-trips (hypothesis) --------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_varint_roundtrip_u64(v):
    enc = _mini.encode_varint(v)
    dec, consumed = _mini.decode_varint(enc, 0)
    assert dec == v and consumed == len(enc)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
def test_zigzag_roundtrip_i64(v):
    assert _mini._zigzag_decode(_mini._zigzag_encode(v)) == v


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
    st.text(max_size=80),
    st.binary(max_size=200),
    st.booleans(),
)
def test_state_response_like_roundtrip(status, err, value, fetch):
    m = sm.StateResponseWithListGet(
        statusCode=status, errorMessage=err, value=[value], requireNextFetch=fetch
    )
    out = sm.StateResponseWithListGet()
    out.ParseFromString(m.SerializeToString())
    assert out.statusCode == status
    assert out.errorMessage == err
    assert out.value == [value]
    assert out.requireNextFetch is fetch


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(max_size=64), max_size=20), st.booleans())
def test_append_list_repeated_bytes_roundtrip(vals, fetch):
    m = sm.AppendList(value=vals, fetchWithArrow=fetch)
    out = sm.AppendList()
    out.ParseFromString(m.SerializeToString())
    assert out.value == vals
    assert out.fetchWithArrow is fetch


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 62)), st.binary(min_size=1, max_size=64))
def test_nested_request_roundtrip(ts, key):
    req = sm.StateRequest(
        version=2,
        timerRequest=sm.TimerRequest(
            expiryTimerRequest=sm.ExpiryTimerRequest(expiryTimestampMs=ts)
        ),
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=key)
        ),
    )
    out = sm.StateRequest()
    out.ParseFromString(req.SerializeToString())
    assert out.version == 2
    assert out.timerRequest.expiryTimerRequest.expiryTimestampMs == ts
    assert out.implicitGroupingKeyRequest.setImplicitKey.key == key
