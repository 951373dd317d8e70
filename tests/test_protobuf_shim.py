"""Vendored protobuf shim: wire-format laws the JVM peer relies on.

The integration proof is tests/test_streaming.py (the Python worker
exchanges StateMessage frames with Spark's JVM state server through
the shim); these tests pin the encoding edges directly so a wire bug
fails in milliseconds, not via a hung streaming query.
"""

from __future__ import annotations

import pytest

# the shim must NOT shadow a real installation; resolve whichever the
# session layer would activate
from eventstreamd_spark.session import _ensure_protobuf_shim

_ensure_protobuf_shim()

from google.protobuf._runtime import (  # noqa: E402
    decode_varint,
    encode_varint,
    iter_wire_fields,
)


def _pb2():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_varint_roundtrip_edges() -> None:
    for v in (0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1, -1, -5, -(2**63)):
        data = encode_varint(v)
        got, pos = decode_varint(data, 0)
        assert pos == len(data)
        # negatives decode as unsigned 64-bit two's complement
        assert got == (v & ((1 << 64) - 1))
    # negative ints are always 10 bytes (the proto int64 rule)
    assert len(encode_varint(-1)) == 10


def test_oneof_message_presence_on_wire() -> None:
    sm = _pb2()
    # an EMPTY message set into a oneof must still appear on the wire
    # (length 0) — that's how the JVM learns which method was called
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    data = req.SerializeToString()
    assert data  # non-empty even though every leaf field is default
    parsed = sm.StateRequest()
    parsed.ParseFromString(data)
    inner = parsed.implicitGroupingKeyRequest.SerializeToString()
    assert inner  # removeImplicitKey tag survived the round trip


def test_plain_scalar_defaults_not_serialized() -> None:
    sm = _pb2()
    # proto3: explicitly setting a plain scalar to its default emits
    # nothing (the receiver assumes the default)
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"") \
        .SerializeToString() == b""
    assert sm.StateResponse(statusCode=7).SerializeToString() != b""


def test_repeated_bytes_and_messages() -> None:
    sm = _pb2()
    put = sm.ListStatePut(value=[b"", b"a", b"bb"], fetchWithArrow=True)
    out = sm.ListStatePut()
    out.ParseFromString(put.SerializeToString())
    assert list(out.value) == [b"", b"a", b"bb"]
    assert out.fetchWithArrow is True

    resp = sm.StateResponseWithTimer(
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=5),
            sm.TimerInfo(timestampMs=-7),
        ]
    )
    got = sm.StateResponseWithTimer()
    got.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in got.timer] == [
        (b"k1", 5),
        (b"", -7),  # absent optional bytes reads as the type default
    ]


def test_unknown_fields_skipped_by_wire_type() -> None:
    sm = _pb2()
    # craft bytes carrying an unknown varint field (#15) and an unknown
    # length-delimited field (#14) around a known statusCode=3
    data = (
        encode_varint((15 << 3) | 0) + encode_varint(99)
        + encode_varint((1 << 3) | 0) + encode_varint(3)
        + encode_varint((14 << 3) | 2) + encode_varint(4) + b"zzzz"
    )
    msg = sm.StateResponse()
    msg.ParseFromString(data)
    assert msg.statusCode == 3


def test_field_number_order_and_nested_ttl() -> None:
    sm = _pb2()
    cmd = sm.StateCallCommand(
        ttl=sm.TTLConfig(durationMs=250), stateName="s", schema="n bigint"
    )
    data = cmd.SerializeToString()
    # fields serialize in field-number order regardless of kwarg order:
    # stateName(1) < schema(2) < ttl(4)
    nums = [num for num, _, _ in iter_wire_fields(data)]
    assert nums == sorted(nums) == [1, 2, 4]
    out = sm.StateCallCommand()
    out.ParseFromString(data)
    assert (out.stateName, out.schema, out.ttl.durationMs) == (
        "s", "n bigint", 250
    )


def test_enum_constants_at_module_scope() -> None:
    sm = _pb2()
    assert sm.PRE_INIT == 0
    assert sm.INITIALIZED == 2
    assert sm.CLOSED == 5
    assert sm.HandleState.TIMER_PROCESSED == 4


def test_descriptor_blob_parse_matches_known_schema() -> None:
    sm = _pb2()
    d = sm.StateRequest.DESCRIPTOR
    assert d.fields_by_name["version"].number == 1
    assert d.fields_by_name["timerRequest"].number == 5
    assert sm.TimerInfo.DESCRIPTOR.fields_by_name["key"].proto3_optional
    with pytest.raises(AttributeError):
        sm.StateRequest(no_such_field=1)
