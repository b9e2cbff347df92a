"""Unit tests for the protobuf wire codec (pure Python, no Spark)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bristle_spark.ingest import wire


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
@settings(max_examples=200)
def test_varint_roundtrip(v):
    buf = wire.encode_varint(v)
    out, pos = wire.decode_varint(buf, 0)
    assert out == v and pos == len(buf)


@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
@settings(max_examples=200)
def test_zigzag_roundtrip(v):
    assert wire.zigzag_decode(wire.zigzag_encode(v)) == v


def _decode(body, specs):
    return wire.decode_message(body, specs)


def test_scalar_kinds_roundtrip():
    fields = [
        (1, "int64", -12345, False),
        (2, "uint64", (1 << 62) + 7, False),
        (3, "sint64", -99, False),
        (4, "bool", True, False),
        (5, "double", 3.25, False),
        (6, "float", 1.5, False),
        (7, "string", "héllo", False),
        (8, "bytes", b"\x00\x01\xff", False),
        (9, "fixed64", 1 << 40, False),
        (10, "sfixed32", -42, False),
        (11, "enum", 2, False),
    ]
    body = wire.encode_message(fields)
    specs = {n: (k, r) for n, k, _, r in fields}
    out = _decode(body, specs)
    for n, k, v, _ in fields:
        assert out[n] == v, (n, k, out[n], v)


def test_negative_int32_uses_ten_byte_varint():
    body = wire.encode_message([(1, "int32", -1, False)])
    out = _decode(body, {1: ("int32", False)})
    assert out[1] == -1


def test_packed_and_unpacked_repeated():
    body = wire.encode_message([(1, "int64", [1, 2, 300000], True)])
    out = _decode(body, {1: ("int64", True)})
    assert out[1] == [1, 2, 300000]
    # string repeated: tag per element
    body = wire.encode_message([(2, "string", ["a", "bb"], True)])
    out = _decode(body, {2: ("string", True)})
    assert out[2] == ["a", "bb"]


def test_map_field():
    body = wire.encode_message([(5, "map:string:string", {"b": "2", "a": "1"}, False)])
    out = _decode(body, {5: ("map:string:string", False)})
    assert out[5] == {"a": "1", "b": "2"}


def test_timestamp_field():
    body = wire.encode_message([(3, "timestamp", (1700000000, 500), False)])
    out = _decode(body, {3: ("timestamp", False)})
    assert out[3] == (1700000000, 500)


def test_unknown_fields_skipped():
    body = wire.encode_message(
        [(1, "string", "keep", False), (99, "double", 2.5, False), (98, "string", "drop", False)]
    )
    out = _decode(body, {1: ("string", False)})
    assert out == {1: "keep"}


def test_unset_fields_absent():
    body = wire.encode_message([(1, "string", None, False)])
    assert body == b""
    assert _decode(body, {1: ("string", False)}) == {}


def test_frame_split_roundtrip():
    frames = [b"alpha", b"", b"x" * 300]
    data = wire.join_frames(frames)
    assert wire.split_frames(data) == frames


# ---------------------------------------- round-10 envelope properties


@given(
    st.text(max_size=40),
    st.lists(
        st.tuples(
            st.text(min_size=1, max_size=30),
            st.lists(st.binary(max_size=60), max_size=6),
        ),
        max_size=5,
    ),
)
@settings(max_examples=60)
def test_write_batch_request_roundtrip_property(key, payloads):
    """Unary WriteBatchRequest (bristle.proto:22-25) survives encode →
    decode for arbitrary keys, type names, and body lists."""
    from bristle_spark.ingest import service as svc

    got_key, got = svc.decode_write_batch_request(
        svc.encode_write_batch_request(key, payloads)
    )
    assert got_key == key
    assert got == [(t, list(bs)) for t, bs in payloads]


@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.integers(min_value=0, max_value=(1 << 64) - 1),
)
@settings(max_examples=60)
def test_write_batch_response_roundtrip_property(ack, dropped):
    from bristle_spark.ingest import service as svc

    assert svc.decode_write_batch_response(
        svc.encode_write_batch_response(ack, dropped)
    ) == (ack, dropped)


@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.lists(st.text(min_size=1, max_size=30), max_size=6),
)
@settings(max_examples=60)
def test_backoff_roundtrip_property(until_ms, types):
    """Backoff advisory (bristle.proto:96-99) envelope roundtrip."""
    from bristle_spark.ingest import service as svc

    kind, body = svc.decode_server_message(svc.encode_backoff(until_ms, types))
    assert kind == "backoff"
    assert body == {"until": until_ms, "types": types}
