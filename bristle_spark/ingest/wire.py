"""Minimal protobuf wire-format codec (public spec:
https://protobuf.dev/programming-guides/encoding/).

The reference decodes arbitrary protobuf messages at runtime from
descriptor sets (reference proto_registry.go:45-103, dynamicpb) and
splits varint-length-prefixed message frames off the stream
(reference ingest_service.go:152-177, protowire.ConsumeBytes). This
container ships neither python-protobuf nor the spark-protobuf JVM
connector, so the engine carries its own spec-driven codec:

- field specs (bindings.py) play the role of the descriptor set;
- ``decode_message`` is the dynamicpb.Unmarshal analog;
- ``split_frames`` is the protowire.ConsumeBytes framing loop;
- ``encode_message`` exists for tests/fixtures (the client side,
  reference client/client.go:148-156).

On a real deployment one would use Spark's `from_protobuf` (JVM,
vectorized) with the same descriptor files bristle loads; this module
keeps identical semantics in Arrow-batched Python (see pipeline.py).

Wire types: 0 varint, 1 64-bit, 2 length-delimited, 5 32-bit.
proto3 packed encoding is handled for repeated scalar numerics, and
map<k,v> fields arrive as repeated (key=1, value=2) sub-messages.
"""

from __future__ import annotations

import struct
from typing import Any

VARINT_KINDS = {"int32", "int64", "uint32", "uint64", "bool", "enum"}
ZIGZAG_KINDS = {"sint32", "sint64"}
FIXED64_KINDS = {"fixed64", "sfixed64", "double"}
FIXED32_KINDS = {"fixed32", "sfixed32", "float"}
LEN_KINDS = {"string", "bytes", "timestamp"}
SCALAR_NUMERIC = VARINT_KINDS | ZIGZAG_KINDS | FIXED64_KINDS | FIXED32_KINDS


# ------------------------------------------------------------- varints


def encode_varint(value: int) -> bytes:
    if value < 0:  # negative int32/int64/enum: 10-byte two's complement
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("malformed varint")


def zigzag_encode(value: int) -> int:
    return (value << 1) ^ (value >> 63)


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def _to_signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


def _to_signed32(value: int) -> int:
    value &= (1 << 32) - 1
    return value - (1 << 32) if value >= (1 << 31) else value


# ------------------------------------------------------------- encoding


def _tag(number: int, wire_type: int) -> bytes:
    return encode_varint((number << 3) | wire_type)


def _encode_scalar(kind: str, value: Any) -> tuple[int, bytes]:
    """Return (wire_type, payload) for one scalar value."""
    if kind in VARINT_KINDS:
        return 0, encode_varint(int(value))
    if kind in ZIGZAG_KINDS:
        return 0, encode_varint(zigzag_encode(int(value)))
    if kind == "double":
        return 1, struct.pack("<d", float(value))
    if kind in FIXED64_KINDS:
        return 1, struct.pack("<q" if kind == "sfixed64" else "<Q", int(value))
    if kind == "float":
        return 5, struct.pack("<f", float(value))
    if kind in FIXED32_KINDS:
        return 5, struct.pack("<i" if kind == "sfixed32" else "<I", int(value))
    if kind == "string":
        payload = str(value).encode("utf-8")
        return 2, encode_varint(len(payload)) + payload
    if kind == "bytes":
        return 2, encode_varint(len(value)) + bytes(value)
    if kind == "timestamp":  # google.protobuf.Timestamp{seconds=1, nanos=2}
        seconds, nanos = value
        inner = b""
        if seconds:
            inner += _tag(1, 0) + encode_varint(int(seconds))
        if nanos:
            inner += _tag(2, 0) + encode_varint(int(nanos))
        return 2, encode_varint(len(inner)) + inner
    raise ValueError(f"unsupported kind {kind}")


def encode_field(number: int, kind: str, value: Any, repeated: bool = False) -> bytes:
    """Encode one field. Repeated scalar numerics use packed encoding
    (proto3 default); repeated strings/bytes/messages repeat the tag."""
    if repeated:
        if kind in SCALAR_NUMERIC:
            payload = b"".join(_encode_scalar(kind, v)[1] for v in value)
            return _tag(number, 2) + encode_varint(len(payload)) + payload
        return b"".join(encode_field(number, kind, v) for v in value)
    wire_type, payload = _encode_scalar(kind, value)
    return _tag(number, wire_type) + payload


def encode_map_field(number: int, key_kind: str, value_kind: str, mapping: dict) -> bytes:
    out = bytearray()
    for k, v in mapping.items():
        entry = encode_field(1, key_kind, k) + encode_field(2, value_kind, v)
        out += _tag(number, 2) + encode_varint(len(entry)) + entry
    return bytes(out)


def encode_message(fields: list[tuple[int, str, Any, bool]]) -> bytes:
    """Encode a message from (number, kind, value, repeated) tuples.
    kind "map:<kk>:<vk>" encodes a map field; None values are skipped
    (proto3 unset)."""
    out = bytearray()
    for number, kind, value, repeated in fields:
        if value is None:
            continue
        if kind.startswith("map:"):
            _, kk, vk = kind.split(":")
            out += encode_map_field(number, kk, vk, value)
        else:
            out += encode_field(number, kind, value, repeated)
    return bytes(out)


# ------------------------------------------------------------- decoding


def _decode_value(kind: str, wire_type: int, buf: bytes, pos: int) -> tuple[Any, int]:
    if wire_type == 0:
        raw, pos = decode_varint(buf, pos)
        if kind in ZIGZAG_KINDS:
            return zigzag_decode(raw), pos
        if kind == "bool":
            return bool(raw), pos
        if kind in {"int32", "int64", "enum"}:
            return _to_signed64(raw), pos
        return raw, pos  # uint32/uint64
    if wire_type == 1:
        if kind == "double":
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        fmt = "<q" if kind == "sfixed64" else "<Q"
        return struct.unpack_from(fmt, buf, pos)[0], pos + 8
    if wire_type == 5:
        if kind == "float":
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        fmt = "<i" if kind == "sfixed32" else "<I"
        return struct.unpack_from(fmt, buf, pos)[0], pos + 4
    if wire_type == 2:
        length, pos = decode_varint(buf, pos)
        payload = buf[pos : pos + length]
        pos += length
        if kind == "string":
            return payload.decode("utf-8"), pos
        if kind == "bytes":
            return bytes(payload), pos
        if kind == "timestamp":
            return _decode_timestamp(payload), pos
        return payload, pos  # caller-handled (packed / map entry)
    raise ValueError(f"unsupported wire type {wire_type}")


def _decode_timestamp(payload: bytes) -> tuple[int, int]:
    seconds = nanos = 0
    pos = 0
    while pos < len(payload):
        tag, pos = decode_varint(payload, pos)
        number, wt = tag >> 3, tag & 7
        val, pos = _decode_value("int64", wt, payload, pos)
        if number == 1:
            seconds = val
        elif number == 2:
            nanos = val
    return seconds, nanos


def _decode_packed(kind: str, payload: bytes) -> list:
    values = []
    pos = 0
    wire_type = 1 if kind in FIXED64_KINDS else 5 if kind in FIXED32_KINDS else 0
    while pos < len(payload):
        v, pos = _decode_value(kind, wire_type, payload, pos)
        values.append(v)
    return values


def _skip(wire_type: int, buf: bytes, pos: int) -> int:
    if wire_type == 0:
        _, pos = decode_varint(buf, pos)
        return pos
    if wire_type == 1:
        return pos + 8
    if wire_type == 5:
        return pos + 4
    if wire_type == 2:
        length, pos = decode_varint(buf, pos)
        return pos + length
    raise ValueError(f"unsupported wire type {wire_type}")


def decode_message(buf: bytes, field_specs: dict[int, tuple[str, bool]]) -> dict[int, Any]:
    """Decode one message given {field_number: (kind, repeated)}.

    Unknown fields are skipped (proto3 semantics). Repeated fields
    accumulate; packed scalar payloads are expanded. Map fields use
    kind "map:<kk>:<vk>" and accumulate into a dict. Later occurrences
    of a singular field win (proto3 last-one-wins)."""
    out: dict[int, Any] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = decode_varint(buf, pos)
        number, wire_type = tag >> 3, tag & 7
        spec = field_specs.get(number)
        if spec is None:
            pos = _skip(wire_type, buf, pos)
            continue
        kind, repeated = spec
        if kind.startswith("map:"):
            _, kk, vk = kind.split(":")
            payload, pos2 = _decode_value("bytes", wire_type, buf, pos)
            pos = pos2
            entry = decode_message(payload, {1: (kk, False), 2: (vk, False)})
            out.setdefault(number, {})[entry.get(1)] = entry.get(2)
            continue
        if repeated and kind in SCALAR_NUMERIC and wire_type == 2:
            length, pos2 = decode_varint(buf, pos)
            values = _decode_packed(kind, buf[pos2 : pos2 + length])
            out.setdefault(number, []).extend(values)
            pos = pos2 + length
            continue
        value, pos = _decode_value(kind, wire_type, buf, pos)
        if repeated:
            out.setdefault(number, []).append(value)
        else:
            out[number] = value
    return out


# ------------------------------------------------------------- framing


def split_frames(data: bytes) -> list[bytes]:
    """Split a varint-length-prefixed concatenation of messages — the
    reference's stream batch framing (ingest_service.go:152-177;
    client-side framing client/client.go:148-156)."""
    frames = []
    pos = 0
    while pos < len(data):
        length, pos = decode_varint(data, pos)
        frames.append(bytes(data[pos : pos + length]))
        pos += length
    return frames


def join_frames(frames: list[bytes]) -> bytes:
    return b"".join(encode_varint(len(f)) + f for f in frames)
