"""Minimal protobuf wire-format primitives (hand-rolled, no codegen).

We speak the protobuf wire format directly for GAM/graph interchange rather
than depending on generated classes: the message surface is small, field
numbers were recovered empirically from reference fixture files, and a
hand-rolled codec keeps hot read/write paths allocation-light.
"""
from __future__ import annotations

import struct
from typing import Iterator, Tuple


def encode_varint(value: int) -> bytes:
    if value < 0:
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


def decode_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def tag(field: int, wire_type: int) -> bytes:
    return encode_varint((field << 3) | wire_type)


def field_varint(field: int, value: int) -> bytes:
    return tag(field, 0) + encode_varint(value)


def field_bool(field: int, value: bool) -> bytes:
    return field_varint(field, 1 if value else 0)


def field_bytes(field: int, value: bytes) -> bytes:
    return tag(field, 2) + encode_varint(len(value)) + value


def field_str(field: int, value: str) -> bytes:
    return field_bytes(field, value.encode())


def field_double(field: int, value: float) -> bytes:
    return tag(field, 1) + struct.pack("<d", value)


def iter_fields(buf: bytes, start: int = 0, end: int | None = None
                ) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a serialized message.

    wire 0 -> int, wire 1 -> float (as double), wire 2 -> memoryview,
    wire 5 -> int (fixed32 raw).
    """
    pos = start
    end = len(buf) if end is None else end
    mv = memoryview(buf)
    while pos < end:
        key, pos = decode_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            value, pos = decode_varint(buf, pos)
            yield field, wt, value
        elif wt == 2:
            length, pos = decode_varint(buf, pos)
            yield field, wt, mv[pos : pos + length]
            pos += length
        elif wt == 1:
            yield field, wt, struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wt == 5:
            yield field, wt, struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def zigzag_decode(value: int) -> int:
    return (value >> 1) ^ -(value & 1)


def signed64(value: int) -> int:
    """Interpret a varint as a two's-complement int64."""
    if value >= 1 << 63:
        value -= 1 << 64
    return value
