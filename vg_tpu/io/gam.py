"""GAM (graph alignment) data model + codec.

The message surface mirrors vg's Alignment/Path/Mapping/Position/Edit
protobufs (reference: libvgio vg.proto, reconstructed in SURVEY.md Appendix E;
field numbers recovered empirically from the wire bytes of the fixture GAMs
under /root/reference/test). Framing is the vg stream format: groups of
length-delimited messages, `varint count` then `count` x (`varint len`,
message), BGZF-compressed. Type-tagged groups (count includes a leading tag
string message, e.g. "GAM") are accepted on read and optional on write.

JSON conversion matches `vg view -aj` conventions (snake_case field names,
zero-valued fields omitted) so jq-based golden assertions from the reference
test suite (test/t/*.t) can be reused verbatim.
"""
from __future__ import annotations

import io as _io
import json
import struct
from dataclasses import dataclass, field as dfield
from typing import BinaryIO, Iterable, Iterator, List, Optional, Tuple

from . import bgzf
from .wire import (
    decode_varint,
    encode_varint,
    field_bool,
    field_bytes,
    field_double,
    field_str,
    field_varint,
    iter_fields,
    signed64,
    tag,
)

KNOWN_TAGS = {b"GAM", b"VG", b"GAMP", b"SNARL", b"GBWT", b"PACK", b"TRANS"}


# ---------------------------------------------------------------------------
# data model
# ---------------------------------------------------------------------------

@dataclass(slots=True)
class Position:
    node_id: int = 0       # field 1
    offset: int = 0        # field 2
    is_reverse: bool = False  # field 4
    name: str = ""         # field 5 (path name, used in refpos)

    def encode(self) -> bytes:
        out = bytearray()
        if self.node_id:
            out += field_varint(1, self.node_id)
        if self.offset:
            out += field_varint(2, self.offset)
        if self.is_reverse:
            out += field_bool(4, True)
        if self.name:
            out += field_str(5, self.name)
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "Position":
        p = cls()
        for f, wt, v in iter_fields(buf):
            if f == 1:
                p.node_id = v
            elif f == 2:
                p.offset = signed64(v)
            elif f == 4:
                p.is_reverse = bool(v)
            elif f == 5:
                p.name = bytes(v).decode()
        return p

    def to_json(self) -> dict:
        d = {}
        if self.node_id:
            d["node_id"] = str(self.node_id)
        if self.offset:
            d["offset"] = str(self.offset)
        if self.is_reverse:
            d["is_reverse"] = True
        if self.name:
            d["name"] = self.name
        return d


@dataclass(slots=True)
class Edit:
    from_length: int = 0   # field 1: graph bases consumed
    to_length: int = 0     # field 2: read bases consumed
    sequence: str = ""     # field 3: set for mismatch/insertion

    def encode(self) -> bytes:
        out = bytearray()
        if self.from_length:
            out += field_varint(1, self.from_length)
        if self.to_length:
            out += field_varint(2, self.to_length)
        if self.sequence:
            out += field_str(3, self.sequence)
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "Edit":
        e = cls()
        for f, wt, v in iter_fields(buf):
            if f == 1:
                e.from_length = v
            elif f == 2:
                e.to_length = v
            elif f == 3:
                e.sequence = bytes(v).decode()
        return e

    def is_match(self) -> bool:
        return self.from_length == self.to_length and not self.sequence

    def to_json(self) -> dict:
        d = {}
        if self.from_length:
            d["from_length"] = self.from_length
        if self.to_length:
            d["to_length"] = self.to_length
        if self.sequence:
            d["sequence"] = self.sequence
        return d


@dataclass(slots=True)
class Mapping:
    position: Position = dfield(default_factory=Position)  # field 1
    edits: List[Edit] = dfield(default_factory=list)       # field 2
    rank: int = 0                                          # field 5

    def encode(self) -> bytes:
        out = bytearray()
        pos = self.position.encode()
        out += field_bytes(1, pos)
        for e in self.edits:
            out += field_bytes(2, e.encode())
        if self.rank:
            out += field_varint(5, self.rank)
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "Mapping":
        m = cls()
        for f, wt, v in iter_fields(buf):
            if f == 1:
                m.position = Position.decode(bytes(v))
            elif f == 2:
                m.edits.append(Edit.decode(bytes(v)))
            elif f == 5:
                m.rank = v
        return m

    def from_length(self) -> int:
        return sum(e.from_length for e in self.edits)

    def to_length(self) -> int:
        return sum(e.to_length for e in self.edits)

    def to_json(self) -> dict:
        d: dict = {"position": self.position.to_json()}
        if self.edits:
            d["edit"] = [e.to_json() for e in self.edits]
        if self.rank:
            d["rank"] = str(self.rank)
        return d


@dataclass(slots=True)
class Path:
    name: str = ""                                          # field 1
    mappings: List[Mapping] = dfield(default_factory=list)  # field 2

    def encode(self) -> bytes:
        out = bytearray()
        if self.name:
            out += field_str(1, self.name)
        for m in self.mappings:
            out += field_bytes(2, m.encode())
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "Path":
        p = cls()
        for f, wt, v in iter_fields(buf):
            if f == 1:
                p.name = bytes(v).decode()
            elif f == 2:
                p.mappings.append(Mapping.decode(bytes(v)))
        return p

    def to_json(self) -> dict:
        d: dict = {}
        if self.name:
            d["name"] = self.name
        if self.mappings:
            d["mapping"] = [m.to_json() for m in self.mappings]
        return d


def _encode_struct_value(v) -> bytes:
    """google.protobuf.Value"""
    if v is None:
        return field_varint(1, 0)
    if isinstance(v, bool):
        return field_bool(4, v)
    if isinstance(v, (int, float)):
        return field_double(2, float(v))
    if isinstance(v, str):
        return field_str(3, v)
    if isinstance(v, dict):
        return field_bytes(5, _encode_struct(v))
    if isinstance(v, (list, tuple)):
        inner = b"".join(field_bytes(1, _encode_struct_value(x)) for x in v)
        return field_bytes(6, inner)
    raise TypeError(f"unsupported annotation value {type(v)}")


def _encode_struct(d: dict) -> bytes:
    out = bytearray()
    for k, v in d.items():
        entry = field_str(1, k) + field_bytes(2, _encode_struct_value(v))
        out += field_bytes(1, entry)
    return bytes(out)


def _decode_struct_value(buf: bytes):
    for f, wt, v in iter_fields(buf):
        if f == 1:
            return None
        if f == 2:
            return v
        if f == 3:
            return bytes(v).decode()
        if f == 4:
            return bool(v)
        if f == 5:
            return _decode_struct(bytes(v))
        if f == 6:
            out = []
            for f2, _, v2 in iter_fields(bytes(v)):
                if f2 == 1:
                    out.append(_decode_struct_value(bytes(v2)))
            return out
    return None


def _decode_struct(buf: bytes) -> dict:
    d = {}
    for f, wt, v in iter_fields(buf):
        if f == 1:
            key, val = "", None
            for f2, _, v2 in iter_fields(bytes(v)):
                if f2 == 1:
                    key = bytes(v2).decode()
                elif f2 == 2:
                    val = _decode_struct_value(bytes(v2))
            d[key] = val
    return d


@dataclass(slots=True)
class Alignment:
    sequence: str = ""                 # field 1
    path: Optional[Path] = None        # field 2
    name: str = ""                     # field 3
    quality: bytes = b""               # field 4 (raw phred bytes)
    mapping_quality: int = 0           # field 5
    score: int = 0                     # field 6
    query_position: int = 0            # field 7
    sample_name: str = ""              # field 9
    read_group: str = ""               # field 10
    fragment_prev: Optional["Alignment"] = None  # field 11
    fragment_next: Optional["Alignment"] = None  # field 12
    is_secondary: bool = False         # field 15
    identity: float = 0.0              # field 16
    refpos: List[Position] = dfield(default_factory=list)  # field 19
    time_used: float = 0.0             # field 35 (double)
    annotation: dict = dfield(default_factory=dict)        # field 100 (Struct)
    # unknown fields preserved for lossless round-trip of reference files
    unknown: List[Tuple[int, int, bytes]] = dfield(default_factory=list)

    def encode(self) -> bytes:
        out = bytearray()
        if self.sequence:
            out += field_str(1, self.sequence)
        if self.path is not None:
            out += field_bytes(2, self.path.encode())
        if self.name:
            out += field_str(3, self.name)
        if self.quality:
            out += field_bytes(4, self.quality)
        if self.mapping_quality:
            out += field_varint(5, self.mapping_quality)
        if self.score:
            out += field_varint(6, self.score)
        if self.query_position:
            out += field_varint(7, self.query_position)
        if self.sample_name:
            out += field_str(9, self.sample_name)
        if self.read_group:
            out += field_str(10, self.read_group)
        if self.fragment_prev is not None:
            out += field_bytes(11, self.fragment_prev.encode())
        if self.fragment_next is not None:
            out += field_bytes(12, self.fragment_next.encode())
        if self.is_secondary:
            out += field_bool(15, True)
        if self.identity:
            out += field_double(16, self.identity)
        for rp in self.refpos:
            out += field_bytes(19, rp.encode())
        if self.time_used:
            out += field_double(35, self.time_used)
        if self.annotation:
            out += field_bytes(100, _encode_struct(self.annotation))
        for f, wt, raw in self.unknown:
            if wt == 0:
                out += tag(f, 0) + raw
            elif wt == 1:
                out += tag(f, 1) + raw
            elif wt == 2:
                out += tag(f, 2) + encode_varint(len(raw)) + raw
            elif wt == 5:
                out += tag(f, 5) + raw
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "Alignment":
        a = cls()
        for f, wt, v in iter_fields(buf):
            if f == 1:
                a.sequence = bytes(v).decode()
            elif f == 2:
                a.path = Path.decode(bytes(v))
            elif f == 3:
                a.name = bytes(v).decode()
            elif f == 4:
                a.quality = bytes(v)
            elif f == 5:
                a.mapping_quality = v
            elif f == 6:
                a.score = signed64(v)
            elif f == 7:
                a.query_position = v
            elif f == 9:
                a.sample_name = bytes(v).decode()
            elif f == 10:
                a.read_group = bytes(v).decode()
            elif f == 11:
                a.fragment_prev = Alignment.decode(bytes(v))
            elif f == 12:
                a.fragment_next = Alignment.decode(bytes(v))
            elif f == 15:
                a.is_secondary = bool(v)
            elif f == 16:
                a.identity = v
            elif f == 19:
                a.refpos.append(Position.decode(bytes(v)))
            elif f == 35:
                a.time_used = v
            elif f == 100:
                a.annotation = _decode_struct(bytes(v))
            else:
                if wt == 0:
                    a.unknown.append((f, 0, encode_varint(v)))
                elif wt == 1:
                    a.unknown.append((f, 1, struct.pack("<d", v)))
                elif wt == 2:
                    a.unknown.append((f, 2, bytes(v)))
                elif wt == 5:
                    a.unknown.append((f, 5, struct.pack("<I", v)))
        return a

    def to_json(self) -> dict:
        d: dict = {}
        if self.sequence:
            d["sequence"] = self.sequence
        if self.path is not None:
            d["path"] = self.path.to_json()
        if self.name:
            d["name"] = self.name
        if self.quality:
            import base64
            d["quality"] = base64.b64encode(self.quality).decode()
        if self.mapping_quality:
            d["mapping_quality"] = self.mapping_quality
        if self.score:
            d["score"] = self.score
        if self.sample_name:
            d["sample_name"] = self.sample_name
        if self.read_group:
            d["read_group"] = self.read_group
        if self.fragment_prev is not None:
            d["fragment_prev"] = self.fragment_prev.to_json()
        if self.fragment_next is not None:
            d["fragment_next"] = self.fragment_next.to_json()
        if self.is_secondary:
            d["is_secondary"] = True
        if self.identity:
            d["identity"] = self.identity
        if self.refpos:
            d["refpos"] = [p.to_json() for p in self.refpos]
        if self.time_used:
            d["time_used"] = self.time_used
        if self.annotation:
            d["annotation"] = self.annotation
        return d

    def to_json_str(self) -> str:
        return json.dumps(self.to_json(), separators=(",", ":"))


# ---------------------------------------------------------------------------
# stream framing
# ---------------------------------------------------------------------------

def write_messages(fileobj: BinaryIO, messages: Iterable[bytes],
                   tag_name: bytes | None = b"GAM",
                   group_size: int = 1000, level: int = 1) -> None:
    """Write messages in vg stream framing (BGZF, grouped, optionally
    tagged). Compression level 1 by default: GAM streams are write-hot
    and htslib-compatible at any level."""
    w = bgzf.BGZFWriter(fileobj, level=level)
    group: List[bytes] = []

    def flush_group():
        if not group:
            return
        n = len(group) + (1 if tag_name else 0)
        w.write(encode_varint(n))
        if tag_name:
            w.write(encode_varint(len(tag_name)) + tag_name)
        for msg in group:
            w.write(encode_varint(len(msg)))
            w.write(msg)
        group.clear()

    for msg in messages:
        group.append(msg)
        if len(group) >= group_size:
            flush_group()
    flush_group()
    w.close()


def read_messages(data: bytes) -> Iterator[bytes]:
    """Iterate serialized messages from a vg-framed stream (handles BGZF,
    tagged and untagged groups)."""
    if data[:2] == b"\x1f\x8b":
        data = bgzf.decompress(data)
    pos = 0
    n = len(data)
    while pos < n:
        count, pos = decode_varint(data, pos)
        first = True
        for _ in range(count):
            length, pos = decode_varint(data, pos)
            msg = data[pos : pos + length]
            pos += length
            if first:
                first = False
                if length <= 8 and msg in KNOWN_TAGS:
                    continue  # group tag, not a payload message
            yield msg


def write_gam(path_or_file, alignments: Iterable[Alignment],
              tagged: bool = False) -> None:
    """Write alignments as a GAM file.

    tagged=False matches the framing of the reference test fixtures.
    """
    msgs = (a.encode() for a in alignments)
    if hasattr(path_or_file, "write"):
        write_messages(path_or_file, msgs, b"GAM" if tagged else None)
    else:
        with open(path_or_file, "wb") as f:
            write_messages(f, msgs, b"GAM" if tagged else None)


def read_gam(path_or_file) -> Iterator[Alignment]:
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
    else:
        with open(path_or_file, "rb") as f:
            data = f.read()
    for msg in read_messages(data):
        yield Alignment.decode(msg)
