"""BGZF (blocked gzip) reader/writer.

BGZF is the block-compressed gzip variant used by htslib for BAM/BCF and by
vg for GAM streams (reference behavior: vg frames protobuf groups inside a
BGZF stream; see SURVEY.md Appendix E). Each block is an ordinary gzip member
whose extra field carries the compressed block size (subfield 'BC'), capped
at 64 KiB of input per block, terminated by a fixed 28-byte EOF block.

A plain `gzip.decompress` can read a whole BGZF file (it is valid multi-member
gzip); this module exists so we can *write* streams that htslib/vg-compatible
readers accept, and so we can read block-at-a-time without loading everything.
"""
from __future__ import annotations

import struct
import zlib
from typing import BinaryIO, Iterator

MAX_BLOCK_INPUT = 0xFF00  # 65280, htslib's default uncompressed block payload

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _make_block(data: bytes, level: int = 6) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    crc = zlib.crc32(data) & 0xFFFFFFFF
    bsize = len(comp) + 25 + 1  # header(12) + XLEN payload(6) + comp + crc(4) + isize(4)
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 0x08, 0x04,  # magic, deflate, FEXTRA
        0,                        # mtime
        0, 0xFF,                  # XFL, OS=unknown
        6,                        # XLEN
        0x42, 0x43,               # 'B','C'
        2,                        # subfield length
        bsize - 1,                # BSIZE - 1
    )
    return header + comp + struct.pack("<II", crc, len(data) & 0xFFFFFFFF)


class BGZFWriter:
    def __init__(self, fileobj: BinaryIO, level: int = 6):
        self._f = fileobj
        self._level = level
        self._buf = bytearray()

    def write(self, data: bytes) -> None:
        self._buf.extend(data)
        while len(self._buf) >= MAX_BLOCK_INPUT:
            chunk = bytes(self._buf[:MAX_BLOCK_INPUT])
            del self._buf[:MAX_BLOCK_INPUT]
            self._f.write(_make_block(chunk, self._level))

    def flush(self) -> None:
        if self._buf:
            self._f.write(_make_block(bytes(self._buf), self._level))
            self._buf.clear()

    def close(self) -> None:
        self.flush()
        self._f.write(BGZF_EOF)
        self._f.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def compress(data: bytes, level: int = 6) -> bytes:
    """Compress a whole byte string into a BGZF stream (with EOF block)."""
    out = bytearray()
    for i in range(0, len(data), MAX_BLOCK_INPUT):
        out += _make_block(data[i : i + MAX_BLOCK_INPUT], level)
    out += BGZF_EOF
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decompress a BGZF (or any multi-member gzip) byte string."""
    out = bytearray()
    d = zlib.decompressobj(31)
    rest = data
    while rest:
        out += d.decompress(rest)
        rest = d.unused_data
        if rest:
            d = zlib.decompressobj(31)
        elif not d.eof:
            out += d.flush()
            break
    return bytes(out)


def iter_blocks(fileobj: BinaryIO) -> Iterator[bytes]:
    """Yield uncompressed payloads block-at-a-time from a BGZF file."""
    while True:
        header = fileobj.read(12)
        if len(header) < 12:
            return
        magic1, magic2, _cm, flg, _mtime, _xfl, _os, xlen = struct.unpack(
            "<BBBBIBBH", header
        )
        if magic1 != 0x1F or magic2 != 0x8B:
            raise ValueError("not a gzip stream")
        extra = fileobj.read(xlen)
        bsize = None
        i = 0
        while i + 4 <= len(extra):
            si1, si2, slen = extra[i], extra[i + 1], struct.unpack("<H", extra[i + 2 : i + 4])[0]
            if si1 == 0x42 and si2 == 0x43 and slen == 2:
                bsize = struct.unpack("<H", extra[i + 4 : i + 6])[0] + 1
            i += 4 + slen
        if bsize is None:
            raise ValueError("gzip member without BGZF BC subfield")
        payload_len = bsize - 12 - xlen - 8
        comp = fileobj.read(payload_len)
        crc, isize = struct.unpack("<II", fileobj.read(8))
        data = zlib.decompress(comp, -15)
        if len(data) != isize:
            raise ValueError("BGZF block length mismatch")
        if data:
            yield data
