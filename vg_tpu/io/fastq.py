"""FASTQ reading — single, gzipped, paired, and interleaved.

Reference behavior: vg's FASTQ drivers (libvgio fastq_* functions used at
src/subcommand/giraffe_main.cpp:2369-2475) feed fixed-size read batches to
mapper threads. Here the analogous consumer is a fixed-shape device batch.
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple


@dataclass(slots=True)
class Read:
    name: str
    sequence: str
    quality: Optional[str] = None  # ASCII phred+33, None for FASTA input
    comment: Optional[str] = None  # header text after the first token


def _open(path: str):
    if str(path).endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def iter_fastq(path: str) -> Iterator[Read]:
    with _open(path) as f:
        first = f.read(1)
        if not first:
            return
        if first == ">":
            # FASTA reads (the ">" is already consumed)
            name = f.readline().strip().split()[0]
            seq_chunks: list[str] = []
            for line in f:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    yield Read(name, "".join(seq_chunks))
                    name = line[1:].split()[0]
                    seq_chunks = []
                else:
                    seq_chunks.append(line)
            yield Read(name, "".join(seq_chunks))
            return
        assert first == "@", f"not FASTQ/FASTA: {path}"
        header = f.readline().strip()
        parts = header.split(None, 1)
        name = parts[0]
        comment = parts[1] if len(parts) > 1 else None
        while True:
            seq = f.readline().strip()
            plus = f.readline()
            qual = f.readline().strip()
            yield Read(name, seq, qual, comment)
            header = f.readline()
            if not header:
                return
            assert header[0] == "@", "bad FASTQ record"
            parts = header[1:].strip().split(None, 1)
            name = parts[0]
            comment = parts[1] if len(parts) > 1 else None


def _strip_pair_suffix(name: str) -> str:
    if len(name) > 2 and name[-2] == "/" and name[-1] in "12":
        return name[:-2]
    return name


def iter_fastq_paired(path1: str, path2: str) -> Iterator[Tuple[Read, Read]]:
    it1, it2 = iter_fastq(path1), iter_fastq(path2)
    for r1 in it1:
        r2 = next(it2)
        r1.name = _strip_pair_suffix(r1.name)
        r2.name = _strip_pair_suffix(r2.name)
        yield r1, r2


def iter_fastq_interleaved(path: str) -> Iterator[Tuple[Read, Read]]:
    it = iter_fastq(path)
    for r1 in it:
        r2 = next(it)
        r1.name = _strip_pair_suffix(r1.name)
        r2.name = _strip_pair_suffix(r2.name)
        yield r1, r2
