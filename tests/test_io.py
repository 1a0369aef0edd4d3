import io
import json

import numpy as np
import pytest

from vg_tpu.io import bgzf, gam
from vg_tpu.io.fasta import read_fasta
from vg_tpu.io.fastq import iter_fastq, iter_fastq_paired
from vg_tpu.io.vcf import read_vcf
from vg_tpu.utils import dna


def test_dna_roundtrip():
    s = "ACGTNacgtX"
    codes = dna.encode(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    assert dna.decode(codes) == "ACGTNACGTN"
    assert dna.revcomp_str("AACGT") == "ACGTT"


def test_bgzf_roundtrip():
    data = b"hello world " * 100000
    comp = bgzf.compress(data)
    assert bgzf.decompress(comp) == data
    # readable by plain gzip too
    import gzip
    assert gzip.decompress(comp) == data
    # block iteration
    blocks = list(bgzf.iter_blocks(io.BytesIO(comp)))
    assert b"".join(blocks) == data


def test_gam_encode_decode_roundtrip():
    a = gam.Alignment(
        sequence="ACGT",
        name="read1",
        score=73,
        mapping_quality=60,
        identity=1.0,
        quality=bytes([30, 30, 30, 30]),
        path=gam.Path(mappings=[
            gam.Mapping(
                position=gam.Position(node_id=5, offset=2, is_reverse=True),
                edits=[gam.Edit(from_length=4, to_length=4)],
                rank=1,
            )
        ]),
        refpos=[gam.Position(name="x", offset=100)],
        annotation={"param_hit_cap": 10.0, "proper_pair": True, "stage": "extend"},
        time_used=0.001,
    )
    buf = a.encode()
    b = gam.Alignment.decode(buf)
    assert b.sequence == "ACGT"
    assert b.score == 73
    assert b.mapping_quality == 60
    assert b.path.mappings[0].position.node_id == 5
    assert b.path.mappings[0].position.is_reverse
    assert b.refpos[0].name == "x"
    assert b.annotation["proper_pair"] is True
    assert b.annotation["param_hit_cap"] == 10.0
    assert b.time_used == 0.001
    # stable re-encode
    assert gam.Alignment.decode(b.encode()).encode() == b.encode()


def test_gam_file_roundtrip(tmp_path):
    alns = [gam.Alignment(sequence="ACGT" * 10, name=f"r{i}", score=i)
            for i in range(2500)]
    p = tmp_path / "test.gam"
    gam.write_gam(str(p), alns)
    back = list(gam.read_gam(str(p)))
    assert len(back) == 2500
    assert back[1234].name == "r1234"
    assert back[1234].score == 1234
    # tagged framing round-trips too
    p2 = tmp_path / "tagged.gam"
    gam.write_gam(str(p2), alns[:10], tagged=True)
    back2 = list(gam.read_gam(str(p2)))
    assert len(back2) == 10


def test_read_reference_gam_fixtures(ref_test_dir):
    """Parse real vg-produced GAM files (sim truth reads on the tiny graph).

    Golden facts from reference test/t/50_vg_giraffe.t and the fixture
    generator: 30 reads of length 10 on the tiny graph.
    """
    path = ref_test_dir / "tiny" / "tiny-s543-n30-l10.gam"
    alns = list(gam.read_gam(str(path)))
    assert len(alns) == 30
    for a in alns:
        assert len(a.sequence) == 10
        assert a.path is not None and len(a.path.mappings) >= 1
        assert a.identity == 1.0
        # all node ids must be in the tiny graph's 1..15 range
        for m in a.path.mappings:
            assert 1 <= m.position.node_id <= 15
    # byte-lossless round trip of a reference-produced file
    for a in alns:
        assert gam.Alignment.decode(a.encode()).encode() == a.encode()


def test_read_reference_paired_gam(ref_test_dir):
    path = ref_test_dir / "small" / "x-s1-l100-n100-p50.gam"
    alns = list(gam.read_gam(str(path)))
    assert len(alns) == 200  # 100 pairs
    with_next = [a for a in alns if a.fragment_next is not None]
    with_prev = [a for a in alns if a.fragment_prev is not None]
    assert len(with_next) == 100 and len(with_prev) == 100
    assert with_next[0].fragment_next.name == with_next[0].name[:-2] + "_2"


def test_fasta(ref_test_dir):
    seqs = read_fasta(str(ref_test_dir / "tiny" / "tiny.fa"))
    assert seqs["x"] == "CAAATAAGGCTTGGAAATTTTCTGGAGTTCTATTATATTCCAACTCTCTG"
    small = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    assert len(small["x"]) == 1001


def test_fastq(ref_test_dir):
    reads = list(iter_fastq(str(ref_test_dir / "reads" / "small.middle.ref.fq")))
    assert len(reads) == 1
    assert len(reads[0].sequence) == 63
    assert reads[0].name == "read"
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))
    assert len(pairs) > 0
    assert pairs[0][0].name == pairs[0][1].name


def test_vcf(ref_test_dir):
    vf = read_vcf(str(ref_test_dir / "tiny" / "tiny.vcf.gz"))
    assert vf.samples == ["1"]
    assert len(vf.records) == 5
    r = vf.records[0]
    assert (r.chrom, r.pos, r.ref, r.alts) == ("x", 9, "G", ["A"])
    assert r.genotypes[0] == ((1, 0), True)
    # small/x.vcf has indels too
    vf2 = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    assert len(vf2.records) > 50
    assert any(len(r.ref) != len(a) for r in vf2.records for a in r.alts)


def test_gamp_roundtrip_and_best_path():
    import io as _io

    from vg_tpu.io.gam import Alignment, Edit, Mapping, Path, Position
    from vg_tpu.io.gamp import (MultipathAlignment, Subpath, read_gamp,
                                write_gamp)

    p1 = Path(mappings=[Mapping(position=Position(node_id=1),
                                edits=[Edit(from_length=4, to_length=4)],
                                rank=1)])
    p2 = Path(mappings=[Mapping(position=Position(node_id=2),
                                edits=[Edit(from_length=4, to_length=4)],
                                rank=1)])
    mp = MultipathAlignment(
        sequence="ACGTACGT", name="r1", mapping_quality=42,
        subpaths=[Subpath(path=p1, score=9, next=[1]),
                  Subpath(path=p2, score=5)],
        start=[0])
    buf = _io.BytesIO()
    write_gamp(buf, [mp])
    buf.seek(0)
    (back,) = list(read_gamp(buf))
    assert back.name == "r1" and back.mapping_quality == 42
    assert len(back.subpaths) == 2
    assert back.subpaths[0].next == [1]
    assert back.subpaths[0].score == 9
    best = back.best_alignment()
    assert best.score == 14         # chain 0 -> 1
    assert [m.position.node_id for m in best.path.mappings] == [1, 2]
    # from_alignment inverse
    mp2 = MultipathAlignment.from_alignment(best)
    assert mp2.subpaths[0].score == 14


def test_gaf_roundtrip_positions():
    import io as _io

    from vg_tpu.io.gaf import alignment_to_gaf, parse_gaf_line
    from vg_tpu.io.gam import Alignment, Edit, Mapping, Path, Position

    aln = Alignment(name="r", sequence="ACGTACGTAC", score=20,
                    mapping_quality=55)
    aln.path = Path(mappings=[
        Mapping(position=Position(node_id=5, offset=2),
                edits=[Edit(from_length=6, to_length=6)], rank=1),
        Mapping(position=Position(node_id=7, is_reverse=True),
                edits=[Edit(from_length=4, to_length=4)], rank=2)])
    line = alignment_to_gaf(aln)
    back = parse_gaf_line(line)
    assert back.name == "r"
    assert back.mapping_quality == 55
    assert back.score == 20
    assert [(m.position.node_id, m.position.is_reverse)
            for m in back.path.mappings] == [(5, False), (7, True)]
    assert back.path.mappings[0].position.offset == 2
    # aligned spans survive
    froms = sum(e.from_length for m in back.path.mappings for e in m.edits)
    assert froms == 10


def test_bam_roundtrip(tmp_path):
    """BAM writer/reader roundtrip (mutually validating: no htslib here)."""
    from vg_tpu.io.bam import read_bam, write_bam
    from vg_tpu.io.sam import SamRecord, sam_header

    refs = [("x", 1001), ("y", 500)]
    recs = [
        SamRecord(qname="r1", flag=0, rname="x", pos=10, mapq=60,
                  cigar="50M", seq="A" * 50, qual="I" * 50,
                  tags=[("AS", "i", 55), ("NM", "i", 2)]),
        # odd-length sequence exercises the trailing nibble
        SamRecord(qname="r2", flag=16, rname="y", pos=3, mapq=13,
                  cigar="20M1D10M2S", seq="ACGTN" * 6 + "ACG",
                  qual="".join(chr(33 + (i % 40)) for i in range(33)),
                  tags=[("RG", "Z", "grp1")]),
        # unmapped, no qual
        SamRecord(qname="r3", flag=4, seq="ACGT", qual="*"),
        # mate on same ref via '='
        SamRecord(qname="r4", flag=99, rname="x", pos=100, mapq=60,
                  cigar="30M", rnext="=", pnext=250, tlen=180,
                  seq="C" * 30, qual="F" * 30),
    ]
    p = tmp_path / "t.bam"
    with open(p, "wb") as f:
        write_bam(f, sam_header(refs), refs, recs)
    # file magic: BGZF (gzip) container
    raw = p.read_bytes()
    assert raw[:2] == b"\x1f\x8b"

    header, refs2, back = read_bam(str(p))
    assert refs2 == refs
    assert any(l.startswith("@SQ\tSN:x\tLN:1001") for l in header)
    assert len(back) == len(recs)
    for orig, got in zip(recs, back):
        assert got.qname == orig.qname
        assert got.flag == orig.flag
        assert got.pos == orig.pos
        assert got.mapq == orig.mapq
        assert got.cigar == orig.cigar
        assert got.seq == orig.seq
        if orig.qual != "*":
            assert got.qual == orig.qual
        assert got.tags == orig.tags
    # rname resolution: '=' expands, unmapped stays '*'
    assert back[2].rname == "*" and back[2].pos == 0
    assert back[3].rnext == "x" and back[3].pnext == 250
    assert back[3].tlen == 180


def test_gam_index_random_access(tmp_path):
    """Sorted-GAM node-range index: lookup reads only overlapping groups."""
    import os

    from vg_tpu.io.gam import Alignment, Edit, Mapping, Path, Position, read_gam
    from vg_tpu.io.gam_index import GamIndex, find_alignments, write_indexed_gam
    from vg_tpu.utils.alnstats import sort_alignments

    def aln(name, nodes):
        a = Alignment(name=name, sequence="ACGT", score=4)
        a.path = Path(mappings=[
            Mapping(position=Position(node_id=n),
                    edits=[Edit(from_length=1, to_length=1)], rank=i + 1)
            for i, n in enumerate(nodes)])
        return a

    alns = [aln(f"r{n}", [n, n + 1]) for n in range(1, 2001)]
    alns.append(Alignment(name="unmapped", sequence="ACGT"))
    alns = sort_alignments(alns)
    gam = tmp_path / "s.gam"
    gai = tmp_path / "s.gam.gai"
    n = write_indexed_gam(str(gam), str(gai), alns, group_size=100)
    assert n == 2001
    # the stream is still a valid GAM end-to-end
    assert sum(1 for _ in read_gam(str(gam))) == 2001

    idx = GamIndex.load(str(gai))
    size = os.path.getsize(gam)
    # a narrow query touches few groups, not the whole file
    narrow = idx.ranges(500, 510, size)
    assert sum(e - s for s, e in narrow) < size / 4

    got = sorted(a.name for a in find_alignments(str(gam), str(gai), 500, 505))
    # r499 covers nodes 499-500 ... r505 covers 505-506
    assert got == [f"r{n}" for n in range(499, 506)]
    # query beyond all nodes finds nothing (and skips the unmapped tail)
    assert list(find_alignments(str(gam), str(gai), 10_000, 10_001)) == []
