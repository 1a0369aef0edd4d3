"""Surjection tests (oracles from reference test/t/15_vg_surject.t):
perfect reads surject to full-length matches on the right path with the
right score; softclips are preserved; SAM output is well-formed."""
import re

import numpy as np
import pytest

from vg_tpu.construct.constructor import Constructor, ConstructorParams
from vg_tpu.index.haplotypes import thread_haplotypes
from vg_tpu.index.minimizer import MinimizerIndex
from vg_tpu.io.fasta import read_fasta
from vg_tpu.io.fastq import Read, iter_fastq_paired
from vg_tpu.io.vcf import read_vcf
from vg_tpu.map.giraffe import GiraffeMapper
from vg_tpu.map.paired import PairedGiraffeMapper
from vg_tpu.surject.surjector import Surjector
from vg_tpu.utils import dna


@pytest.fixture(scope="module")
def setup(ref_test_dir):
    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(ConstructorParams(max_node_size=1000)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    return g, haps, GiraffeMapper(haps, idx), ref["x"].upper()


def _cigar_read_len(cigar):
    return sum(int(n) for n, op in re.findall(r"(\d+)([MIS=X])", cigar))


def test_surject_paired_sim(setup, ref_test_dir):
    g, haps, mapper, refseq = setup
    pm = PairedGiraffeMapper(mapper)
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:100]
    out = pm.map_pairs(pairs)
    sj = Surjector(g)
    recs = sj.surject_pairs(out)
    assert len(recs) == 200
    # 15_vg_surject.t:36: all reads placed on path x
    assert all(r.rname == "x" for r in recs if not (r.flag & 0x4))
    for r in recs:
        if r.flag & 0x4:
            continue
        assert _cigar_read_len(r.cigar) == len(r.seq)
        assert 1 <= r.pos <= len(refseq)
        # M runs must be consistent with the reference at that position
        # for perfect CIGARs
        if r.cigar == "100M":
            mism = sum(a != b for a, b in
                       zip(refseq[r.pos - 1 : r.pos - 1 + 100], r.seq))
            assert mism <= 5
    # header
    hdr = sj.header()
    assert any(h.startswith("@SQ\tSN:x\tLN:1001") for h in hdr)


def test_surject_preserves_softclips(setup):
    """15_vg_surject.t:78: original softclips stay soft-clipped."""
    g, haps, mapper, refseq = setup
    rng = np.random.default_rng(11)
    junk = "".join("ACGT"[i] for i in rng.integers(0, 4, 29))
    read = Read("clip", junk + refseq[200:271], None)
    (aln,) = mapper.map_batch([read])
    assert aln.path is not None
    sj = Surjector(g)
    rec = sj.surject(aln)
    m = re.match(r"^(\d+)S", rec.cigar)
    assert m and 25 <= int(m.group(1)) <= 33, rec.cigar
    assert rec.pos - 1 >= 195


def test_surject_score_perfect_reads(setup):
    """15_vg_surject.t:27: perfect 100bp reads keep score 110 after
    surjection (100 matches + 2x5 bonus)."""
    g, haps, mapper, refseq = setup
    reads = [Read(f"p{i}", refseq[i * 37 : i * 37 + 100], None)
             for i in range(20)]
    alns = mapper.map_batch(reads)
    sj = Surjector(g)
    for aln in alns:
        rec = sj.surject(aln)
        as_tag = [v for n, t, v in rec.tags if n == "AS"][0]
        assert as_tag == 110
        assert rec.cigar == "100M"
        assert rec.pos - 1 == int(aln.name[1:]) * 37
