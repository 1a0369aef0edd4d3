import numpy as np
import pytest

from vg_tpu.construct.constructor import Constructor
from vg_tpu.index.haplotypes import HaplotypeSet, haplotypes_from_paths, thread_haplotypes
from vg_tpu.index.minimizer import MinimizerIndex, extract_minimizers, wang_hash_64
from vg_tpu.io.fasta import read_fasta
from vg_tpu.io.vcf import read_vcf
from vg_tpu.utils import dna


@pytest.fixture(scope="module")
def tiny_build(ref_test_dir):
    ref = read_fasta(str(ref_test_dir / "tiny" / "tiny.fa"))
    vcf = read_vcf(str(ref_test_dir / "tiny" / "tiny.vcf.gz"))
    g, results = Constructor().construct_graph(ref, vcf)
    return g, results, ref, vcf


@pytest.fixture(scope="module")
def small_build(ref_test_dir):
    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor().construct_graph(ref, vcf)
    return g, results, ref, vcf


def test_haplotypes_from_paths(tiny_build):
    g, results, ref, vcf = tiny_build
    haps = haplotypes_from_paths(g)
    assert haps.count == 1
    t0, t1 = haps.hap_text_range(0)
    assert dna.decode(haps.text[t0:t1]) == ref["x"]


def test_thread_haplotypes_tiny(tiny_build):
    g, results, ref, vcf = tiny_build
    haps = thread_haplotypes(g, results, vcf)
    # ref path + 2 phases of sample "1"
    assert haps.count == 3
    assert haps.metas[0].is_ref
    # tiny.vcf: sample 1 GTs 1|0,1|1,1|0,1|1,1|0
    # phase 0 haplotype: alts at 9(G->A), 10(C->T), 14(G->A), 34(T->A), 39(T->A)
    x = ref["x"]
    h0 = list(x)
    for pos, alt in [(9, "A"), (10, "T"), (14, "A"), (34, "A"), (39, "A")]:
        h0[pos - 1] = alt
    h0 = "".join(h0)
    # phase 1: alts only where GT second allele is 1: positions 10 and 34
    h1 = list(x)
    for pos, alt in [(10, "T"), (34, "A")]:
        h1[pos - 1] = alt
    h1 = "".join(h1)
    t0, t1 = haps.hap_text_range(1)
    assert dna.decode(haps.text[t0:t1]) == h0
    t0, t1 = haps.hap_text_range(2)
    assert dna.decode(haps.text[t0:t1]) == h1


def test_thread_haplotypes_small_with_indels(small_build):
    g, results, ref, vcf = small_build
    haps = thread_haplotypes(g, results, vcf)
    assert haps.count == 3
    # each haplotype must spell a sequence derivable by applying its variants
    for h in (1, 2):
        t0, t1 = haps.hap_text_range(h)
        seq = dna.decode(haps.text[t0:t1])
        phase = haps.metas[h].phase
        expect = apply_variants(ref["x"], vcf, phase)
        assert seq == expect


def apply_variants(ref_seq, vcf, phase):
    out = []
    cursor = 0
    for rec in vcf.records:
        alleles, _ = rec.genotypes[0]
        a = alleles[phase] if phase < len(alleles) else 0
        if a is None or a == 0:
            continue
        pos0 = rec.pos - 1
        if pos0 < cursor:
            continue  # overlapping variant: first one wins
        out.append(ref_seq[cursor:pos0])
        out.append(rec.alts[a - 1])
        cursor = pos0 + len(rec.ref)
    out.append(ref_seq[cursor:])
    return "".join(out).upper()


def test_walk_interval_roundtrip(tiny_build):
    g, results, ref, vcf = tiny_build
    haps = thread_haplotypes(g, results, vcf)
    t0, t1 = haps.hap_text_range(1)
    pieces = haps.walk_interval(t0 + 5, t0 + 25)
    total = sum(ln for _, _, ln in pieces)
    assert total == 20
    # spell out the pieces from the graph and compare to the text
    seq = []
    for handle, off, ln in pieces:
        seq.append(g.handle_seq(handle)[off : off + ln])
    assert "".join(seq) == dna.decode(haps.text[t0 + 5 : t0 + 25])


def test_extract_minimizers_basic():
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, size=500).astype(np.uint8)
    offs, keys, is_rev = extract_minimizers(codes, k=29, w=11)
    assert len(offs) > 0
    # coverage: every window of 11 consecutive kmers contains >= 1 minimizer
    chosen = np.zeros(500 - 29 + 1, bool)
    chosen[offs] = True
    for wstart in range(0, len(chosen) - 11 + 1):
        assert chosen[wstart : wstart + 11].any()
    # canonical invariance: minimizers of the revcomp have mirrored keys
    rc = dna.revcomp_codes(codes)
    offs2, keys2, _ = extract_minimizers(rc, k=29, w=11)
    assert set(map(int, keys)) == set(map(int, keys2))


def test_minimizer_index_lookup(small_build):
    g, results, ref, vcf = small_build
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    assert idx.unique_count > 0
    # a read taken straight from the reference must have all its minimizers
    # found at the right text positions
    t0, t1 = haps.hap_text_range(0)
    read = haps.text[t0 + 300 : t0 + 400]
    offs, keys, is_rev = extract_minimizers(read, idx.k, idx.w)
    assert len(offs) > 0
    found_correct = 0
    for o, key in zip(offs, keys):
        pos, rev = idx.lookup(int(key))
        if (t0 + 300 + o) in set(map(int, pos)):
            found_correct += 1
    assert found_correct == len(offs)


def test_minimizer_dedup(small_build):
    """Identical haplotype stretches across the cohort dedup to at most
    max_alt_positions entries per graph placement."""
    g, results, ref, vcf = small_build
    haps = thread_haplotypes(g, results, vcf)
    idx2 = MinimizerIndex.build(haps, max_alt_positions=1)
    idx8 = MinimizerIndex.build(haps, max_alt_positions=8)
    assert len(idx2.pos_text) <= len(idx8.pos_text)
