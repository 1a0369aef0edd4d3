"""KFF reader + kmer-classified diploid haplotype sampling on the
reference's REAL fixtures (test/haplotype-sampling/: HPRC micb-kir3dl1
subgraphs, HG003 NovaSeq reads, KMC 29-mer counts — the 54_vg_haplotypes.t
workflow)."""
import gzip

import numpy as np
import pytest

from vg_tpu.index.haplotypes import haplotypes_from_paths
from vg_tpu.index.sampling import (classify_kmer_counts,
                                   estimate_coverage,
                                   recombine_haplotypes_diploid)
from vg_tpu.io.kff import read_kff

FIX = "/root/reference/test/haplotype-sampling"


@pytest.fixture(scope="module")
def hg003_kff():
    return read_kff(f"{FIX}/HG003.kff")


def test_kff_reader_decodes_hg003(hg003_kff):
    k, kmers, counts = hg003_kff
    assert k == 29
    assert len(kmers) == 42226
    assert counts.min() >= 2          # KMC min-count filter
    assert len(np.unique(kmers)) == len(kmers)


def test_kff_kmers_all_in_reads(hg003_kff):
    """Every counted kmer must occur in the reads it was counted from —
    the decisive decode-correctness check (2-bit packing, canonical
    orientation, section framing)."""
    from vg_tpu.index.minimizer import _rolling_kmers
    from vg_tpu.utils import dna

    k, kmers, counts = hg003_kff
    seqs = []
    with gzip.open(f"{FIX}/HG003.fq.gz", "rt") as f:
        for i, line in enumerate(f):
            if i % 4 == 1:
                seqs.append(line.strip())
    allk = []
    for s in seqs:
        fwd, rev, valid = _rolling_kmers(dna.encode(s), k)
        allk.append(np.where(rev < fwd, rev, fwd)[valid])
    rk = np.unique(np.concatenate(allk))
    idx = np.minimum(np.searchsorted(rk, kmers), len(rk) - 1)
    assert float((rk[idx] == kmers).mean()) == 1.0


def test_coverage_and_classes(hg003_kff):
    k, kmers, counts = hg003_kff
    cov = estimate_coverage(counts)
    # ~50x reads -> haploid kmer coverage in the tens
    assert 15 <= cov <= 80, cov
    typ, score = classify_kmer_counts(counts, cov)
    # present kmers dominate a clean 50x sample
    assert (typ == 2).mean() > 0.5
    assert score.max() == 1.0 and score.min() == -0.8


def test_diploid_sampling_micb_kir3dl1(hg003_kff):
    """Sample HG003's diploid from the HPRC subgraph: two haplotypes per
    locus, each carrying more of HG003's present kmers than the cohort
    average (the point of sampling)."""
    from vg_tpu.index.minimizer import _rolling_kmers
    from vg_tpu.io.gfa import read_gfa

    k, kmers, counts = hg003_kff
    g = read_gfa(f"{FIX}/micb-kir3dl1.gfa")
    haps = haplotypes_from_paths(g)
    assert haps.count > 10            # HPRC cohort haplotypes

    sampled = recombine_haplotypes_diploid(haps, kmers, counts,
                                           subchain_len=300, k=k)
    by_contig = {}
    for i, m in enumerate(sampled.metas):
        by_contig.setdefault(m.contig, []).append(i)
    assert all(len(v) == 2 for v in by_contig.values()), by_contig

    cov = estimate_coverage(counts)
    typ, _ = classify_kmer_counts(counts, cov)
    present = np.sort(kmers[typ == 2])
    in_kff = np.sort(kmers)

    def hapk(hs, h):
        t0, t1 = hs.hap_text_range(h)
        fwd, rev, valid = _rolling_kmers(hs.text[t0:t1], k)
        return np.unique(np.where(rev < fwd, rev, fwd)[valid])

    def absent_frac(hs, h):
        kk = hapk(hs, h)
        idx = np.minimum(np.searchsorted(in_kff, kk), len(in_kff) - 1)
        return float(1 - (in_kff[idx] == kk).mean())

    # sampled haplotypes carry almost no kmers HG003's reads never saw
    # (cohort average measured 0.042; sampled 0.002 — an 18x drop)
    base_abs = np.mean([absent_frac(haps, h) for h in range(haps.count)])
    samp_abs = np.mean([absent_frac(sampled, h)
                        for h in range(sampled.count)])
    assert samp_abs < base_abs / 5, (samp_abs, base_abs)
    assert samp_abs < 0.01, samp_abs
    # and the diploid pair covers nearly all of HG003's present kmers
    union = np.unique(np.concatenate(
        [hapk(sampled, h) for h in range(sampled.count)]))
    idx = np.minimum(np.searchsorted(union, present), len(union) - 1)
    recall = float((union[idx] == present).mean())
    assert recall > 0.95, recall


def test_sampled_graph_maps_hg003_reads(hg003_kff):
    """The fixture README's closing check: mapping HG003's own reads to
    the sampled graph works as well as to the full cohort graph, on a
    42x smaller haplotype text (measured: perfect-identity fraction
    0.76 sampled vs 0.74 full on the first 1500 reads)."""
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.fastq import Read
    from vg_tpu.io.gfa import read_gfa
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams

    k, kmers, counts = hg003_kff
    g = read_gfa(f"{FIX}/micb-kir3dl1.gfa")
    haps = haplotypes_from_paths(g)
    sampled = recombine_haplotypes_diploid(haps, kmers, counts,
                                           subchain_len=300, k=k)
    assert sampled.total_len < haps.total_len / 20

    with gzip.open(f"{FIX}/HG003.fq.gz", "rt") as f:
        lines = f.read().splitlines()
    reads = [Read(lines[i][1:], lines[i + 1], lines[i + 3])
             for i in range(0, 4 * 1500, 4)]

    def run(hs):
        idx = MinimizerIndex.build(hs)
        m = GiraffeMapper(hs, idx, GiraffeParams(batch_reads=1024))
        alns = []
        for i in range(0, len(reads), 1024):
            alns.extend(m.map_batch(reads[i : i + 1024]))
        ids = [a.identity for a in alns if a.path and a.path.mappings]
        return (len(ids), float(np.mean([i == 1.0 for i in ids])),
                float(np.mean(ids)))

    n_full, perf_full, mid_full = run(haps)
    n_samp, perf_samp, mid_samp = run(sampled)
    assert n_samp >= n_full - 10
    assert perf_samp >= perf_full - 0.02
    assert mid_samp >= mid_full - 0.03
