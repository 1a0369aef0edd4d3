"""Structural-variant pipeline test (BASELINE config 5): construct a 1Mbp
pangenome with SVs (symbolic and explicit), map reads simulated from the
SV haplotypes, pack, call, and verify the SV genotypes are recovered."""
import numpy as np
import pytest

from vg_tpu.call.caller import SnarlCaller
from vg_tpu.call.pack import Packer
from vg_tpu.construct.constructor import Constructor, ConstructorParams
from vg_tpu.index.haplotypes import thread_haplotypes
from vg_tpu.index.minimizer import MinimizerIndex
from vg_tpu.io.fastq import Read
from vg_tpu.io.vcf import VcfFile, VcfRecord
from vg_tpu.map.giraffe import GiraffeMapper
from vg_tpu.utils import dna


def test_symbolic_sv_canonicalization():
    rng = np.random.default_rng(0)
    ref_seq = dna.decode(rng.integers(0, 4, 3000).astype(np.uint8))
    recs = [
        VcfRecord("r", 500, "del1", ref_seq[499], ["<DEL>"], ".", ".",
                  {"END": "580", "SVTYPE": "DEL"}, [((1, 1), True)]),
        VcfRecord("r", 1000, "inv1", ref_seq[999], ["<INV>"], ".", ".",
                  {"END": "1100", "SVTYPE": "INV"}, [((0, 1), True)]),
        VcfRecord("r", 1500, "ins1", ref_seq[1499], ["<INS>"], ".", ".",
                  {"SVTYPE": "INS", "SEQ": "ACGTACGTACGTACGTACGTACGTACGT"},
                  [((1, 0), True)]),
    ]
    vcf = VcfFile(samples=["s"], records=recs)
    c = Constructor(ConstructorParams(max_node_size=32, do_svs=True))
    g, results = c.construct_graph({"r": ref_seq}, vcf)
    assert g.validate() == []
    assert g.path_seq("r") == ref_seq
    haps = thread_haplotypes(g, results, vcf)
    # haplotype 1 (phase 0): DEL hom, INV absent, INS present
    h1 = dna.decode(haps.text[haps.hap_text_range(1)[0]:
                              haps.hap_text_range(1)[1]])
    # deletion removed 80bp, insertion added 28bp
    assert len(h1) == len(ref_seq) - 80 + 28
    assert "ACGTACGTACGTACGTACGTACGTACGT" in h1
    assert ref_seq[500:580] not in h1
    # phase 1: DEL hom + INV present
    h2 = dna.decode(haps.text[haps.hap_text_range(2)[0]:
                              haps.hap_text_range(2)[1]])
    assert dna.revcomp_str(ref_seq[1000:1100]) in h2


@pytest.fixture(scope="module")
def sv_pangenome():
    rng = np.random.default_rng(7)
    N = 200_000
    ref_seq = dna.decode(rng.integers(0, 4, N).astype(np.uint8))
    recs = []
    sv_positions = []
    # 20 deletions of 50-300bp + 20 insertions of 50-150bp, well separated
    spots = np.linspace(5000, N - 5000, 40).astype(int)
    for i, p in enumerate(spots):
        p = int(p)
        gt = ((1, 1), True) if i % 3 == 0 else ((0, 1), True)
        if i % 2 == 0:
            ln = int(rng.integers(50, 300))
            recs.append(VcfRecord("r", p, f"del{i}",
                                  ref_seq[p - 1 : p - 1 + ln + 1],
                                  [ref_seq[p - 1]], ".", ".", {}, [gt]))
        else:
            ins = dna.decode(rng.integers(0, 4, int(rng.integers(50, 150))
                                          ).astype(np.uint8))
            recs.append(VcfRecord("r", p, f"ins{i}", ref_seq[p - 1],
                                  [ref_seq[p - 1] + ins], ".", ".", {}, [gt]))
        sv_positions.append((p, recs[-1]))
    vcf = VcfFile(samples=["s"], records=recs)
    g, results = Constructor(ConstructorParams(max_node_size=32)).construct_graph(
        {"r": ref_seq}, vcf)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    return g, haps, idx, vcf, ref_seq


def test_sv_genotyping_end_to_end(sv_pangenome):
    g, haps, idx, vcf, ref_seq = sv_pangenome
    m = GiraffeMapper(haps, idx)
    rng = np.random.default_rng(11)
    reads = []
    L = 150
    for h in (1, 2):                    # the sample's two haplotypes
        t0, t1 = haps.hap_text_range(h)
        for i in range((t1 - t0) * 12 // L):
            s = int(rng.integers(t0, t1 - L))
            codes = haps.text[s : s + L].copy()
            if rng.random() < 0.5:
                codes = dna.revcomp_codes(codes)
            reads.append(Read(f"h{h}r{i}", dna.decode(codes), None))
    alns = []
    for i in range(0, len(reads), 2048):
        alns.extend(m.map_batch(reads[i : i + 2048]))
    aligned = sum(1 for a in alns if a.path is not None)
    assert aligned >= 0.98 * len(reads)

    pk = Packer(g)
    pk.add_batch(alns)
    sc = SnarlCaller(g, pk, "r", sample_name="s")
    calls = sc.call()

    # match calls to the 40 SVs by position and length change
    truth = {}
    for r in vcf.records:
        gt = tuple(sorted(r.genotypes[0][0]))
        truth[r.pos] = (len(r.alts[0]) - len(r.ref), gt)
    found = 0
    gt_ok = 0
    for vc in calls:
        for alt in vc.alts:
            delta = len(alt) - len(vc.ref)
            for tp, (tdelta, tgt) in truth.items():
                if abs(vc.pos - tp) <= 5 and delta == tdelta:
                    found += 1
                    if tuple(sorted(vc.genotype)) == tgt:
                        gt_ok += 1
                    break
    assert found >= 0.9 * len(truth), f"only {found}/{len(truth)} SVs found"
    assert gt_ok >= 0.8 * found, f"genotype agreement {gt_ok}/{found}"
