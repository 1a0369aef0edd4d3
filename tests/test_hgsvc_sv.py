"""SV genotyping on the reference's real HGSVC chr22 fixture.

18_vg_call.t's SV golden maps real HG00514 reads and demands < 8 GT
differences of 17 vs the HGSVC truth VCF. The reads GAM is absent from
this reference snapshot, so reads are SIMULATED from the sample's true
haplotype walks instead (built by splicing the VCF's alt paths into the
chr22 reference walk per HG00514's genotypes) — the full pipeline
(alt-path embedding, giraffe mapping, pack, VCFGenotyper) then has to
recover those genotypes on real chr22 SV structure (multi-hundred-bp
insertions/deletions, 5 alleles at one site)."""
import numpy as np
import pytest

from vg_tpu.graph.augment import embed_alignment_paths
from vg_tpu.index.haplotypes import HaplotypeMeta, HaplotypeSet
from vg_tpu.io.gam import read_gam
from vg_tpu.io.vcf import read_vcf
from vg_tpu.io.vg_format import read_vg

FIX = "/root/reference/test/call"


def _find_subwalk(hay, needle):
    n = len(needle)
    if n == 0:
        return None
    for i in range(len(hay) - n + 1):
        if hay[i] == needle[0] and hay[i : i + n] == needle:
            return i
    return None


@pytest.fixture(scope="module")
def hgsvc():
    g0 = read_vg(f"{FIX}/HGSVC_chr22_17119590_17880307.vg")
    alts = list(read_gam(f"{FIX}/HGSVC_chr22_17119590_17880307_alts.gam"))
    g = embed_alignment_paths(g0, alts)
    vcf = read_vcf(f"{FIX}/HGSVC_chr22_17200000_17800000.vcf.gz")
    return g, vcf


def test_hgsvc_sv_genotyping_end_to_end(hgsvc):
    from vg_tpu.construct.constructor import make_variant_id
    from vg_tpu.call.caller import CallParams, SnarlCaller
    from vg_tpu.call.pack import Packer
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.fastq import Read
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper
    from vg_tpu.utils import dna

    g, vcf = hgsvc
    sample_i = vcf.samples.index("HG00514")
    ref_walk = [int(h) for h in g.path_handles("chr22")]

    # splice HG00514's alleles into the chr22 walk (alt path _<id>_a
    # replaces the ref-allele segment _<id>_0)
    hap_walks = [list(ref_walk), list(ref_walk)]
    truth = {}
    for rec in vcf.records:
        vid = make_variant_id(rec)
        gt, _phased = rec.genotypes[sample_i]
        truth[rec.pos] = tuple(sorted(gt))
        ref_alt = f"_alt_{vid}_0"
        if not g.has_path(ref_alt):
            continue
        ref_seg = [int(h) for h in g.path_handles(ref_alt)]
        for hap, allele in enumerate(gt):
            if allele == 0:
                continue
            alt_name = f"_alt_{vid}_{allele}"
            alt_seg = ([int(h) for h in g.path_handles(alt_name)]
                       if g.has_path(alt_name) else [])
            at = _find_subwalk(hap_walks[hap], ref_seg)
            if at is None:
                continue
            hap_walks[hap] = (hap_walks[hap][:at] + alt_seg
                              + hap_walks[hap][at + len(ref_seg):])

    metas = [HaplotypeMeta("chr22", "ref", 0, "chr22", is_ref=True),
             HaplotypeMeta("HG00514#1", "HG00514", 1, "chr22"),
             HaplotypeMeta("HG00514#2", "HG00514", 2, "chr22")]
    walks = [np.asarray(ref_walk, np.int64),
             np.asarray(hap_walks[0], np.int64),
             np.asarray(hap_walks[1], np.int64)]
    haps = HaplotypeSet(g, metas, walks)
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=2048),
                      ref_path_names=["chr22"])
    pm = PairedGiraffeMapper(m)

    # ~12x coverage pairs from the two sample haplotypes
    rng = np.random.default_rng(99)
    L, frag = 150, 450
    pairs = []
    for hap in (1, 2):
        lo, hi = haps.hap_text_range(hap)
        t = haps.text[lo:hi]
        n_pairs = int((hi - lo) * 6 / (2 * L))
        for _ in range(n_pairs):
            s = int(rng.integers(0, len(t) - frag))
            c1 = t[s : s + L].copy()
            c2 = t[s + frag - L : s + frag]
            pairs.append((Read("p", dna.decode(c1), None),
                          Read("p", dna.decode(dna.revcomp_codes(c2)),
                               None)))
    rng.shuffle(pairs)
    mapped = pm.map_pairs(pairs)
    mapped += pm.finish()

    pack = Packer(g)
    for a1, a2 in mapped:
        if a1.path and a1.path.mappings:
            pack.add(a1)
        if a2.path and a2.path.mappings:
            pack.add(a2)
    caller = SnarlCaller(g, pack, ref_path="chr22")
    calls = caller.genotype_given_vcf(vcf)
    got = {c.pos: tuple(sorted(c.genotype)) for c in calls}
    diffs = sum(1 for pos, tgt in truth.items()
                if got.get(pos, (0, 0)) != tgt)
    # the .t golden tolerates < 8 of 17 on real reads; simulated clean
    # coverage must do at least as well
    assert diffs < 8, (diffs, {v: (truth[v], got.get(v))
                               for v in truth if got.get(v, (0, 0))
                               != truth[v]})
