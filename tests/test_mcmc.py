"""MCMC phased genotyper tests (vg mcmc role,
reference src/mcmc_genotyper.cpp via subcommand/mcmc_main.cpp)."""
import numpy as np
import pytest

from vg_tpu.call.mcmc import MCMCGenotyper, MCMCParams
from vg_tpu.construct.constructor import Constructor, ConstructorParams
from vg_tpu.index.haplotypes import thread_haplotypes
from vg_tpu.index.minimizer import MinimizerIndex
from vg_tpu.io.fastq import Read
from vg_tpu.io.vcf import VcfFile, VcfRecord
from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
from vg_tpu.utils import dna


@pytest.fixture(scope="module")
def het_setup():
    """Reference + one diploid sample, het at every SNP site, with the
    alts phased all-on-haplotype-1 (so truth phase is recoverable)."""
    rng = np.random.default_rng(5)
    ref_codes = rng.integers(0, 4, 4000).astype(np.uint8)
    ref_seq = dna.decode(ref_codes)
    sites = [500, 1200, 2000, 2800, 3500]
    recs = []
    for p in sites:
        r = ref_seq[p]
        alt = "ACGT"[("ACGT".index(r) + 1) % 4]
        # phased 1|0: haplotype 0 carries the alt on every site
        recs.append(VcfRecord("r", p + 1, ".", r, [alt], ".", ".", {},
                              [((1, 0), True)]))
    vcf = VcfFile(samples=["s"], records=recs)
    g, results = Constructor(ConstructorParams(max_node_size=64)
                             ).construct_graph({"r": ref_seq}, vcf)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    mapper = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64))
    return g, haps, mapper, sites


def _simulated_reads(haps, rng, n=300, L=120):
    reads = []
    T = len(haps.text)
    for i in range(n):
        s = int(rng.integers(0, T - L))
        c = haps.text[s : s + L]
        reads.append(Read(name=f"r{i}", sequence=dna.decode(c),
                          quality=""))
    return reads


def test_mcmc_recovers_het_genotypes_and_phase(het_setup):
    g, haps, mapper, sites = het_setup
    rng = np.random.default_rng(9)
    alns = mapper.map_batch(_simulated_reads(haps, rng))
    mc = MCMCGenotyper(g, params=MCMCParams(n_iter=120, seed=3))
    assert len(mc.sites) >= len(sites)
    h1, h2, logp = mc.run(alns)
    informative = 0
    het = 0
    for si, site in enumerate(mc.sites):
        if len(site.alleles) < 2:
            continue
        informative += 1
        if h1[si] != h2[si]:
            het += 1
    assert informative >= len(sites)
    # every SNP site is het in truth; demand most recovered
    assert het >= 0.8 * len(sites), (het, informative)


def test_mcmc_embeds_two_haplotype_paths(het_setup):
    g, haps, mapper, sites = het_setup
    rng = np.random.default_rng(10)
    alns = mapper.map_batch(_simulated_reads(haps, rng, n=200))
    mc = MCMCGenotyper(g)
    h1, h2, _ = mc.run(alns)
    g2 = mc.embed_haplotypes(h1, h2, sample="PH")
    names = [m.name for m in g2.path_meta]
    assert "PH_0" in names and "PH_1" in names
    # embedded walks must be connected paths in the graph
    errs = g2.validate()
    assert not errs, errs[:3]
