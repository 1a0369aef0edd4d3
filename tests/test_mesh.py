"""Multi-device mesh tests on the virtual 8-device CPU mesh.

The full paired mapping step (DP scores -> pair selection -> MAPQ ->
fragment-stats reduction -> coverage psum) must produce the same output
on 8 devices as on 1 (SURVEY.md §2.3: data-parallel reads, replicated
index, psum merges)."""
import numpy as np
import pytest

from vg_tpu.construct.constructor import Constructor, ConstructorParams
from vg_tpu.index.haplotypes import thread_haplotypes
from vg_tpu.index.minimizer import MinimizerIndex
from vg_tpu.io.fasta import read_fasta
from vg_tpu.io.fastq import iter_fastq_paired
from vg_tpu.io.vcf import read_vcf
from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
from vg_tpu.parallel.mesh import make_mesh, sharded_paired_step


@pytest.fixture(scope="module")
def fixture_batch(ref_test_dir):
    """Real fixture reads seeded through the production seeding stage."""
    ref = read_fasta(str(ref_test_dir / "small" / "x.fa"))
    vcf = read_vcf(str(ref_test_dir / "small" / "x.vcf.gz"))
    g, results = Constructor(
        ConstructorParams(max_node_size=1000)).construct_graph(ref, vcf)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64))
    pairs = list(iter_fastq_paired(
        str(ref_test_dir / "small" / "x.fa_1.fastq"),
        str(ref_test_dir / "small" / "x.fa_2.fastq")))[:64]

    from vg_tpu.utils import dna

    def encode(reads):
        L = max(len(r.sequence) for r in reads)
        codes = np.full((len(reads), L), 5, np.uint8)
        rc = np.full((len(reads), L), 5, np.uint8)
        rlen = np.zeros(len(reads), np.int32)
        c2d = np.stack([dna.encode(r.sequence) for r in reads])
        cand = m._seed_batch(c2d)
        for i, r in enumerate(reads):
            c = dna.encode(r.sequence)
            codes[i, : len(c)] = c
            rc[i, : len(c)] = dna.revcomp_codes(c)
            rlen[i] = len(c)
        return (codes, rc, rlen,
                (cand[0], cand[1], cand[2], cand[3], cand[4],
                 cand[5], cand[6].astype(np.int32)))

    mate1 = encode([a for a, _ in pairs])
    mate2 = encode([b for _, b in pairs])
    return haps, mate1, mate2


def _run(haps, mate1, mate2, n_dev):
    import jax

    mesh = make_mesh(n_dev)
    out = sharded_paired_step(mesh, haps.text, mate1, mate2,
                              mu=900.0, sd=80.0)
    return [np.asarray(o) for o in out]


def test_full_step_8dev_equals_1dev(fixture_batch):
    haps, mate1, mate2 = fixture_batch
    out1 = _run(haps, mate1, mate2, 1)
    out8 = _run(haps, mate1, mate2, 8)
    names = ["s1", "s2", "j1", "j2", "mq1", "mq2", "use_pair", "frags",
             "mm1", "mm2", "bits1", "bits2", "stats", "cov"]
    for a, b, nm in zip(out1, out8, names):
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4,
                                       err_msg=nm)
        else:
            np.testing.assert_array_equal(a, b, err_msg=nm)


def test_full_step_matches_host_pairing(fixture_batch):
    """The device pair selection must agree with the host pipeline's
    pairing decisions on the same candidates."""
    haps, mate1, mate2 = fixture_batch
    out = _run(haps, mate1, mate2, 8)
    (s1, s2, j1, j2, mq1, mq2, use_pair, frags,
     mm1, mm2, bits1, bits2, stats, cov) = out
    # fragment stats must describe the x fixture's ~900bp fragments
    n, s, ss = stats
    assert n >= 32, n
    mean = s / n
    assert 700 < mean < 1100, mean
    # coverage psum counts every mapped end exactly once
    assert cov.sum() == (s1.max(1) > 0).sum() + (s2.max(1) > 0).sum()
    # most pairs should be proper with sane MAPQs
    assert use_pair.mean() > 0.8
    assert (mq1 >= 0).all() and (mq1 <= 60).all()
