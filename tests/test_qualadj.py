"""Quality-adjusted scoring (QualAdjAligner role) + MAPQ explored cap."""
import numpy as np
import pytest

from vg_tpu.ops.qualadj import (parse_quality, qual_tables,
                                recover_log_base)


def test_log_base_recovery():
    """lambda satisfies sum f_i f_j exp(lambda S_ij) == 1."""
    lam = recover_log_base(1, 4)
    f = np.full(4, 0.25)
    S = np.full((4, 4), -4.0)
    np.fill_diagonal(S, 1.0)
    total = (np.outer(f, f) * np.exp(lam * S)).sum()
    assert abs(total - 1.0) < 1e-9
    assert 1.3 < lam < 1.45     # known value for 1/-4 at gc 0.5


def test_qual_tables_shape_and_limits():
    mt, mm, bq = qual_tables(1, 4, 5)
    # below the lowest meaningful quality everything scores 0
    assert mt[0] == mm[0] == 0 and mt[1] == mm[1] == 0
    # at high quality the adjusted scores converge to the originals
    assert mt[60] == 1
    assert mm[60] == -4
    assert bq[60] == 5
    # mismatch penalty shrinks monotonically as quality drops
    assert all(mm[q] >= mm[q + 1] for q in range(2, 60))
    # a q=10 mismatch costs less than a q=40 mismatch
    assert mm[10] > mm[40]


def test_banded_scores_qual_low_quality_mismatch():
    """A mismatch on a low-quality base is cheap; on a high-quality base
    it costs the full penalty."""
    import jax.numpy as jnp

    from vg_tpu.ops.align import banded_scores, banded_scores_qual

    rng = np.random.default_rng(0)
    T = 2000
    text = rng.integers(0, 4, T).astype(np.uint8)
    L = 50
    s0 = 600
    read = text[s0 : s0 + L].copy()
    read[25] = (read[25] + 1) % 4          # one mismatch mid-read
    comp = np.array([3, 2, 1, 0, 4, 5], np.uint8)
    rc = comp[read][::-1].copy()
    reads = read[None, :]
    reads_rc = rc[None, :]
    rlen = np.array([L], np.int32)
    cs = np.array([[s0 - 16]], np.int32)
    lo = np.zeros((1, 1), np.int32)
    hi = np.full((1, 1), T, np.int32)
    rev = np.zeros((1, 1), bool)
    val = np.ones((1, 1), bool)
    mt, mm, bq = qual_tables(1, 4, 5)

    def run(q_at_mismatch):
        q = np.full((1, L), 60, np.uint8)
        q[0, 25] = q_at_mismatch
        return int(np.asarray(banded_scores_qual(
            jnp.asarray(text), reads, reads_rc, q, rlen,
            cs, lo, hi, rev, val,
            jnp.asarray(mt), jnp.asarray(mm), jnp.asarray(bq))))

    base = int(np.asarray(banded_scores(
        jnp.asarray(text), reads, reads_rc, rlen, cs, lo, hi, rev, val)))
    hi_q = run(60)
    lo_q = run(3)
    assert hi_q == base            # all q60 == unadjusted scores
    assert lo_q > hi_q             # cheap mismatch on the low-q base
    # perfect read at q60 matches the unadjusted perfect score
    reads_p = text[s0 : s0 + L][None, :]
    rc_p = comp[reads_p[0]][::-1][None, :]
    qp = np.full((1, L), 60, np.uint8)
    perfect = int(np.asarray(banded_scores_qual(
        jnp.asarray(text), reads_p, rc_p, qp, rlen, cs, lo, hi, rev, val,
        jnp.asarray(mt), jnp.asarray(mm), jnp.asarray(bq))))
    assert perfect == L + 2 * 5


def test_explored_cap_low_quality_read_capped():
    """faster_cap: all-minimizer disruption is cheap when the bases are
    low quality, so the cap collapses; high-quality reads stay uncapped
    in practice."""
    from vg_tpu.map.mapqcap import explored_cap

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 100).astype(np.uint8)
    k, w = 11, 5
    hi_cap = explored_cap(codes, np.full(100, 50, np.uint8), k, w)
    lo_cap = explored_cap(codes, np.full(100, 5, np.uint8), k, w)
    assert np.isfinite(hi_cap) and np.isfinite(lo_cap)
    assert lo_cap < hi_cap
    assert lo_cap < 60          # q5 everywhere: the cap binds below max
    assert hi_cap > 60          # q50 everywhere: cap never binds
    # no qualities -> infinite cap (reference faster_cap contract)
    assert explored_cap(codes, None, k, w) == float("inf")
    assert explored_cap(codes, np.zeros(0, np.uint8), k, w) == float("inf")


def test_mapq_cap_applied_end_to_end():
    """A mapped read whose bases are all low quality gets its MAPQ capped
    (reference minimizer_mapper.cpp:1161-1172)."""
    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.index.minimizer import MinimizerIndex
    from vg_tpu.io.fastq import Read
    from vg_tpu.io.vcf import VcfFile
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.utils import dna

    rng = np.random.default_rng(2)
    ref = dna.decode(rng.integers(0, 4, 60000).astype(np.uint8))
    g, results = Constructor(ConstructorParams(max_node_size=64)
                             ).construct_graph(
        {"r": ref}, VcfFile(samples=[], records=[]))
    haps = thread_haplotypes(g, results, VcfFile(samples=[], records=[]))
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=64))
    seq = ref[10000:10150]
    hi_q = Read("hi", seq, "I" * 150)       # q40
    lo_q = Read("lo", seq, "&" * 150)       # q5
    a_hi, a_lo = m.map_batch([hi_q, lo_q])
    assert a_hi.path.mappings and a_lo.path.mappings
    assert a_hi.mapping_quality == 60
    assert a_lo.mapping_quality < 30
