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


def test_sharded_text_matches_replicated(fixture_batch):
    """Text sharded over a 'text' mesh axis must reproduce the
    replicated-text step bitwise: every candidate is scored exactly once
    on the shard owning its window (VERDICT r2 item 3)."""
    from vg_tpu.parallel.mesh import sharded_text_paired_step
    import jax
    from jax.sharding import Mesh

    haps, mate1, mate2 = fixture_batch
    out_repl = _run(haps, mate1, mate2, 1)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "text"))
    out_sh = [np.asarray(o) for o in sharded_text_paired_step(
        mesh, haps.text, mate1, mate2, mu=900.0, sd=80.0)]
    names = ["s1", "s2", "j1", "j2", "mq1", "mq2", "use_pair", "frags",
             "mm1", "mm2", "bits1", "bits2", "stats", "cov"]
    for a, b, nm in zip(out_repl, out_sh, names):
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4,
                                       err_msg=nm)
        else:
            np.testing.assert_array_equal(a, b, err_msg=nm)


def test_sharded_text_int64_coordinates():
    """Candidate localization handles global coordinates beyond int32:
    per-shard coordinates stay small, owners and the saturated basediff
    table keep fragment math exact (the 2.1 Gbp ceiling lift)."""
    from vg_tpu.parallel.mesh import localize_candidates, split_text_shards

    own = 700_000_000          # 8 shards x 0.7 Gbp = 5.6 Gbp virtual text
    D, halo = 8, 200
    start = np.array([[5_000_000_123, 2_100_000_050]], np.int64)
    lo = np.array([[4_900_000_000, 2_100_000_000]], np.int64)
    hi = np.array([[5_600_000_000, 2_800_000_000]], np.int64)
    rev = np.zeros((1, 2), bool)
    valid = np.ones((1, 2), bool)
    rp = np.full((1, 2), -1, np.int32)
    ro = np.zeros((1, 2), np.int32)
    sl, ow, lo_l, hi_l, hap, rv, vd, rp2, ro2 = localize_candidates(
        (start, lo, hi, rev, valid, rp, ro), own, D, halo)
    assert ow.tolist() == [[7, 3]]
    assert sl.tolist() == [[5_000_000_123 - 7 * own,
                            2_100_000_050 - 3 * own]]
    assert (sl >= 0).all() and (sl < own + halo).all()
    assert hap.tolist() == [[1, 0]]   # dense haplotype ids from lo
    # basediff saturation: distances beyond +-2^30 clamp, near stays exact
    bases = np.arange(D, dtype=np.int64) * own
    bd = np.clip(bases[None, :] - bases[:, None], -(2**30), 2**30)
    assert bd[3, 3] == 0 and bd[0, 7] == 2**30   # saturated far pair
    assert bd.dtype == np.int64 and np.abs(bd).max() <= 2**30


def test_sharded_rescue_from_production_state(fixture_batch):
    """Mate rescue on the sharded text (VERDICT r3 item 7): drive the
    PRODUCTION rescue path (_rescue_begin seed-scans the fragment window
    and builds candidate tables) with one mate's candidates wiped so
    rescue actually fires, then score those candidates on a 2x4
    (data, text) mesh — bitwise equal to the host/native scorer."""
    import jax
    from jax.sharding import Mesh

    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper
    from vg_tpu.parallel.mesh import sharded_rescue_scores
    from vg_tpu.io.fastq import Read
    from vg_tpu.utils import dna

    haps, _m1, _m2 = fixture_batch
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=16))
    pm = PairedGiraffeMapper(m)
    for _ in range(64):
        pm.fragdist.add(420.0)
    pm.fragdist.finalize()
    rng = np.random.default_rng(3)
    pairs = []
    for i in range(16):
        s = int(rng.integers(0, haps.total_len - 500))
        c1 = haps.text[s : s + 100].copy()
        c2 = haps.text[s + 300 : s + 400].copy()
        pairs.append((Read(f"a{i}", dna.decode(c1), None),
                      Read(f"b{i}", dna.decode(dna.revcomp_codes(c2)),
                           None)))
    sb1, sb2 = pm.score_pairs(pairs)
    _ = sb1.scores, sb2.scores
    # wipe mate2's candidates so every pair needs rescue
    sb2.cand_valid[:] = False
    state = pm._rescue_begin(sb1, sb2)
    assert state is not None, "rescue did not fire"
    todo, r_start, r_lo, r_hi, r_rev, r_valid, scores_host = state
    assert len(todo) == 16 and r_valid.any()
    scores_host = np.asarray(scores_host)

    # oriented needy reads, exactly as _score_rescues_host packs them
    B = m.params.band_radius
    Lmax = max(len(c) for c in sb2.codes)
    reads = np.full((16, Lmax), 5, np.uint8)
    rlen = np.zeros(16, np.int32)
    row_rev = r_rev.any(axis=1)
    for i in range(16):
        c = sb2.codes_rc[i] if row_rev[i] else sb2.codes[i]
        reads[i, : len(c)] = c
        rlen[i] = len(c)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "text"))
    s_sh = np.asarray(sharded_rescue_scores(
        mesh, haps.text, reads, rlen, r_start, r_lo, r_hi, r_valid,
        band_radius=B, match=m.params.match, mismatch=m.params.mismatch,
        gap_open=m.params.gap_open, gap_extend=m.params.gap_extend,
        bonus=m.params.full_length_bonus))
    np.testing.assert_array_equal(
        np.where(r_valid, s_sh, -1), np.where(r_valid, scores_host, -1))
    # the rescues must actually succeed (positive scores for real mates)
    assert (s_sh[r_valid] > 0).any()
