"""Device-seeding kernel parity vs the host implementations."""
import numpy as np
import pytest

from vg_tpu.index.minimizer import MinimizerIndex, extract_minimizers
from vg_tpu.ops import devseed
from vg_tpu.utils import dna


def _wang_ref(x: int) -> int:
    M = (1 << 64) - 1
    x = ((~x) + (x << 21)) & M
    x ^= x >> 24
    x = (x + (x << 3) + (x << 8)) & M
    x ^= x >> 14
    x = (x + (x << 2) + (x << 4)) & M
    x ^= x >> 28
    x = (x + (x << 31)) & M
    return x


def test_wang_hash64_pairs():
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 1 << 63, 64, dtype=np.uint64)
    hi = (xs >> np.uint64(32)).astype(np.uint32)
    lo = (xs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    import jax.numpy as jnp

    gh, gl = devseed.wang_hash64(jnp.asarray(hi), jnp.asarray(lo))
    got = (np.asarray(gh).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(gl).astype(np.uint64)
    want = np.array([_wang_ref(int(x)) for x in xs], np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k,w", [(29, 11), (21, 9), (15, 5)])
def test_rolling_minimizers_matches_host(k, w):
    rng = np.random.default_rng(3)
    R, L = 8, 150
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    codes[2, 40] = 4          # an N breaks windows
    codes[5, 10:20] = 4
    # pad like prepare_light does: windows must NOT extend into the pad
    pad = np.full((R, L + 10), 5, np.uint8)
    pad[:, :L] = codes
    rlen = np.full(R, L, np.int32)
    kh, kl, cr, chosen, valid = (np.asarray(a) for a in
                                 devseed.rolling_minimizers(pad, rlen,
                                                            k, w))
    for r in range(R):
        offs, keys, canon = extract_minimizers(codes[r], k, w)
        got_pos = np.nonzero(chosen[r])[0]
        np.testing.assert_array_equal(got_pos, offs), r
        got_keys = (kh[r, offs].astype(np.uint64) << np.uint64(32)) \
            | kl[r, offs].astype(np.uint64)
        np.testing.assert_array_equal(got_keys, keys.astype(np.uint64))
        np.testing.assert_array_equal(cr[r, offs], canon)


def test_lookup_ranges2_matches_host():
    rng = np.random.default_rng(5)
    ref = dna.decode(rng.integers(0, 4, 40000).astype(np.uint8))

    from vg_tpu.construct.constructor import Constructor, ConstructorParams
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.io.vcf import VcfFile

    g, results = Constructor(ConstructorParams(max_node_size=64)
                             ).construct_graph({"r": ref},
                                               VcfFile(samples=[],
                                                       records=[]))
    haps = thread_haplotypes(g, results, VcfFile(samples=[], records=[]))
    idx = MinimizerIndex.build(haps)
    ih, il = devseed.split_keys(idx.keys)
    import jax.numpy as jnp

    q = rng.integers(0, 30000, 500).astype(np.int64)
    codes = haps.text[:31000]
    offs, keys, canon = extract_minimizers(codes, idx.k, idx.w)
    queries = np.concatenate([keys[:300],
                              rng.integers(0, 1 << 58, 200,
                                           dtype=np.uint64)])
    qh, ql = devseed.split_keys(queries)
    gs, ge = devseed.lookup_ranges2(
        jnp.asarray(qh), jnp.asarray(ql), jnp.asarray(ih),
        jnp.asarray(il), jnp.asarray(idx.offsets.astype(np.int32)))
    ws, we = idx.lookup_ranges(queries)
    np.testing.assert_array_equal(np.asarray(gs), ws.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(ge), we.astype(np.int32))


def test_seed_candidates_dev_matches_host():
    """Full device seeding (lookup -> soft caps -> clustering -> top-C)
    must produce the host _seed_batch's candidate tables exactly on
    in-budget data."""
    import sys

    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams

    rng = np.random.default_rng(11)
    g, results, vcf = bench.make_pangenome(rng, ref_len=150_000)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=128))
    reads = bench.simulate_reads(rng, haps, 128)
    codes2d = np.stack([dna.encode(r.sequence) for r in reads])
    R, L = codes2d.shape

    want = m._seed_batch(codes2d)
    w_start, w_lo, w_hi, w_rev, w_valid = want[:5]

    p = m.params
    kh, kl, cr, chosen, valid = devseed.rolling_minimizers(
        codes2d, np.full(R, L, np.int32), idx.k, idx.w)
    ih, il = devseed.split_keys(idx.keys)
    gs, gr, gv = devseed.seed_candidates_dev(
        kh, kl, cr, chosen, valid,
        jnp.full(R, L, jnp.int32),
        jnp.asarray(ih), jnp.asarray(il),
        jnp.asarray(idx.offsets.astype(np.int32)),
        jnp.asarray(idx.pos_text.astype(np.int32)),
        jnp.asarray(idx.pos_rev.astype(np.uint8)),
        jnp.asarray(m._score_table()),
        k=idx.k, hit_cap=p.hit_cap, hard_hit_cap=p.hard_hit_cap,
        score_fraction=p.score_fraction,
        max_candidates=p.max_candidates, band_radius=p.band_radius)
    gs, gr, gv = np.asarray(gs), np.asarray(gr), np.asarray(gv)
    np.testing.assert_array_equal(gv, w_valid)
    np.testing.assert_array_equal(gs[w_valid], w_start[w_valid])
    np.testing.assert_array_equal(gr[w_valid], w_rev[w_valid])


def test_device_seeded_pipeline_byte_parity():
    """The fully-fused device-seeded paired dispatch must emit
    byte-identical GAM records to the host-seeded path."""
    import sys

    sys.path.insert(0, ".")
    import bench
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams
    from vg_tpu.map.paired import PairedGiraffeMapper

    rng = np.random.default_rng(7)
    g, results, vcf = bench.make_pangenome(rng, ref_len=120_000)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    bs = 256
    pairs = bench.simulate_pairs(rng, haps, bs * 2)

    def run(devseed):
        m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=bs,
                                                   device_seed=devseed))
        pm = PairedGiraffeMapper(m)
        pm.map_pairs(pairs[:bs])
        pm.finish()
        item = pm.stage_rescue(pm.stage_score(pairs[bs:]))
        return pm.stage_emit(item)

    a = run(True)
    b = run(False)
    assert len(a) == len(b) == 2 * bs
    same = sum(1 for x, y in zip(a, b) if bytes(x) == bytes(y))
    assert same == len(a), f"{same}/{len(a)}"


def test_device_seeded_single_end_byte_parity():
    """The fused single-end device-seeded dispatch must emit
    byte-identical GAM records to the host-seeded packed path."""
    import sys

    sys.path.insert(0, ".")
    import bench
    from vg_tpu.index.haplotypes import thread_haplotypes
    from vg_tpu.map.giraffe import GiraffeMapper, GiraffeParams

    rng = np.random.default_rng(13)
    g, results, vcf = bench.make_pangenome(rng, ref_len=120_000)
    haps = thread_haplotypes(g, results, vcf)
    idx = MinimizerIndex.build(haps)
    reads = bench.simulate_reads(rng, haps, 256)

    def run(devseed):
        m = GiraffeMapper(haps, idx, GiraffeParams(batch_reads=256,
                                                   device_seed=devseed))
        sb = m.score_reads_packed(reads)
        recs = m.emit_batch_encoded(sb)
        if recs is None:
            recs = [a.encode() for a in m.emit_batch(sb)]
        return recs

    a = run(True)
    b = run(False)
    assert len(a) == len(b) == 256
    same = sum(1 for x, y in zip(a, b) if bytes(x) == bytes(y))
    assert same == len(a), f"{same}/{len(a)}"
