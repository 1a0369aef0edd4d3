"""Device-mesh sharding for the mapping pipeline.

The reference parallelizes with OpenMP threads over read batches
(vg::io::for_each_parallel, reference src/subcommand/giraffe_main.cpp:2369)
and merges coverage with binned mutexes (src/packer.hpp:119-156). The
TPU-native equivalent (SURVEY.md §2.3): reads are data-parallel across the
mesh, the haplotype text / minimizer arrays are replicated in HBM, and
reductions (pack coverage, fragment-length stats) ride ICI as psums.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import align as align_ops


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_map_step(mesh: Mesh, text, reads, reads_rc, rlen,
                     cand_start, cand_lo, cand_hi, cand_rev, cand_valid,
                     band_radius: int = 16):
    """One data-parallel mapping step over the mesh.

    Scores every (read, candidate) with the banded DP (reads sharded on the
    data axis, text replicated), then reduces a per-shard text-coverage
    histogram with a psum — the same collective pattern the pack stage uses
    to merge coverage across shards.

    Returns (scores, coverage): scores (R, C) sharded like the reads,
    coverage (buckets,) fully replicated (already psummed).
    """
    axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P(axis))

    text = jax.device_put(text, repl)
    reads = jax.device_put(reads, shard0)
    reads_rc = jax.device_put(reads_rc, shard0)
    rlen = jax.device_put(rlen, shard0)
    cands = [jax.device_put(a, shard0)
             for a in (cand_start, cand_lo, cand_hi, cand_rev, cand_valid)]
    cand_start, cand_lo, cand_hi, cand_rev, cand_valid = cands

    n_buckets = 1024

    @jax.jit
    def step(text, reads, reads_rc, rlen, cand_start, cand_lo, cand_hi,
             cand_rev, cand_valid):
        scores = align_ops.banded_scores(
            text, reads, reads_rc, rlen, cand_start, cand_lo, cand_hi,
            cand_rev, cand_valid, band_radius=band_radius)
        # winner text bucket per read -> coverage histogram (pack-style
        # scatter_add); XLA inserts the cross-shard reduction because the
        # output is unsharded while inputs are data-sharded
        best = jnp.argmax(scores, axis=1)
        best_score = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
        start = jnp.take_along_axis(cand_start, best[:, None], axis=1)[:, 0]
        bucket = jnp.clip(start // jnp.maximum(text.shape[0] // n_buckets, 1),
                          0, n_buckets - 1)
        cov = jnp.zeros((n_buckets,), jnp.int32).at[bucket].add(
            (best_score > 0).astype(jnp.int32))
        return scores, cov

    out_shardings = (shard0, repl)
    step_sharded = jax.jit(step.__wrapped__, out_shardings=out_shardings)
    with mesh:
        return step_sharded(text, reads, reads_rc, rlen, cand_start,
                            cand_lo, cand_hi, cand_rev, cand_valid)


def winner_mismatch_bits(text, text_len, text_packed, B,
                         reads, reads_rc, rlen, start, lo_a, hi_a, rev_a,
                         j):
    """Mismatch bitmap of the chosen winner's gapless alignment at its
    seed diagonal, computed where the text already lives (HBM) so the
    host emit path never re-gathers R x RL text windows. Bit k of word
    w = mismatch at read column w*32+k."""
    import jax.numpy as jnp

    RL = reads.shape[1]
    W = (RL + 31) // 32
    T = text_len if text_len is not None else text.shape[0]
    take = lambda a: jnp.take_along_axis(a, j[:, None], 1)[:, 0]
    diag = take(start).astype(jnp.int32) + B
    lo_w = take(lo_a)
    hi_w = take(hi_a)
    rev_w = take(rev_a).astype(bool)
    pos = diag[:, None] + jnp.arange(RL, dtype=jnp.int32)
    okm = ((pos >= lo_w[:, None]) & (pos < hi_w[:, None])
           & (pos >= 0) & (pos < T))
    if text_packed:
        # 4-bit packed text (pallas_align.pack_text): base at p is
        # nibble p%8 of int32 word p//8. Gather at WORD granularity in
        # row-major (R, NW) form — an (R, RL) per-base gather costs 8x
        # the elements and each element-gather is ~tens of ns on TPU
        # (measured ~60 ms/step at R=8192); nibble expansion and the
        # 0..7-base misalignment are vectorized instead (same trick as
        # banded_scores_packed, here along rows).
        from jax import lax

        R = reads.shape[0]
        NW = (RL + 7) // 8 + 1
        w0 = diag >> 3
        widx = w0[:, None] + jnp.arange(NW, dtype=jnp.int32)[None, :]
        words = text[jnp.clip(widx, 0, text.shape[0] - 1)]   # (R, NW)
        rep = jnp.repeat(words, 8, axis=1)                   # (R, NW*8)
        shifts = ((jnp.arange(NW * 8, dtype=jnp.uint32) % 8) * 4)[None, :]
        bases = ((rep.astype(jnp.uint32) >> shifts)
                 & jnp.uint32(15)).astype(jnp.uint8)   # text[w0*8 + i]
        mis = (diag & 7)                               # 0..7 base offset
        base = jnp.zeros((R, RL), jnp.uint8)
        for off in range(8):
            base = jnp.where((mis == off)[:, None],
                             lax.slice(bases, (0, off), (R, off + RL)),
                             base)
        tw = jnp.where(okm, base, jnp.uint8(align_ops.SENTINEL))
    else:
        tw = jnp.where(okm, text[jnp.clip(pos, 0, text.shape[0] - 1)],
                       jnp.uint8(align_ops.SENTINEL))
    oriented = jnp.where(rev_w[:, None], reads_rc, reads)
    inread = jnp.arange(RL)[None, :] < rlen[:, None]
    msk = ((tw != oriented) | (oriented >= 4)) & inread
    mm = msk.sum(axis=1).astype(jnp.int32)
    padded = jnp.pad(msk, ((0, 0), (0, W * 32 - RL)))
    words = (padded.reshape(-1, W, 32).astype(jnp.uint32)
             << jnp.arange(32, dtype=jnp.uint32)[None, None, :]
             ).sum(axis=2, dtype=jnp.uint32)
    return mm, words.astype(jnp.int32)


def derive_candidate_meta(diag, hb, stp, steps, node_len, nrp, nro):
    """Per-candidate (lo, hi, refpath, refoff) derived ON DEVICE from the
    seed diagonal text position and resident index arrays — so the host
    uploads only (start, rev|valid) per candidate. Mirrors the host
    formula (GiraffeMapper._diag_refproj)."""
    import jax.numpy as jnp

    hap = jnp.clip(jnp.searchsorted(hb, diag, side="right") - 1,
                   0, hb.shape[0] - 2)
    lo = hb[hap]
    hi = hb[hap + 1]
    si = jnp.clip(jnp.searchsorted(stp, diag, side="right") - 1,
                  0, steps.shape[0] - 1)
    h = steps[si]
    nidx = h >> 1
    off_visit = diag - stp[si]
    fwd_off = jnp.where((h & 1).astype(bool),
                        node_len[nidx] - off_visit, off_visit)
    return lo, hi, nrp[nidx], nro[nidx] + fwd_off


# ------------------------------------------------------- full paired step

def _top2_T(smT, NEGF):
    """Candidate-major _top2: (max, second-max) along axis 0 of (C, R)."""
    t0 = smT.max(axis=0)
    am = jnp.argmax(smT, axis=0)
    masked = jnp.where(jnp.arange(smT.shape[0])[:, None] == am[None, :],
                       NEGF, smT)
    return t0, masked.max(axis=0)


def _distinct_mask_T(scoresT, revT, rpT, roT, validT, tol):
    """_distinct_mask in candidate-major layout: inputs (C, R), dup mask
    over (C_i, C_j, R) with the R batch axis on the lanes (C=8 row-major
    would pad 8 -> 128 lanes, 16x memory/compute waste). Index mapping:
    axis0 = the candidate being tested (i), axis1 = the competitor (j)."""
    C = scoresT.shape[0]
    same = ((revT[:, None, :] == revT[None, :, :])
            & (rpT[:, None, :] >= 0)
            & (rpT[:, None, :] == rpT[None, :, :])
            & (jnp.abs(roT[:, None, :] - roT[None, :, :]) <= tol))
    idx = jnp.arange(C)
    better = (scoresT[None, :, :] > scoresT[:, None, :]) | (
        (scoresT[None, :, :] == scoresT[:, None, :])
        & (idx[None, :, None] < idx[:, None, None]))
    dup = (same & better & validT[None, :, :]).any(axis=1)
    return ~dup


def _pair_core_T(f1T, f2T, vd1T, vd2T, fragT, properT, rl1, rl2, mu, sd,
                 lam, unpaired_penalty, max_mapq, max_fragment_length):
    """Pair selection + MAPQ + fragment statistics, candidate-major.

    All (C, C, R) / (C, R) intermediates keep the batch axis on the
    128-lane minor dim (the row-major form padded C=8 to 128 lanes;
    measured ~20 ms of a 6144-pair step on v5e). Shared by the
    replicated and text-sharded paired steps so their selection stays
    bit-identical by construction. Tie-breaking matches the row-major
    form exactly: flat combo index i*C+j, argmax takes the first max."""
    NEGF = jnp.float32(-1e30)
    C = f1T.shape[0]
    ll = (-((fragT - mu) ** 2) / (2 * sd * sd)
          - jnp.log(sd * jnp.sqrt(2 * jnp.pi)))
    pair_scaled = jnp.where(
        properT, lam * (f1T[:, None, :] + f2T[None, :, :]) + ll, NEGF)
    flat = pair_scaled.reshape(C * C, -1)      # major-dim merge: free
    best_combo = jnp.argmax(flat, axis=0)
    best_pair = flat.max(axis=0)
    j1p = best_combo // C
    j2p = best_combo % C

    m1 = jnp.where(vd1T, f1T, NEGF)
    m2 = jnp.where(vd2T, f2T, NEGF)
    b1 = jnp.argmax(m1, axis=0)
    b2 = jnp.argmax(m2, axis=0)
    s1b = jnp.where(vd1T.any(0), m1.max(axis=0), 0.0)
    s2b = jnp.where(vd2T.any(0), m2.max(axis=0), 0.0)
    indep = lam * (s1b + s2b) - lam * unpaired_penalty
    use_pair = (best_pair > NEGF / 2) & (best_pair >= indep)

    # pair MAPQ: logsumexp over proper combos
    lsep = best_pair + jnp.log(jnp.sum(
        jnp.exp(jnp.where(flat > NEGF / 2,
                          flat - best_pair[None, :], NEGF)), axis=0))
    deltap = best_pair - lsep
    one_minus = jnp.where(deltap < -1e-12,
                          jnp.log1p(-jnp.exp(jnp.minimum(deltap, -1e-12))),
                          -50.0)
    mq_pair = jnp.clip(-10.0 / jnp.log(10.0) * one_minus, 0, max_mapq)

    def end_mapq(fT, vdT, chosen):
        sc = jnp.where(vdT, fT * lam, NEGF)
        mx = sc.max(axis=0)
        lse = mx + jnp.log(jnp.exp(sc - mx[None, :]).sum(axis=0))
        oh = jnp.arange(C)[:, None] == chosen[None, :]
        ch = jnp.where(oh, fT, 0).sum(axis=0) * lam
        delta = ch - lse
        om = jnp.where(delta < -1e-12,
                       jnp.log1p(-jnp.exp(jnp.minimum(delta, -1e-12))),
                       -50.0)
        return jnp.clip(-10.0 / jnp.log(10.0) * om, 0, max_mapq)

    j1 = jnp.where(use_pair, j1p, b1)
    j2 = jnp.where(use_pair, j2p, b2)
    mq1s = end_mapq(f1T, vd1T, j1)
    mq2s = end_mapq(f2T, vd2T, j2)
    mq1 = jnp.where(use_pair, jnp.minimum(mq_pair, mq1s + 25), mq1s)
    mq2 = jnp.where(use_pair, jnp.minimum(mq_pair, mq2s + 25), mq2s)
    ohc = jnp.arange(C * C)[:, None] == best_combo[None, :]
    frags = jnp.where(ohc, fragT.reshape(C * C, -1), 0).sum(axis=0)
    frags = jnp.where(use_pair, frags, 0.0)

    # fragment statistics over confident proper pairs (warmup allgather)
    t1a, t1b = _top2_T(m1, NEGF)
    uniq1 = (s1b >= 0.8 * rl1) & ((vd1T.sum(0) <= 1) | (t1b < t1a - 5))
    t2a, t2b = _top2_T(m2, NEGF)
    uniq2 = (s2b >= 0.8 * rl2) & ((vd2T.sum(0) <= 1) | (t2b < t2a - 5))
    obs = (use_pair & uniq1 & uniq2 & (frags > 0)
           & (frags <= max_fragment_length))
    stat_n = obs.sum().astype(jnp.float32)
    stat_sum = jnp.where(obs, frags, 0.0).sum()
    stat_sumsq = jnp.where(obs, frags * frags, 0.0).sum()
    return (j1, j2, mq1, mq2, use_pair, frags,
            jnp.stack([stat_n, stat_sum, stat_sumsq]))


def make_single_step(band_radius: int = 16, match: int = 1,
                     mismatch: int = 4, gap_open: int = 6,
                     gap_extend: int = 1, bonus: int = 5,
                     max_mapq: int = 60, score_fn=None,
                     text_packed: bool = False,
                     text_len: Optional[int] = None):
    """Single-end device step: DP scores + distinct-placement dedup +
    winner + MAPQ + winner mismatch bitmaps, one dispatch (the
    jnp port of GiraffeMapper.emit_batch_encoded's host selection)."""
    from ..map.mapq import log_base

    lam = log_base(match, mismatch)
    B = band_radius

    if score_fn is None:
        def score_fn(text, reads, reads_rc, rlen, cand):
            return align_ops.banded_scores(
                text, reads, reads_rc, rlen, *cand[:5],
                band_radius=band_radius, match=match, mismatch=mismatch,
                gap_open=gap_open, gap_extend=gap_extend, bonus=bonus)

    def step(text, reads, reads_rc, rlen, cand, tol_div):
        (c_start, c_lo, c_hi, c_rev, c_valid, c_rp, c_ro) = cand
        s = score_fn(text, reads, reads_rc, rlen, cand)
        from ..map.giraffe import PLACEMENT_TOL

        # selection runs candidate-major (see _pair_core_T): (C, R)
        # intermediates keep the batch on the lanes instead of padding
        # C=8 to 128
        fT = s.T.astype(jnp.float32)
        validT = (c_valid & (s > 0)).T
        any_valid = validT.any(axis=0)
        NEGF = jnp.float32(-1e30)
        maskedT = jnp.where(validT, fT, -1.0)
        best_j = jnp.argmax(maskedT, axis=0)
        best_s = maskedT.max(axis=0)
        uniqT = _distinct_mask_T(s.T, c_rev.T, c_rp.T, c_ro.T, validT,
                                 PLACEMENT_TOL)
        sc = jnp.where(validT & uniqT, fT * lam, NEGF)
        mx = jnp.maximum(sc.max(axis=0), best_s * lam)
        lse = mx + jnp.log(jnp.exp(sc - mx[None, :]).sum(axis=0))
        delta = best_s * lam - lse
        om = jnp.where(delta < -1e-12,
                       jnp.log1p(-jnp.exp(jnp.minimum(delta, -1e-12))),
                       -50.0)
        mapq = jnp.clip(-10.0 / jnp.log(10.0) * om, 0, max_mapq)
        mapq = jnp.where(jnp.isfinite(mapq), mapq, max_mapq)
        mm, bits = winner_mismatch_bits(
            text, text_len, text_packed, B, reads, reads_rc, rlen,
            c_start, c_lo, c_hi, c_rev, best_j)
        return (s, best_j.astype(jnp.int32), mapq.astype(jnp.int32),
                any_valid, mm, bits)

    return step


def make_paired_step(band_radius: int = 16, match: int = 1,
                     mismatch: int = 4, gap_open: int = 6,
                     gap_extend: int = 1, bonus: int = 5,
                     max_fragment_length: int = 2000,
                     unpaired_penalty: float = 30.0,
                     max_mapq: int = 60, n_buckets: int = 1024,
                     score_fn=None, text_packed: bool = False,
                     text_len: Optional[int] = None):
    """Build the FULL data-parallel paired mapping step: seed-result
    candidate tables in -> per-mate DP scores, pair selection with the
    fragment model, pair/solo MAPQs, pack-style coverage psum, and the
    fragment-length statistics reduction (the warmup allgather,
    SURVEY.md §2.3 item 2) out. Everything except host seeding and GAM
    emission runs on-device; shardings make XLA insert the cross-chip
    collectives."""
    from ..map.mapq import log_base

    lam = log_base(match, mismatch)

    if score_fn is None:
        def score_fn(text, reads, reads_rc, rlen, cand):
            return align_ops.banded_scores(
                text, reads, reads_rc, rlen, *cand[:5],
                band_radius=band_radius, match=match, mismatch=mismatch,
                gap_open=gap_open, gap_extend=gap_extend, bonus=bonus)

    def step(text, r1, r1rc, rl1, c1, r2, r2rc, rl2, c2, mu, sd):
        (s1_start, s1_lo, s1_hi, s1_rev, s1_valid, s1_rp, s1_ro) = c1
        (s2_start, s2_lo, s2_hi, s2_rev, s2_valid, s2_rp, s2_ro) = c2
        s1 = score_fn(text, r1, r1rc, rl1, c1)
        s2 = score_fn(text, r2, r2rc, rl2, c2)
        B = band_radius
        from ..map.giraffe import PLACEMENT_TOL

        # selection runs candidate-major — see _pair_core_T
        f1T = s1.T.astype(jnp.float32)
        f2T = s2.T.astype(jnp.float32)
        v1T = (s1_valid & (s1 > 0)).T
        v2T = (s2_valid & (s2 > 0)).T
        vd1T = v1T & _distinct_mask_T(s1.T, s1_rev.T, s1_rp.T, s1_ro.T,
                                      v1T, PLACEMENT_TOL)
        vd2T = v2T & _distinct_mask_T(s2.T, s2_rev.T, s2_rp.T, s2_ro.T,
                                      v2T, PLACEMENT_TOL)

        L1r = rl1.astype(jnp.float32)[None, None, :]
        L2r = rl2.astype(jnp.float32)[None, None, :]
        d1T = (s1_start + B).astype(jnp.float32).T
        d2T = (s2_start + B).astype(jnp.float32).T
        rev1T = s1_rev.T
        rev2T = s2_rev.T
        ffT = (d2T[None, :, :] + L2r) - d1T[:, None, :]
        frT = (d1T[:, None, :] + L1r) - d2T[None, :, :]
        frag_txtT = jnp.where(rev1T[:, None, :], frT, ffT)
        same_copyT = s1_lo.T[:, None, :] == s2_lo.T[None, :, :]
        rp1T = s1_rp.T
        rp2T = s2_rp.T
        on_refT = (rp1T[:, None, :] >= 0) & (rp1T[:, None, :]
                                             == rp2T[None, :, :])
        ro1T = s1_ro.astype(jnp.float32).T
        ro2T = s2_ro.astype(jnp.float32).T
        rffT = (ro2T[None, :, :] + L2r) - ro1T[:, None, :]
        rfrT = (ro1T[:, None, :] + L1r) - ro2T[None, :, :]
        frag_refT = jnp.where(rev1T[:, None, :], rfrT, rffT)
        fragT = jnp.where(same_copyT, frag_txtT,
                          jnp.where(on_refT, frag_refT, -1.0))
        properT = ((rev1T[:, None, :] != rev2T[None, :, :])
                   & (same_copyT | on_refT)
                   & (fragT > 0) & (fragT <= max_fragment_length)
                   & vd1T[:, None, :] & vd2T[None, :, :])
        (j1, j2, mq1, mq2, use_pair, frags, stats) = _pair_core_T(
            f1T, f2T, vd1T, vd2T, fragT, properT, rl1, rl2, mu, sd,
            lam, unpaired_penalty, max_mapq, max_fragment_length)

        mm1, bits1 = winner_mismatch_bits(
            text, text_len, text_packed, B, r1, r1rc, rl1,
            s1_start, s1_lo, s1_hi, s1_rev, j1)
        mm2, bits2 = winner_mismatch_bits(
            text, text_len, text_packed, B, r2, r2rc, rl2,
            s2_start, s2_lo, s2_hi, s2_rev, j2)

        # pack-style coverage histogram over winner placements
        start1 = jnp.take_along_axis(s1_start, j1[:, None], 1)[:, 0]
        start2 = jnp.take_along_axis(s2_start, j2[:, None], 1)[:, 0]
        bsz = jnp.maximum((text_len if text_len is not None
                           else text.shape[0]) // n_buckets, 1)
        cov = jnp.zeros((n_buckets,), jnp.int32)
        cov = cov.at[jnp.clip(start1 // bsz, 0, n_buckets - 1)].add(
            vd1T.any(0).astype(jnp.int32))
        cov = cov.at[jnp.clip(start2 // bsz, 0, n_buckets - 1)].add(
            vd2T.any(0).astype(jnp.int32))
        return (s1, s2, j1, j2,
                jnp.clip(mq1, 0, max_mapq).astype(jnp.int32),
                jnp.clip(mq2, 0, max_mapq).astype(jnp.int32),
                use_pair, frags, mm1, mm2, bits1, bits2, stats, cov)

    return step


def sharded_paired_step(mesh: Mesh, text, mate1, mate2, mu, sd,
                        band_radius: int = 16, **kw):
    """Run the full paired step data-parallel over the mesh.

    mate1/mate2 = (reads, reads_rc, rlen, cand_tuple) with cand_tuple =
    (start, lo, hi, rev, valid, refpath, refoff), all batch-major. Reads
    and candidates shard over the data axis; text and the fragment model
    replicate; fragment stats and coverage come back replicated (the
    psum/allgather collectives are inserted by XLA from the shardings)."""
    axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P(axis))

    def put(reads, reads_rc, rlen, cand):
        return (jax.device_put(reads, shard0),
                jax.device_put(reads_rc, shard0),
                jax.device_put(rlen, shard0),
                tuple(jax.device_put(np.asarray(a), shard0) for a in cand))

    r1, r1rc, rl1, c1 = put(*mate1)
    r2, r2rc, rl2, c2 = put(*mate2)
    text = jax.device_put(text, repl)
    step = make_paired_step(band_radius=band_radius, **kw)
    out_shardings = (shard0,) * 12 + (repl, repl)
    fn = jax.jit(step, out_shardings=out_shardings)
    with mesh:
        return fn(text, r1, r1rc, rl1, c1, r2, r2rc, rl2, c2,
                  jnp.float32(mu), jnp.float32(sd))


# ---------------------------------------------------- sharded haplotype text

def split_text_shards(text: np.ndarray, n_shards: int, halo: int):
    """Host: split the haplotype text into contiguous shards with a
    right-side `halo` so any DP window whose start lies in a shard's
    owned range fits in its local slice. Coordinates on each shard are
    int32 regardless of total length — the replicated design's 2.1 Gbp
    global-int32 ceiling (README) becomes per-shard, so a D-way text
    axis holds up to D x 2.1 Gbp (SURVEY.md §2.3 item 6, the reference's
    `vg chunk` index-sharding answer re-expressed as a mesh axis).

    Returns (own_len, shards (D, own+halo) uint8 sentinel-padded)."""
    T = len(text)
    D = n_shards
    own = -(-T // D)
    Ls = own + halo
    shards = np.full((D, Ls), 6, np.uint8)
    for d in range(D):
        s = d * own
        e = min(T, s + Ls)
        if s < T:
            shards[d, : e - s] = text[s:e]
    return own, shards


def localize_candidates(cand, own_len: int, n_shards: int, halo: int):
    """Host: convert global candidate meta -> per-shard-local int32.

    cand = (start, lo, hi, rev, valid, rp, ro) with start/lo/hi int64-
    capable global text coordinates. Returns (start_l, owner, lo_l,
    hi_l, hap, rev, valid, rp, ro): owner = shard owning the window
    start, start_l/lo_l/hi_l local to that shard (clamped to its halo'd
    slice), hap = dense haplotype id (factorized lo) for same-copy
    pairing checks without global coordinates."""
    start, lo, hi, rev, valid, rp, ro = (np.asarray(a) for a in cand)
    start64 = start.astype(np.int64)
    owner = np.clip(start64 // own_len, 0, n_shards - 1).astype(np.int32)
    base = owner.astype(np.int64) * own_len
    Ls = own_len + halo
    start_l = (start64 - base).astype(np.int32)
    lo_l = np.clip(lo.astype(np.int64) - base, -1, Ls).astype(np.int32)
    hi_l = np.clip(hi.astype(np.int64) - base, 0, Ls).astype(np.int32)
    _, hap = np.unique(lo.astype(np.int64), return_inverse=True)
    return (start_l, owner, lo_l, hi_l,
            hap.reshape(lo.shape).astype(np.int32),
            rev, valid, rp.astype(np.int32), ro.astype(np.int32))


def make_sharded_rescue_scorer(n_text_shards: int, band_radius: int = 16,
                               match: int = 1, mismatch: int = 4,
                               gap_open: int = 6, gap_extend: int = 1,
                               bonus: int = 5):
    """Rescue-candidate scoring against a TEXT-SHARDED index (round-3
    verdict item 7: the irregular tail of the pipeline on the mesh).

    Rescue windows are candidate-sized (the host seed-scan inside the
    mate's fragment window already reduced them to diagonals,
    map/paired.py _rescue_begin), so each is scored once, on the shard
    owning its start — same owner-routing + masked-sum-psum pattern as
    the main sharded step, bit-identical to the replicated scorer.
    Reads arrive pre-ORIENTED (the rescue path orients on the host), so
    rev is passed as all-False."""
    D = n_text_shards

    def step(tshards, reads, rlen, start_l, owner, lo_l, hi_l, valid):
        d_ids = jnp.arange(D, dtype=jnp.int32)
        valid_d = valid[None] & (owner[None] == d_ids[:, None, None])
        rev = jnp.zeros_like(valid)
        sd_ = jax.vmap(
            lambda t, v: align_ops.banded_scores(
                t, reads, reads, rlen,
                jnp.where(v, start_l, 0), jnp.where(v, lo_l, 0),
                jnp.where(v, hi_l, 0), rev, v,
                band_radius=band_radius, match=match, mismatch=mismatch,
                gap_open=gap_open, gap_extend=gap_extend, bonus=bonus)
        )(tshards, valid_d)                                # (D, R, C)
        s = jnp.where(valid_d, sd_, 0).sum(axis=0)         # psum on 'text'
        return jnp.where(valid, s, -1)

    return step


def sharded_rescue_scores(mesh: Mesh, text, reads, rlen,
                          r_start, r_lo, r_hi, r_valid,
                          band_radius: int = 16, halo: Optional[int] = None,
                          **kw):
    """Score pre-oriented rescue candidates with the text sharded over
    the mesh's 'text' axis. r_start/lo/hi are GLOBAL coordinates
    (int64-capable); returns (R, C) int32 scores, -1 where invalid."""
    names = mesh.axis_names
    taxis = "text" if "text" in names else names[-1]
    Dt = mesh.shape[taxis]
    RL = reads.shape[1]
    if halo is None:
        halo = RL + 2 * band_radius + 16
    own, shards = split_text_shards(np.asarray(text), Dt, halo)
    rev = np.zeros_like(np.asarray(r_valid))
    rp = np.full(np.asarray(r_valid).shape, -1)
    ro = np.zeros(np.asarray(r_valid).shape, np.int64)
    (start_l, owner, lo_l, hi_l, _hap, _rev, valid, _rp, _ro) = \
        localize_candidates((r_start, r_lo, r_hi, rev, r_valid, rp, ro),
                            own, Dt, halo)
    tsh = NamedSharding(mesh, P(taxis, None))
    repl = NamedSharding(mesh, P())
    put = lambda a: jax.device_put(np.asarray(a), repl)
    step = make_sharded_rescue_scorer(Dt, band_radius=band_radius, **kw)
    fn = jax.jit(step, out_shardings=repl)
    with mesh:
        return fn(jax.device_put(shards, tsh), put(reads), put(rlen),
                  put(start_l), put(owner), put(lo_l), put(hi_l),
                  put(valid))


def _mismatch_bits_all(text, B, reads, reads_rc, rlen,
                       start, lo, hi, rev, valid):
    """Gapless mismatch bitmaps for EVERY candidate against one local
    text shard (winner_mismatch_bits, widened to (R, C) so the winner
    can be chosen after the cross-shard combine)."""
    R, RL = reads.shape
    C = start.shape[1]
    W = (RL + 31) // 32
    diag = start.astype(jnp.int32) + B                     # (R, C)
    pos = diag[:, :, None] + jnp.arange(RL, dtype=jnp.int32)
    okm = ((pos >= lo[:, :, None]) & (pos < hi[:, :, None])
           & (pos >= 0) & (pos < text.shape[0]))
    tw = jnp.where(okm, text[jnp.clip(pos, 0, text.shape[0] - 1)],
                   jnp.uint8(align_ops.SENTINEL))
    oriented = jnp.where(rev[:, :, None], reads_rc[:, None, :],
                         reads[:, None, :])
    inread = jnp.arange(RL)[None, None, :] < rlen[:, None, None]
    msk = ((tw != oriented) | (oriented >= 4)) & inread & valid[:, :, None]
    mm = msk.sum(axis=2).astype(jnp.int32)                 # (R, C)
    padded = jnp.pad(msk, ((0, 0), (0, 0), (0, W * 32 - RL)))
    words = (padded.reshape(R, C, W, 32).astype(jnp.uint32)
             << jnp.arange(32, dtype=jnp.uint32)[None, None, None, :]
             ).sum(axis=3, dtype=jnp.uint32)
    return mm, words.astype(jnp.int32)                     # (R,C), (R,C,W)


def make_sharded_text_paired_step(
        n_text_shards: int, own_len: int, halo: int,
        band_radius: int = 16, match: int = 1, mismatch: int = 4,
        gap_open: int = 6, gap_extend: int = 1, bonus: int = 5,
        max_fragment_length: int = 2000, unpaired_penalty: float = 30.0,
        max_mapq: int = 60, n_buckets: int = 1024,
        text_fits_i32: bool = True):
    """Full paired step against a TEXT-SHARDED haplotype index.

    Each candidate window is scored exactly once, on the shard that owns
    its start (valid masks route it), so DP scores — and therefore
    winners, MAPQs and pair selection — are bit-identical to the
    replicated-text step. Cross-shard combines are masked sums the
    partitioner lowers to psums over the 'text' axis; fragment distances
    between mates on different shards use a saturated (D, D) base-offset
    table, exact within max_fragment_length even when global coordinates
    exceed int32 (the point of sharding the text)."""
    from ..map.mapq import log_base

    lam = log_base(match, mismatch)
    B = band_radius
    D = n_text_shards

    def score_on_shards(tshards, reads, reads_rc, rlen,
                        start_l, owner, lo_l, hi_l, rev, valid):
        d_ids = jnp.arange(D, dtype=jnp.int32)
        valid_d = valid[None] & (owner[None] == d_ids[:, None, None])
        sd_ = jax.vmap(
            lambda t, v: align_ops.banded_scores(
                t, reads, reads_rc, rlen,
                jnp.where(v, start_l, 0), jnp.where(v, lo_l, 0),
                jnp.where(v, hi_l, 0), rev, v,
                band_radius=band_radius, match=match, mismatch=mismatch,
                gap_open=gap_open, gap_extend=gap_extend, bonus=bonus)
        )(tshards, valid_d)                                # (D, R, C)
        s = jnp.where(valid_d, sd_, 0).sum(axis=0)         # psum on 'text'
        s = jnp.where(valid, s, -1)
        mmd, bitsd = jax.vmap(
            lambda t, v: _mismatch_bits_all(
                t, B, reads, reads_rc, rlen, start_l, lo_l, hi_l, rev, v)
        )(tshards, valid_d)
        mm = jnp.where(valid_d, mmd, 0).sum(axis=0)
        bits = jnp.where(valid_d[..., None], bitsd, 0).sum(axis=0)
        return s, mm, bits

    def step(tshards, basediff, r1, r1rc, rl1, c1, r2, r2rc, rl2, c2,
             mu, sd):
        (s1_sl, s1_ow, s1_lo, s1_hi, s1_hap, s1_rev, s1_valid,
         s1_rp, s1_ro) = c1
        (s2_sl, s2_ow, s2_lo, s2_hi, s2_hap, s2_rev, s2_valid,
         s2_rp, s2_ro) = c2
        s1, mm1a, bits1a = score_on_shards(
            tshards, r1, r1rc, rl1, s1_sl, s1_ow, s1_lo, s1_hi,
            s1_rev, s1_valid)
        s2, mm2a, bits2a = score_on_shards(
            tshards, r2, r2rc, rl2, s2_sl, s2_ow, s2_lo, s2_hi,
            s2_rev, s2_valid)
        from ..map.giraffe import PLACEMENT_TOL

        # selection runs candidate-major — see _pair_core_T (shared with
        # the replicated step, keeping the two bit-identical)
        f1T = s1.T.astype(jnp.float32)
        f2T = s2.T.astype(jnp.float32)
        v1T = (s1_valid & (s1 > 0)).T
        v2T = (s2_valid & (s2 > 0)).T
        vd1T = v1T & _distinct_mask_T(s1.T, s1_rev.T, s1_rp.T, s1_ro.T,
                                      v1T, PLACEMENT_TOL)
        vd2T = v2T & _distinct_mask_T(s2.T, s2_rev.T, s2_rp.T, s2_ro.T,
                                      v2T, PLACEMENT_TOL)

        # fragment length in text space via the saturated base-offset
        # table: d2g - d1g = basediff[ow1, ow2] + (l2 - l1), exact while
        # |true distance| << the saturation bound
        L1r = rl1.astype(jnp.float32)[None, None, :]
        L2r = rl2.astype(jnp.float32)[None, None, :]
        ow1T = s1_ow.T
        ow2T = s2_ow.T
        bdT = basediff[ow1T[:, None, :], ow2T[None, :, :]].astype(
            jnp.float32)
        dl1T = (s1_sl + B).astype(jnp.float32).T
        dl2T = (s2_sl + B).astype(jnp.float32).T
        deltaT = bdT + (dl2T[None, :, :] - dl1T[:, None, :])   # d2g - d1g
        rev1T = s1_rev.T
        rev2T = s2_rev.T
        ffT = deltaT + L2r
        frT = -deltaT + L1r
        frag_txtT = jnp.where(rev1T[:, None, :], frT, ffT)
        same_copyT = s1_hap.T[:, None, :] == s2_hap.T[None, :, :]
        rp1T = s1_rp.T
        rp2T = s2_rp.T
        on_refT = (rp1T[:, None, :] >= 0) & (rp1T[:, None, :]
                                             == rp2T[None, :, :])
        ro1T = s1_ro.astype(jnp.float32).T
        ro2T = s2_ro.astype(jnp.float32).T
        rffT = (ro2T[None, :, :] + L2r) - ro1T[:, None, :]
        rfrT = (ro1T[:, None, :] + L1r) - ro2T[None, :, :]
        frag_refT = jnp.where(rev1T[:, None, :], rfrT, rffT)
        fragT = jnp.where(same_copyT, frag_txtT,
                          jnp.where(on_refT, frag_refT, -1.0))
        properT = ((rev1T[:, None, :] != rev2T[None, :, :])
                   & (same_copyT | on_refT)
                   & (fragT > 0) & (fragT <= max_fragment_length)
                   & vd1T[:, None, :] & vd2T[None, :, :])
        (j1, j2, mq1, mq2, use_pair, frags, stats) = _pair_core_T(
            f1T, f2T, vd1T, vd2T, fragT, properT, rl1, rl2, mu, sd,
            lam, unpaired_penalty, max_mapq, max_fragment_length)

        takeC = lambda a, j: jnp.take_along_axis(a, j[:, None], 1)[:, 0]
        mm1 = takeC(mm1a, j1)
        mm2 = takeC(mm2a, j2)
        bits1 = jnp.take_along_axis(
            bits1a, j1[:, None, None], 1)[:, 0]
        bits2 = jnp.take_along_axis(
            bits2a, j2[:, None, None], 1)[:, 0]

        # coverage: exact global bucketing when the text fits int32,
        # shard-local bucketing (n_buckets/D per shard) beyond that
        cov = jnp.zeros((n_buckets,), jnp.int32)
        if text_fits_i32:
            T = D * own_len
            bsz = max(T // n_buckets, 1)
            g1 = takeC(s1_ow, j1) * own_len + takeC(s1_sl, j1)
            g2 = takeC(s2_ow, j2) * own_len + takeC(s2_sl, j2)
            cov = cov.at[jnp.clip(g1 // bsz, 0, n_buckets - 1)].add(
                vd1T.any(0).astype(jnp.int32))
            cov = cov.at[jnp.clip(g2 // bsz, 0, n_buckets - 1)].add(
                vd2T.any(0).astype(jnp.int32))
        else:
            per = max(n_buckets // D, 1)
            bsz = max(own_len // per, 1)
            g1 = jnp.clip(takeC(s1_ow, j1), 0, D - 1) * per \
                + jnp.clip(takeC(s1_sl, j1) // bsz, 0, per - 1)
            g2 = jnp.clip(takeC(s2_ow, j2), 0, D - 1) * per \
                + jnp.clip(takeC(s2_sl, j2) // bsz, 0, per - 1)
            cov = cov.at[jnp.clip(g1, 0, n_buckets - 1)].add(
                vd1T.any(0).astype(jnp.int32))
            cov = cov.at[jnp.clip(g2, 0, n_buckets - 1)].add(
                vd2T.any(0).astype(jnp.int32))
        return (s1, s2, j1, j2,
                jnp.clip(mq1, 0, max_mapq).astype(jnp.int32),
                jnp.clip(mq2, 0, max_mapq).astype(jnp.int32),
                use_pair, frags, mm1, mm2, bits1, bits2, stats, cov)

    return step


def sharded_text_paired_step(mesh: Mesh, text, mate1, mate2, mu, sd,
                             band_radius: int = 16, halo: Optional[int] = None,
                             **kw):
    """Run the full paired step with the haplotype TEXT sharded over the
    mesh's 'text' axis and reads data-parallel over its 'data' axis (if
    present). mate = (reads, reads_rc, rlen, cand) with GLOBAL candidate
    meta (start, lo, hi, rev, valid, rp, ro); start/lo/hi may be int64.
    The wrapper splits the text, localizes candidates to their owning
    shards, and hands everything to make_sharded_text_paired_step —
    per-shard coordinates stay int32 so total text capacity scales with
    the text-axis size."""
    names = mesh.axis_names
    taxis = "text" if "text" in names else names[-1]
    daxis = "data" if "data" in names and "text" in names else None
    Dt = mesh.shape[taxis]
    r1, r1rc, rl1, c1g = mate1
    r2, r2rc, rl2, c2g = mate2
    RL = r1.shape[1]
    if halo is None:
        halo = RL + 2 * band_radius + 16
    own, shards = split_text_shards(np.asarray(text), Dt, halo)
    c1 = localize_candidates(c1g, own, Dt, halo)
    c2 = localize_candidates(c2g, own, Dt, halo)
    bases = np.arange(Dt, dtype=np.int64) * own
    basediff = np.clip(bases[None, :] - bases[:, None],
                       -(2 ** 30), 2 ** 30).astype(np.int32)
    text_fits = (Dt * own) < 2 ** 31

    tsh = NamedSharding(mesh, P(taxis, None))
    rsh = NamedSharding(mesh, P(daxis, None) if daxis else P())
    vsh = NamedSharding(mesh, P(daxis) if daxis else P())
    repl = NamedSharding(mesh, P())
    put_r = lambda a: jax.device_put(np.asarray(a), rsh)
    put_v = lambda a: jax.device_put(np.asarray(a), vsh)
    c1d = tuple(put_r(a) for a in c1)
    c2d = tuple(put_r(a) for a in c2)
    step = make_sharded_text_paired_step(
        Dt, own, halo, band_radius=band_radius,
        text_fits_i32=text_fits, **kw)
    out_shardings = (vsh,) * 12 + (repl, repl)
    # per-read outputs shard over data; 2D (R, C) outputs use rsh
    out_shardings = (rsh, rsh, vsh, vsh, vsh, vsh, vsh, vsh,
                     vsh, vsh, rsh, rsh, repl, repl)
    fn = jax.jit(step, out_shardings=out_shardings)
    with mesh:
        return fn(jax.device_put(shards, tsh),
                  jax.device_put(basediff, repl),
                  put_r(r1), put_r(r1rc), put_v(rl1), c1d,
                  put_r(r2), put_r(r2rc), put_v(rl2), c2d,
                  jnp.float32(mu), jnp.float32(sd))
