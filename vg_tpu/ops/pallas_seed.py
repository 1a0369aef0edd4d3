"""Pallas TPU kernels for device-side seeding.

XLA's sort/scan/scatter are pathological at mapping shapes on this TPU
stack (measured: stable lax.sort on (16384,768) 65 s, argsort 2.5 s,
scatter-add 3.1 s, 160-step lax.scan ~14 ms/step — ARCHITECTURE.md), so
the per-read sort and segment ops that device seeding needs are written
here as hand-scheduled VMEM kernels instead:

- a per-row **bitonic sort network** over lexicographic int/float keys
  with payload columns (the role ips4o / std::sort play in the
  reference's host seeding, re-expressed as lane-parallel
  compare-exchange passes: every read rides the sublanes, its seed
  slots ride the lanes, partner exchange is a pltpu.roll);
- **Hillis-Steele log-shift scans** (prefix sum / running max / backward
  min) and **segmented broadcast** scans for cluster score aggregation
  (the reference's union-find + per-cluster accumulation,
  src/snarl_seed_clusterer.cpp, becomes sort + segmented reduce);
- kernel 1 `softcap_compact`: vg's soft hit-cap selection
  (src/minimizer_mapper.cpp:4349-4360 — take cheap minimizers always,
  expensive ones while the taken score stays under
  score_fraction*total) *without* the sequential scan: processing in
  descending-score order makes expensive-item failure prefix-closed, so
  take = cheap | (cheap_prefix + expensive_prefix < budget) with two
  prefix sums; then compaction of selected minimizers to the first M
  slots by a second bitonic pass;
- kernel 2 `cluster_topc`: seeds -> sort by (strand, diagonal) ->
  cluster break + cluster-id prefix sum -> (cluster, read-offset) dedup
  via a second sort -> segmented score totals -> top-C clusters by
  score with middle-element representative diagonals. Exactly the host
  GiraffeMapper._seed_batch policy (tests assert parity).

Both kernels run compiled on TPU and in interpret mode on CPU (tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32MAX = np.int32(2**31 - 1)


def _pow2_ge(x: int) -> int:
    n = 1
    while n < x:
        n *= 2
    return n


def _interp() -> bool:
    return jax.default_backend() == "cpu"


# ------------------------------------------------------- in-kernel helpers

def _cols(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _sel(c, a, b):
    """where(c, a, b) that survives Mosaic on the axon backend: vector
    select with i1 (bool) value operands fails tpu_compile there, so
    boolean selects lower to logical ops instead."""
    if jnp.result_type(a, b) == jnp.bool_:
        a = jnp.broadcast_to(jnp.asarray(a, bool), c.shape)
        b = jnp.broadcast_to(jnp.asarray(b, bool), c.shape)
        return (c & a) | ((~c) & b)
    return jnp.where(c, a, b)


def _roll(x, s: int):
    """result[p] = x[(p - s) mod S] along axis 1. Bool vectors ride as
    int32: pltpu.roll on i1 operands fails tpu_compile on the axon
    backend (same Mosaic gap as i1 selects — see _sel)."""
    S = x.shape[1]
    if x.dtype == jnp.bool_:
        return pltpu.roll(x.astype(jnp.int32), s % S, 1) != 0
    return pltpu.roll(x, s % S, 1)


def _shift_down(x, d: int, fill):
    """result[p] = x[p-d], positions p<d get fill."""
    return _sel(_cols(x.shape) >= d, _roll(x, d), fill)


def _shift_up(x, d: int, fill):
    """result[p] = x[p+d], positions p>=S-d get fill."""
    S = x.shape[1]
    return _sel(_cols(x.shape) < S - d, _roll(x, -d), fill)


def _prefix_sum(x):
    """Inclusive prefix sum along axis 1 (Hillis-Steele log shifts)."""
    S = x.shape[1]
    d = 1
    while d < S:
        x = x + _shift_down(x, d, jnp.zeros((), x.dtype))
        d *= 2
    return x


def _running_max(x, fill):
    S = x.shape[1]
    d = 1
    while d < S:
        x = jnp.maximum(x, _shift_down(x, d, fill))
        d *= 2
    return x


def _backward_min(x, fill):
    S = x.shape[1]
    d = 1
    while d < S:
        x = jnp.minimum(x, _shift_up(x, d, fill))
        d *= 2
    return x


def _seg_broadcast_first(val, newseg):
    """val at the FIRST element of each segment, propagated forward.
    newseg marks segment starts; callers guarantee newseg[:, 0]."""
    S = val.shape[1]
    flag = newseg
    d = 1
    while d < S:
        vs = _shift_down(val, d, jnp.zeros((), val.dtype))
        fs = _shift_down(flag, d, True)
        val = jnp.where(flag, val, vs)
        flag = flag | fs
        d *= 2
    return val


def _seg_broadcast_last(val, lastseg):
    """val at the LAST element of each segment, propagated backward.
    lastseg marks segment ends; callers guarantee lastseg[:, S-1]."""
    S = val.shape[1]
    flag = lastseg
    d = 1
    while d < S:
        vs = _shift_up(val, d, jnp.zeros((), val.dtype))
        fs = _shift_up(flag, d, True)
        val = jnp.where(flag, val, vs)
        flag = flag | fs
        d *= 2
    return val


def _lex_lt(a_keys, b_keys):
    """Lexicographic a < b over parallel key lists."""
    lt = jnp.zeros(a_keys[0].shape, bool)
    eq = jnp.ones(a_keys[0].shape, bool)
    for a, b in zip(a_keys, b_keys):
        lt = lt | (eq & (a < b))
        eq = eq & (a == b)
    return lt, eq


def _bitonic(keys, payloads):
    """Full ascending bitonic sort of each row by lexicographic `keys`
    (the last key must be unique per row, e.g. a column iota), carrying
    `payloads` through the same permutation. S = row width, power of 2.
    """
    S = keys[0].shape[1]
    assert S & (S - 1) == 0, S
    col = _cols(keys[0].shape)
    arrays = list(keys) + list(payloads)
    nk = len(keys)
    k = 2
    while k <= S:
        j = k // 2
        while j >= 1:
            is_lower = (col & j) == 0
            partner = [_sel(is_lower, _roll(a, -j), _roll(a, j))
                       for a in arrays]
            asc = (col & k) == 0
            want_lo = is_lower == asc
            plt, peq = _lex_lt(partner[:nk], arrays[:nk])
            pgt = (~plt) & (~peq)
            take = (want_lo & plt) | ((~want_lo) & pgt)
            arrays = [_sel(take, pa, a)
                      for pa, a in zip(partner, arrays)]
            j //= 2
        k *= 2
    return arrays[:nk], arrays[nk:]


# ------------------------------------------------- kernel 1: softcap/compact

def _softcap_kernel(score_fraction: float):
    def kernel(ms_ref, keep_ref, cheap_ref, hs_ref, cnt_ref, cr_ref,
               pos_o, hs_o, cnt_o, cr_o, ms_o, take_o):
        ms = ms_ref[:]
        keep = keep_ref[:] != 0
        cheap = cheap_ref[:] != 0
        col = _cols(ms.shape)
        # sort by descending score, position ascending (the host's
        # stable argsort(-mscore) order)
        (negms_s, pos_s), (keep_s, cheap_s, hs_s, cnt_s, cr_s) = _bitonic(
            [-ms, col],
            [keep_ref[:], cheap_ref[:], hs_ref[:], cnt_ref[:], cr_ref[:]])
        ms_s = -negms_s
        keep_s = keep_s != 0
        cheap_s = cheap_s != 0
        budget = score_fraction * jnp.sum(ms, axis=1, keepdims=True)
        cheapv = jnp.where(keep_s & cheap_s, ms_s, 0.0)
        expv = jnp.where(keep_s & (~cheap_s), ms_s, 0.0)
        # exclusive prefix sums: taken-score total before each item.
        # Expensive-item failure is prefix-closed in this order, so the
        # all-predecessors sum decides membership without a scan.
        csum = _prefix_sum(cheapv) - cheapv
        esum = _prefix_sum(expv) - expv
        take = keep_s & (cheap_s | (csum + esum < budget))
        # compact: selected minimizers first, in read-position order
        (nt_s, pos2), (hs2, cnt2, cr2, ms2) = _bitonic(
            [1 - take.astype(jnp.int32), pos_s],
            [hs_s, cnt_s, cr_s, ms_s])
        pos_o[:] = pos2
        hs_o[:] = hs2
        cnt_o[:] = cnt2
        cr_o[:] = cr2
        ms_o[:] = ms2
        take_o[:] = 1 - nt_s

    return kernel


@functools.partial(jax.jit, static_argnames=("score_fraction",))
def softcap_compact(mscore, keep, cheap, hs, cnt, cr, *,
                    score_fraction: float):
    """Soft hit-cap minimizer selection + compaction (reference policy:
    src/minimizer_mapper.cpp:4349-4360). Inputs (R, m): mscore f32 (0
    where not kept), keep/cheap bool, hs/cnt/cr int32. Returns sorted
    (R, mpad) arrays (pos, hs, cnt, cr, score, take) with selected
    minimizers compacted to the front in read-position order; slice
    [:, :M] for the M-slot budget."""
    R, m = mscore.shape
    mpad = _pow2_ge(max(m, 128))
    blk = 256 if mpad <= 128 else 128
    Rp = -(-R // blk) * blk

    def pad(a, fill, dt):
        out = jnp.full((Rp, mpad), fill, dt)
        return out.at[:R, :m].set(a.astype(dt))

    ms_p = pad(mscore, 0.0, jnp.float32)
    keep_p = pad(keep, 0, jnp.int32)
    cheap_p = pad(cheap, 0, jnp.int32)
    hs_p = pad(hs, 0, jnp.int32)
    cnt_p = pad(cnt, 0, jnp.int32)
    cr_p = pad(cr, 0, jnp.int32)

    spec = pl.BlockSpec((blk, mpad), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((Rp, mpad), jnp.int32)
    outs = pl.pallas_call(
        _softcap_kernel(score_fraction),
        grid=(Rp // blk,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 6,
        out_shape=[shp, shp, shp, shp,
                   jax.ShapeDtypeStruct((Rp, mpad), jnp.float32), shp],
        interpret=_interp(),
    )(ms_p, keep_p, cheap_p, hs_p, cnt_p, cr_p)
    return tuple(o[:R] for o in outs)


# --------------------------------------------- kernel 2: cluster + top-C

def _cluster_kernel(S: int, C: int, band_radius: int):
    LARGE = S + 1          # python int: jnp closure constants can't be
    IMAX = int(I32MAX)     # captured by a pallas kernel body

    def kernel(strand_ref, diag_ref, o_ref, sc_ref,
               cdiag_o, crev_o, cvalid_o):
        strandk = strand_ref[:]
        col = _cols(strandk.shape)
        # ---- sort 1: (strand, diagonal, slot index) — invalids last
        (strand1, diag1, _idx1), (o1, sc1) = _bitonic(
            [strandk, diag_ref[:], col], [o_ref[:], sc_ref[:]])
        valid1 = strand1 < 2
        nvalid = jnp.sum(valid1.astype(jnp.int32), axis=1, keepdims=True)

        # ---- cluster breaks on the sorted diagonals
        pstrand = _shift_down(strand1, 1, jnp.int32(-1))
        pdiag = _shift_down(diag1, 1, jnp.int32(0))
        brk = (col == 0) | (strand1 != pstrand) \
            | (diag1 - pdiag > 2 * band_radius)
        new_c = brk & valid1
        cid = jnp.maximum(_prefix_sum(new_c.astype(jnp.int32)) - 1, 0)

        # cluster first/last positions (valid elements only; the invalid
        # tail is contiguous at the right)
        start = _running_max(jnp.where(new_c, col, -1), jnp.int32(-1))
        nstart = _backward_min(jnp.where(new_c, col, LARGE), LARGE)
        nstart = _shift_up(nstart, 1, LARGE)
        end = jnp.minimum(nstart, nvalid) - 1
        is_middle = valid1 & (col == (start + end) // 2)

        # ---- sort 2: (cluster, read offset, order-1 position) for the
        # per-cluster distinct-offset dedup (host: seeds sharing a read
        # offset within a cluster score once)
        cidk = jnp.where(valid1, cid, IMAX)
        (cid2, o2, _r2), (sc2,) = _bitonic([cidk, o1, col], [sc1])
        valid2 = cid2 != IMAX
        pcid = _shift_down(cid2, 1, jnp.int32(-1))
        po = _shift_down(o2, 1, jnp.int32(-1))
        uniq = (col == 0) | (cid2 != pcid) | (o2 != po)
        contrib = jnp.where(uniq & valid2, sc2, 0.0)
        newseg = (col == 0) | (cid2 != pcid)
        ps = _prefix_sum(contrib)
        before = _seg_broadcast_first(ps - contrib, newseg)
        lastseg = _shift_up(newseg, 1, True)
        total = _seg_broadcast_last(ps, lastseg) - before
        # cid segments occupy identical index ranges in both sort orders
        # (cid is non-decreasing in each), so `total` aligns positionally
        # with sort-1's clusters: read it at the middle elements.
        val = jnp.where(is_middle, total, -1.0)

        # ---- top-C clusters by score (ties -> lower cluster id = lower
        # middle position; host: stable argsort of -score)
        blk = strandk.shape[0]
        col128 = _cols((blk, 128))
        cdiag = jnp.zeros((blk, 128), jnp.int32)
        crev = jnp.zeros((blk, 128), jnp.int32)
        cvalid = jnp.zeros((blk, 128), jnp.int32)
        for c in range(C):
            mx = jnp.max(val, axis=1, keepdims=True)
            pos_ok = (val == mx) & (mx > 0)
            mincol = jnp.min(jnp.where(pos_ok, col, LARGE), axis=1,
                             keepdims=True)
            firstm = col == mincol
            d_c = jnp.sum(jnp.where(firstm, diag1, 0), axis=1,
                          keepdims=True)
            r_c = jnp.sum(jnp.where(firstm, strand1, 0), axis=1,
                          keepdims=True)
            v_c = (mx > 0).astype(jnp.int32)
            at_c = col128 == c
            cdiag = jnp.where(at_c, d_c, cdiag)
            crev = jnp.where(at_c, r_c, crev)
            cvalid = jnp.where(at_c, v_c, cvalid)
            val = jnp.where(firstm, -1.0, val)
        cdiag_o[:] = cdiag
        crev_o[:] = crev
        cvalid_o[:] = cvalid

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("band_radius", "max_candidates"))
def cluster_topc(strandk, diagk, ok, score, *, band_radius: int,
                 max_candidates: int):
    """Seeds -> (strand, diagonal) clustering -> top-C candidates.

    Inputs (R, S) with S a power of two: strandk int32 (0 fwd / 1 rev /
    2 invalid), diagk int32 (I32MAX on invalid), ok int32 read offsets
    (I32MAX on invalid), score f32 (0 on invalid). Returns
    (cand_diag, cand_rev, cand_valid) each (R, C) — the host
    _seed_batch's top-C clusters (reference clustering role:
    src/snarl_seed_clusterer.cpp)."""
    R, S = strandk.shape
    assert S & (S - 1) == 0, S
    C = max_candidates
    blk = max(8, min(64, (4 * 1024 * 1024) // (S * 4 * 16)))
    Rp = -(-R // blk) * blk

    def pad(a, fill, dt):
        if Rp == R:
            return a.astype(dt)
        return jnp.concatenate(
            [a.astype(dt), jnp.full((Rp - R, S), fill, dt)])

    spec = pl.BlockSpec((blk, S), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((blk, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    oshp = jax.ShapeDtypeStruct((Rp, 128), jnp.int32)
    cdiag, crev, cvalid = pl.pallas_call(
        _cluster_kernel(S, C, band_radius),
        grid=(Rp // blk,),
        in_specs=[spec] * 4,
        out_specs=[ospec] * 3,
        out_shape=[oshp, oshp, oshp],
        interpret=_interp(),
    )(pad(strandk, 2, jnp.int32), pad(diagk, I32MAX, jnp.int32),
      pad(ok, I32MAX, jnp.int32), pad(score, 0.0, jnp.float32))
    return cdiag[:R, :C], crev[:R, :C], cvalid[:R, :C] != 0


# --------------------------------------------------------- 1-D argsort

def _argsort_kernel(S: int):
    def kernel(key_ref, perm_o):
        col = _cols(key_ref[:].shape)
        (_k,), (p,) = _bitonic([key_ref[:]], [col])
        perm_o[:] = p

    return kernel


@jax.jit
def argsort_i32(keys):
    """Ascending argsort of a 1-D int32 vector. Ties broken by index;
    returns int32 permutation.

    Two regimes (measured on the real v5e through the axon tunnel):
    above 4096 lanes the fully-unrolled bitonic ((log2 n)(log2 n + 1)/2
    compare-exchange stages) blows up the Mosaic compile helper, while
    XLA's own 1-D variadic sort runs in the dispatch-latency floor
    (~30 ms at n=16384, i.e. free inside a fused program) — so large n
    routes to lax.sort and only small rows use the Pallas bitonic."""
    n = keys.shape[0]
    if n > 4096:
        return jnp.argsort(keys, stable=True).astype(jnp.int32)
    S = _pow2_ge(max(n, 128))
    pad = jnp.full((1, S), I32MAX, jnp.int32)
    padded = pad.at[0, :n].set(keys.astype(jnp.int32))
    perm = pl.pallas_call(
        _argsort_kernel(S),
        out_shape=jax.ShapeDtypeStruct((1, S), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interp(),
    )(padded)
    return perm[0, :n]
