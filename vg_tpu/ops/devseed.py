"""Device-side minimizer seeding (the last host stage moved onto the TPU).

The round-1 verdict's perf prescription was "move seeding onto the device
(minimizer extraction + sorted-table lookup + diagonal clustering as
segment ops)". This module is that kernel, written as pure jnp with
static shapes so the whole paired/single mapping dispatch needs only the
4-bit packed reads as input — no candidate upload at all.

Device has no uint64, so 58-bit minimizer keys and the wang hash run on
(hi, lo) uint32 pairs. Each stage mirrors the host exactly and is
parity-tested against it (tests/test_devseed.py); the fused paired
dispatch built on it produces byte-identical GAM records to the
host-seeded path (GiraffeParams.device_seed).

STATUS: correct but RETIRED as the production default. Round-3 rebuilt
the sort/segment stages as Pallas kernels (ops/pallas_seed.py) after
XLA's own sort/scan/scatter proved pathological (argsort(16384x768)
2.5s, scatter-add 3.1s, a 160-step lax.scan 2.3s). Round-4 measured the
rebuilt path on the real v5e at production shapes (12288 reads/batch):
rolling_minimizers ~0 ms, lookup_ranges2 701 ms (the 19-step
composite-key binary search is ~230 MB of random HBM gathers), full
seed_candidates_dev 1572 ms — vs 117 ms for the ENTIRE fused
DP+pair-selection dispatch. Device seeding adds >10x the chip's DP time
to the chip (the serial resource) to save host seeding work that
overlaps with device compute anyway (~35 us/read across 3 pipeline
threads), so it cannot win on a host that keeps up; even a perfect
hash-table lookup (~5x fewer gathers) could not close the 13x gap.
Kept byte-parity-tested as capability for host-starved topologies
(GiraffeParams.device_seed / BENCH_DEVSEED=1|probe).

  rolling_minimizers  == index.minimizer.extract_minimizers
  lookup_ranges2      == MinimizerIndex.lookup_ranges
  soft-cap + cluster  == GiraffeMapper._seed_batch (up to the documented
                         per-minimizer device hit cap)
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32


# ------------------------------------------------------------- 64-bit ops

def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(U32)
    return ah + bh + carry, lo


def _shl64(h, l, s: int):
    if s == 0:
        return h, l
    if s >= 32:
        return (l << (s - 32)) if s > 32 else l, jnp.zeros_like(l)
    return (h << s) | (l >> (32 - s)), l << s


def _shr64(h, l, s: int):
    if s == 0:
        return h, l
    if s >= 32:
        return jnp.zeros_like(h), (h >> (s - 32)) if s > 32 else h
    return h >> s, (l >> s) | (h << (32 - s))


def wang_hash64(h, l):
    """wang_hash (native/vgtpu_host.cpp:17) on uint32 pairs."""
    nh, nl = ~h, ~l
    sh, sl = _shl64(h, l, 21)
    h, l = _add64(nh, nl, sh, sl)
    rh, rl = _shr64(h, l, 24)
    h, l = h ^ rh, l ^ rl
    s3h, s3l = _shl64(h, l, 3)
    s8h, s8l = _shl64(h, l, 8)
    th, tl = _add64(h, l, s3h, s3l)
    h, l = _add64(th, tl, s8h, s8l)
    rh, rl = _shr64(h, l, 14)
    h, l = h ^ rh, l ^ rl
    s2h, s2l = _shl64(h, l, 2)
    s4h, s4l = _shl64(h, l, 4)
    th, tl = _add64(h, l, s2h, s2l)
    h, l = _add64(th, tl, s4h, s4l)
    rh, rl = _shr64(h, l, 28)
    h, l = h ^ rh, l ^ rl
    sh, sl = _shl64(h, l, 31)
    return _add64(h, l, sh, sl)


def split_keys(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host: uint64 key array -> (hi, lo) uint32 arrays."""
    keys = np.asarray(keys, np.uint64)
    return ((keys >> np.uint64(32)).astype(np.uint32),
            (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))


# --------------------------------------------------- rolling minimizers

@partial(jax.jit, static_argnums=(2, 3))
def rolling_minimizers(codes2d, rlen, k: int, w: int):
    """(R, L) uint8 codes (padded) + per-read true lengths -> per kmer
    position (R, m): key_hi, key_lo, canon_rev, chosen (window minima
    incl. ties), valid. Mirrors index.minimizer.extract_minimizers / the
    C kernel on each read's TRUE length: windows never extend into the
    pad (reads shorter than k+w-1 select nothing — the host would use a
    shrunken window there; gate device seeding on read length >= k+w-1).

    Built from k unrolled shifted ORs — the rolling update is a scan on
    CPU but a scan is ~14 ms/STEP at mapping batch shapes on this TPU
    stack (ARCHITECTURE.md), so the kmer at each position is assembled
    positionally instead: code[e-j] contributes 2 bits at shift 2j
    (fwd) / 2(k-1-j) (rev-comp), pure vector ops.
    """
    R, L = codes2d.shape
    m = L - k + 1

    cc = jnp.where(codes2d < 4, codes2d, 0).astype(U32)   # (R, L)
    bad = codes2d >= 4
    z = jnp.zeros((R, m), U32)
    fh, fl, rh, rl = z, z, z, z
    for j in range(k):
        cj = cc[:, k - 1 - j : k - 1 - j + m]
        s = 2 * j
        if s >= 32:
            fh = fh | (cj << (s - 32))
        else:
            fl = fl | (cj << s)
        tj = U32(3) - cj
        s = 2 * (k - 1 - j)
        if s >= 32:
            rh = rh | (tj << (s - 32))
        else:
            rl = rl | (tj << s)

    # windowed OR of bad over k positions (doubling)
    acc = bad
    size = 1
    while size < k:
        step = min(size, k - size)
        acc = acc | jnp.concatenate(
            [acc[:, step:], jnp.zeros((R, step), bool)], 1)
        size += step
    valid = ~acc[:, :m]
    cr = (rh < fh) | ((rh == fh) & (rl < fl))
    kh = jnp.where(cr, rh, fh)
    kl = jnp.where(cr, rl, fl)
    hh, hl = wang_hash64(kh, kl)
    FULL = U32(0xFFFFFFFF)
    hh = jnp.where(valid, hh, FULL)
    hl = jnp.where(valid, hl, FULL)

    # windowed minima over w positions (composite compare), ties kept:
    # chosen[p] = exists full window i covering p with hash[p] == min_i
    w_eff = min(w, m)

    def win_reduce(arrh, arrl):
        oh, ol = arrh, arrl
        for s in range(1, w_eff):
            sh_ = jnp.concatenate([arrh[:, s:], jnp.full((R, s), FULL)], 1)
            sl_ = jnp.concatenate([arrl[:, s:], jnp.full((R, s), FULL)], 1)
            lt = (sh_ < oh) | ((sh_ == oh) & (sl_ < ol))
            oh = jnp.where(lt, sh_, oh)
            ol = jnp.where(lt, sl_, ol)
        return oh, ol   # min over window starting at each position

    wmh, wml = win_reduce(hh, hl)
    # full windows per read end at the read's true length, not the pad:
    # window i is full iff 0 <= i < (rlen - k + 1) - w_eff + 1
    n_win_r = (rlen.astype(jnp.int32) - k + 1) - w_eff + 1   # (R,)
    chosen = jnp.zeros((R, m), bool)
    for s in range(w_eff):
        # window starting at p-s covers p when 0 <= p-s < n_win_r
        cov_h = jnp.concatenate(
            [jnp.full((R, s), FULL), wmh[:, : m - s]], 1)
        cov_l = jnp.concatenate(
            [jnp.full((R, s), FULL), wml[:, : m - s]], 1)
        win_i = jnp.arange(m)[None, :] - s
        in_full = (win_i >= 0) & (win_i < n_win_r[:, None])
        eq = (hh == cov_h) & (hl == cov_l) & in_full
        chosen = chosen | eq
    chosen = chosen & valid
    return kh, kl, cr, chosen, valid


# --------------------------------------------------------------- lookup

def lookup_ranges2(key_hi, key_lo, idx_hi, idx_lo, offsets):
    """Vectorized composite-key binary search over the sorted resident
    minimizer table: returns (start, end) hit ranges (start==end when
    absent). Mirrors MinimizerIndex.lookup_ranges."""
    n = idx_hi.shape[0]
    lo_b = jnp.zeros(key_hi.shape, jnp.int32)
    hi_b = jnp.full(key_hi.shape, n, jnp.int32)
    steps = max(int(np.ceil(np.log2(max(n, 2)))) + 1, 1)
    for _ in range(steps):
        mid = (lo_b + hi_b) // 2
        midc = jnp.clip(mid, 0, max(n - 1, 0))
        mh = idx_hi[midc]
        ml_ = idx_lo[midc]
        lt = (mh < key_hi) | ((mh == key_hi) & (ml_ < key_lo))
        lo_b = jnp.where(lt & (lo_b < hi_b), mid + 1, lo_b)
        hi_b = jnp.where((~lt) & (lo_b < hi_b), mid, hi_b)
    i = jnp.clip(lo_b, 0, max(n - 1, 0))
    found = (n > 0) & (idx_hi[i] == key_hi) & (idx_lo[i] == key_lo)
    start = jnp.where(found, offsets[i], 0)
    end = jnp.where(found, offsets[i + 1], 0)
    return start, end


# ----------------------------------------------- selection + clustering

@partial(jax.jit,
         static_argnames=("k", "hit_cap", "hard_hit_cap",
                          "score_fraction", "max_candidates",
                          "band_radius", "M", "Hd", "S"))
def seed_candidates_dev(codes_kh, codes_kl, canon_rev, chosen, valid,
                        rlen,
                        idx_hi, idx_lo, offsets, pos_text, pos_rev,
                        score_tab=None, *,
                        k: int, hit_cap: int, hard_hit_cap: int,
                        score_fraction: float, max_candidates: int,
                        band_radius: int, M: int = 64, Hd: int = 64,
                        S: int = 768):
    """Minimizer hits -> soft-cap selection -> diagonal clustering ->
    top-C candidates, entirely on device (the jnp re-expression of
    GiraffeMapper._seed_batch). Static budgets: M minimizer slots per
    read, Hd hits per minimizer (M*Hd must be a power of two) — exact
    parity with the host below those budgets; a minimizer whose hits
    exceed Hd is dropped whole (a stricter hard cap). S is kept for
    API compatibility and ignored: the sort width is M*Hd.

    score_tab: optional (hard_hit_cap+1,) f32 quantized score table
    (index/minimizer.py minimizer_score_table) — pass the SAME array
    the host engines use so tie-breaks agree bitwise; when None the
    quantized scores are computed inline in f32.

    The per-read sort/segment stages run as Pallas kernels
    (ops/pallas_seed.py) — XLA's own sort/scan/scatter are pathological
    at these shapes (ARCHITECTURE.md measurements).

    Returns (cand_start, cand_rev, cand_valid) with C = max_candidates.
    """
    from .pallas_seed import I32MAX, cluster_topc, softcap_compact

    R, m = codes_kh.shape
    C = max_candidates
    B = band_radius

    hs, he = lookup_ranges2(codes_kh, codes_kl, idx_hi, idx_lo, offsets)
    counts = jnp.where(chosen & valid, he - hs, 0)
    # the device's effective hard cap is min(hard_hit_cap, Hd): a
    # minimizer whose hits exceed the per-minimizer budget is DROPPED
    # whole (like a stricter hard cap) rather than silently truncated
    keep = (counts > 0) & (counts <= min(hard_hit_cap, Hd))
    if score_tab is None:
        raw = jnp.maximum(
            1.0 + jnp.log(float(hard_hit_cap))
            - jnp.log(jnp.maximum(counts, 1).astype(jnp.float32)), 1.0)
        mscore = jnp.round(raw * 256.0) / 256.0
    else:
        mscore = score_tab[jnp.minimum(counts, score_tab.shape[0] - 1)]
    mscore = jnp.where(keep, mscore, 0.0)
    cheap = keep & (counts <= hit_cap)

    pos_s, hs_s, cnt_s, cr_s, ms_s, take_s = softcap_compact(
        mscore, keep, cheap, hs, counts.astype(jnp.int32),
        canon_rev.astype(jnp.int32), score_fraction=score_fraction)
    mo_pos = pos_s[:, :M]
    mo_hs = hs_s[:, :M]
    mo_cnt = cnt_s[:, :M]
    mo_cr = cr_s[:, :M] != 0
    mo_sc = ms_s[:, :M]
    slot_valid = take_s[:, :M] != 0

    # hit expansion: (R, M, Hd) gathers against the resident position
    # table (XLA is good at this part)
    hit_off = jnp.arange(Hd, dtype=jnp.int32)
    hit_idx = mo_hs[:, :, None] + hit_off[None, None, :]
    hit_ok = (hit_off[None, None, :] < mo_cnt[:, :, None]) \
        & slot_valid[:, :, None]
    np_ = pos_text.shape[0]
    hclip = jnp.clip(hit_idx, 0, max(np_ - 1, 0))
    pos = pos_text[hclip]
    prev = pos_rev[hclip].astype(bool)
    strand = prev != mo_cr[:, :, None]
    o_f = mo_pos[:, :, None].astype(jnp.int32)
    o_r = (rlen[:, None, None] - k - mo_pos[:, :, None]).astype(jnp.int32)
    o = jnp.where(strand, o_r, o_f)
    diag = pos - o

    Sp = M * Hd
    strandk = jnp.where(hit_ok, strand.astype(jnp.int32), 2).reshape(R, Sp)
    diagk = jnp.where(hit_ok, diag, I32MAX).reshape(R, Sp)
    okk = jnp.where(hit_ok, o, I32MAX).reshape(R, Sp)
    scf = jnp.where(hit_ok, mo_sc[:, :, None], 0.0).reshape(R, Sp)

    cdiag, crev, cvalid = cluster_topc(
        strandk, diagk, okk, scf, band_radius=B, max_candidates=C)
    cand_start = (cdiag - B).astype(jnp.int32)
    return cand_start, crev.astype(bool), cvalid


def _seed_candidates_dev_xla(codes_kh, codes_kl, canon_rev, chosen, valid,
                             rlen,
                             idx_hi, idx_lo, offsets, pos_text, pos_rev,
                             k: int, hit_cap: int, hard_hit_cap: int,
                             score_fraction: float, max_candidates: int,
                             band_radius: int, M: int = 64, Hd: int = 64,
                             S: int = 768):
    """Retired pure-XLA twin of seed_candidates_dev (kept as the
    reference implementation the Pallas version was validated against;
    ~25x slower on this stack — see module docstring)."""
    R, m = codes_kh.shape
    C = max_candidates
    B = band_radius
    NEG = jnp.int32(2**31 - 1)

    hs, he = lookup_ranges2(codes_kh, codes_kl, idx_hi, idx_lo, offsets)
    counts = jnp.where(chosen & valid, he - hs, 0)
    # the device's effective hard cap is min(hard_hit_cap, Hd): a
    # minimizer whose hits exceed the per-minimizer budget is DROPPED
    # whole (like a stricter hard cap) rather than silently truncated
    # to a partial cluster
    keep = (counts > 0) & (counts <= min(hard_hit_cap, Hd))
    mscore = jnp.maximum(
        1.0 + jnp.log(float(hard_hit_cap))
        - jnp.log(jnp.maximum(counts, 1).astype(jnp.float32)), 1.0)
    mscore = jnp.where(keep, mscore, 0.0)

    # soft-cap selection in descending-score order (ties: position asc),
    # sequential taken-accumulation per read (host _soft_cap_select)
    order = jnp.argsort(-mscore, axis=1, stable=True)       # (R, m)
    total = mscore.sum(axis=1)
    budget = score_fraction * total

    def sc_step(taken, col):
        idx = order[:, col]
        g = lambda a: jnp.take_along_axis(a, idx[:, None], 1)[:, 0]
        sc = g(mscore)
        kp = g(keep)
        cheap = g(counts) <= hit_cap
        t = kp & (cheap | (taken < budget))
        return taken + jnp.where(t, sc, 0.0), t

    taken0 = jnp.zeros(R, jnp.float32)
    _, take_cols = jax.lax.scan(sc_step, taken0, jnp.arange(m))
    take_sorted = take_cols.T                               # (R, m)
    take = jnp.zeros((R, m), bool).at[
        jnp.arange(R)[:, None], order].set(take_sorted)

    # compact selected minimizers (position order) into M slots
    rank = jnp.cumsum(take, axis=1) - 1
    slot_ok = take & (rank < M)
    r_ix = jnp.broadcast_to(jnp.arange(R)[:, None], (R, m))
    slot = jnp.where(slot_ok, rank, M)          # M = spill row
    mo_pos = jnp.zeros((R, M + 1), jnp.int32).at[r_ix, slot].set(
        jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (R, m)),
        mode="drop")[:, :M]
    put = lambda a, fill: jnp.full((R, M + 1), fill, a.dtype).at[
        r_ix, slot].set(a, mode="drop")[:, :M]
    mo_hs = put(hs, 0)
    mo_cnt = put(counts.astype(jnp.int32), 0)
    mo_cr = put(canon_rev, False)
    mo_sc = put(mscore, 0.0)
    n_sel = jnp.minimum(take.sum(axis=1), M)
    slot_valid = jnp.arange(M)[None, :] < n_sel[:, None]

    # expand hits: (R, M, Hd)
    hit_off = jnp.arange(Hd, dtype=jnp.int32)
    hit_idx = mo_hs[:, :, None] + hit_off[None, None, :]
    hit_ok = (hit_off[None, None, :] < mo_cnt[:, :, None]) \
        & slot_valid[:, :, None]
    np_ = pos_text.shape[0]
    hclip = jnp.clip(hit_idx, 0, max(np_ - 1, 0))
    pos = pos_text[hclip]
    prev = pos_rev[hclip].astype(bool)
    strand = prev != mo_cr[:, :, None]
    o_f = mo_pos[:, :, None].astype(jnp.int32)
    o_r = (rlen[:, None, None] - k - mo_pos[:, :, None]).astype(jnp.int32)
    o = jnp.where(strand, o_r, o_f)
    diag = pos - o
    sscore = jnp.broadcast_to(mo_sc[:, :, None], (R, M, Hd))

    # flatten + compact seeds to S slots (minimizer-position order)
    fv = hit_ok.reshape(R, M * Hd)
    fdiag = diag.reshape(R, M * Hd)
    fstrand = strand.reshape(R, M * Hd)
    fo = o.reshape(R, M * Hd)
    fsc = sscore.reshape(R, M * Hd)
    srank = jnp.cumsum(fv, axis=1) - 1
    s_ok = fv & (srank < S)
    sslot = jnp.where(s_ok, srank, S)
    r_ixMH = jnp.broadcast_to(jnp.arange(R)[:, None], (R, M * Hd))
    putS = lambda a, fill: jnp.full((R, S + 1), fill, a.dtype).at[
        r_ixMH, sslot].set(a, mode="drop")[:, :S]
    sdiag = putS(fdiag, NEG)
    sstrand = putS(fstrand.astype(jnp.int32), 2)
    so = putS(fo, 0)
    ssc = putS(fsc, 0.0)
    n_seed = jnp.minimum(fv.sum(axis=1), S)
    sv = jnp.arange(S)[None, :] < n_seed[:, None]

    # sort per read by (strand, diag): stable by diag, then by strand
    key_d = jnp.where(sv, sdiag, NEG)
    ord1 = jnp.argsort(key_d, axis=1, stable=True)
    g1 = lambda a: jnp.take_along_axis(a, ord1, 1)
    sdiag, sstrand, so, ssc, sv = (g1(sdiag), g1(sstrand), g1(so),
                                   g1(ssc), g1(sv))
    key_s = jnp.where(sv, sstrand, 2)
    ord2 = jnp.argsort(key_s, axis=1, stable=True)
    g2 = lambda a: jnp.take_along_axis(a, ord2, 1)
    sdiag, sstrand, so, ssc, sv = (g2(sdiag), g2(sstrand), g2(so),
                                   g2(ssc), g2(sv))

    # cluster breaks
    new_c = jnp.ones((R, S), bool)
    d_gap = sdiag[:, 1:] - sdiag[:, :-1]
    brk = ((sstrand[:, 1:] != sstrand[:, :-1]) | (d_gap > 2 * B))
    new_c = new_c.at[:, 1:].set(brk)
    new_c = new_c & sv
    cid = jnp.cumsum(new_c, axis=1) - 1          # (R, S), -1 before first
    cid = jnp.maximum(cid, 0)

    # distinct read offsets within cluster: sort by (cid, o) stably
    ord3 = jnp.argsort(jnp.where(sv, so, NEG), axis=1, stable=True)
    g3 = lambda a: jnp.take_along_axis(a, ord3, 1)
    cid3, o3, sc3, sv3 = g3(cid), g3(so), g3(ssc), g3(sv)
    ord4 = jnp.argsort(jnp.where(sv3, cid3, NEG), axis=1, stable=True)
    g4 = lambda a: jnp.take_along_axis(a, ord4, 1)
    cid4, o4, sc4, sv4 = g4(cid3), g4(o3), g4(sc3), g4(sv3)
    uniq = jnp.ones((R, S), bool)
    uniq = uniq.at[:, 1:].set((cid4[:, 1:] != cid4[:, :-1])
                              | (o4[:, 1:] != o4[:, :-1]))
    contrib = jnp.where(uniq & sv4, sc4, 0.0)
    K = S   # cluster id < S
    r_ixS = jnp.broadcast_to(jnp.arange(R)[:, None], (R, S))
    cl_score = jnp.zeros((R, K), jnp.float32).at[
        r_ixS, cid4].add(jnp.where(sv4, contrib, 0.0))

    # representative diag = middle element of each cluster's sorted run
    posS = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (R, S))
    first = jnp.full((R, K), S, jnp.int32).at[r_ixS, cid].min(
        jnp.where(sv, posS, S))
    last = jnp.full((R, K), -1, jnp.int32).at[r_ixS, cid].max(
        jnp.where(sv, posS, -1))
    cl_valid = last >= 0
    mid = jnp.clip((first + last) // 2, 0, S - 1)
    cl_diag = jnp.take_along_axis(sdiag, mid, 1)
    cl_strand = jnp.take_along_axis(sstrand, mid, 1)

    # top-C clusters per read by score (ties -> lower cid, host lexsort)
    scored = jnp.where(cl_valid, cl_score, -1.0)
    ordc = jnp.argsort(-scored, axis=1, stable=True)[:, :C]
    gc = lambda a: jnp.take_along_axis(a, ordc, 1)
    cand_diag = gc(cl_diag)
    cand_rev = gc(cl_strand).astype(bool)
    cand_valid = gc(cl_valid) & (gc(scored) > 0)
    cand_start = (cand_diag - B).astype(jnp.int32)
    return cand_start, cand_rev, cand_valid
