"""Pallas TPU kernel for the banded semiglobal DP.

The mapping hot loop (vg_tpu.ops.align.banded_scores) as a hand-written
TPU kernel: candidates ride the 128 lanes, the DP band rides sublanes,
and the read-row recurrence runs as an in-kernel loop over VMEM-resident
tiles — the role gssw's striped SIMD fill plays on CPU (reference:
deps/gssw, src/aligner.cpp), laid out for the VPU instead.

Shapes: windows (N, TW) uint8, reads (N, RL) uint8, rlen (N,) int32,
N padded to a multiple of 128. Band width W = 2B+1 padded to a multiple
of 8 sublanes. Scores exactly match the XLA scan implementation (tests
assert parity in interpret mode and on hardware).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(10 ** 8)
LANES = 128


def _round_up(x, m):
    return -(-x // m) * m


def pack_text(text: np.ndarray) -> np.ndarray:
    """4-bit pack the haplotype text: 8 base codes per int32 word
    (little-endian within the word). Gathering words instead of bytes is
    ~4x faster on TPU (the wrapper's window gather is the hot memory op);
    codes 0-5 plus the sentinel 6 all fit in a nibble."""
    pad = (-len(text)) % 8 + 16
    tp = np.concatenate(
        [np.asarray(text, np.uint8),
         np.full(pad, 6, np.uint8)]).astype(np.uint32)
    packed = np.zeros(len(tp) // 8, np.uint32)
    for b in range(8):
        packed |= tp[b::8] << np.uint32(4 * b)
    return packed.view(np.int32)


def make_kernel(RL: int, TW: int, W: int, WP: int, match: int, mismatch: int,
                gap_open: int, gap_extend: int, bonus: int):
    """Kernel body for fixed shapes. WP = W rounded up to 8 sublanes.

    Row loop is unrolled 8x so the window/read block loads happen once
    per 8 rows and every sublane rotate has a STATIC amount (a dynamic
    rotate lowers to a log-step select chain — it dominated the v1
    kernel at ~36 ms/mate). Best scores accumulate as (WP, LANES)
    vectors; the cross-sublane reduction happens once at the end instead
    of every row."""
    ksteps = int(np.ceil(np.log2(max(WP, 2))))
    BLK = WP + 8

    def kernel(win_ref, read_ref, rlen_ref, out_ref):
        # win_ref: (TWP, LANES) u8 | read_ref: (RL, LANES) u8
        # rlen_ref: (1, LANES) i32 | out_ref: (1, LANES) i32
        krow = jax.lax.broadcasted_iota(jnp.int32, (WP, LANES), 0)
        in_band = krow < W
        neg = jnp.full((WP, LANES), NEG, jnp.int32)
        H0 = jnp.where(in_band, jnp.int32(bonus), NEG)
        rlen = rlen_ref[0, :][None, :]
        ge_ramp = gap_extend * krow
        last = krow == WP - 1

        def one_row(i, r, block, rblk, carry):
            """r (static) = (i-1) % 8; block holds window rows
            [base, base+BLK), rblk read rows [base, base+8)."""
            H, F, bestv, bestev = carry
            rot = pltpu.roll(block, (BLK - r) % BLK, 0)
            win = rot[:WP, :]
            rb = pltpu.roll(rblk, (8 - r) % 8, 0)[0:1, :]
            sub = jnp.where((win == rb) & (rb < 4), jnp.int32(match),
                            jnp.int32(-mismatch))
            diag = H + sub
            shH = pltpu.roll(H, WP - 1, 0)   # up by one (circular)
            shF = pltpu.roll(F, WP - 1, 0)
            shH = jnp.where(last, NEG, shH)
            shF = jnp.where(last, NEG, shF)
            Fn = jnp.maximum(shH - gap_open, shF - gap_extend)
            Hn = jnp.maximum(jnp.maximum(diag, Fn), 0)
            Hn = jnp.where(in_band, Hn, NEG)
            # E = cummax(Hn + ge*k) shifted down one, minus open/extend ramp
            G = Hn + ge_ramp
            for s in range(ksteps):
                sh = 1 << s
                rolled = pltpu.roll(G, sh, 0)
                if sh > WP - W:
                    # wrapped sources can be in-band rows: mask them; for
                    # sh <= WP-W the wrap brings only out-of-band NEG rows
                    rolled = jnp.where(krow < sh, NEG, rolled)
                G = jnp.maximum(G, rolled)
            Gprev = pltpu.roll(G, 1, 0)
            Gprev = jnp.where(krow < 1, NEG, Gprev)
            E = Gprev - gap_open - ge_ramp + gap_extend
            Hfin = jnp.maximum(Hn, E)
            Hfin = jnp.where(in_band, Hfin, NEG)
            active = i <= rlen
            Hout = jnp.where(active, Hfin, H)
            Fout = jnp.where(active, Fn, F)
            upd = jnp.where(active, Hfin, NEG)
            bestv = jnp.maximum(bestv, upd)
            at_end = i == rlen
            bestev = jnp.maximum(bestev, jnp.where(at_end, Hfin, NEG))
            return Hout, Fout, bestv, bestev

        def block8(b, carry):
            base = b * 8
            block = win_ref[pl.ds(pl.multiple_of(base, 8), BLK), :].astype(
                jnp.int32)
            rblk = read_ref[pl.ds(pl.multiple_of(base, 8), 8), :].astype(
                jnp.int32)
            for r in range(8):
                carry = one_row(base + 1 + r, r, block, rblk, carry)
            return carry

        carry = (H0, neg, neg, neg)
        nfull = RL // 8
        if nfull:
            carry = jax.lax.fori_loop(0, nfull, block8, carry)
        rem = RL % 8
        if rem:
            base = nfull * 8
            block = win_ref[pl.ds(pl.multiple_of(base, 8), BLK), :].astype(
                jnp.int32)
            rblk = read_ref[pl.ds(pl.multiple_of(base, 8), 8), :].astype(
                jnp.int32)
            for r in range(rem):
                carry = one_row(base + 1 + r, r, block, rblk, carry)
        _, _, bestv, bestev = carry
        fin = jnp.maximum(jnp.where(in_band, bestv, NEG),
                          jnp.where(in_band, bestev + bonus, NEG))
        best = jnp.max(fin, axis=0, keepdims=True)
        out_ref[0, :] = jnp.maximum(best[0, :], 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("band_radius", "match", "mismatch", "gap_open",
                     "gap_extend", "bonus", "interpret"))
def banded_scores_pallas(
    windows: jnp.ndarray,   # (N, TW) uint8, N % 128 == 0
    reads: jnp.ndarray,     # (N, RL) uint8
    rlen: jnp.ndarray,      # (N,) int32 (0 = invalid slot)
    *,
    band_radius: int = 16,
    match: int = 1,
    mismatch: int = 4,
    gap_open: int = 6,
    gap_extend: int = 1,
    bonus: int = 5,
    interpret: bool = False,
) -> jnp.ndarray:
    N, TW = windows.shape
    RL = reads.shape[1]
    W = 2 * band_radius + 1
    WP = _round_up(W, 8)
    # room for the aligned (WP+8)-row block loads plus band padding
    TWP = _round_up(TW + (WP - W) + 16, 8)
    assert N % LANES == 0
    grid = (N // LANES,)

    # lay candidates on lanes: (TWP, N) and (RLP, N); read rows pad to a
    # multiple of 8 for the kernel's aligned 8-row block loads (the
    # extra rows are inactive: i > rlen)
    RLP = _round_up(RL, 8)
    win_t = jnp.transpose(
        jnp.pad(windows, ((0, 0), (0, TWP - TW)), constant_values=6))
    read_t = jnp.pad(jnp.transpose(reads), ((0, RLP - RL), (0, 0)),
                     constant_values=5)
    rlen2 = rlen.astype(jnp.int32)[None, :]

    kernel = make_kernel(RLP, TW, W, WP, match, mismatch, gap_open,
                         gap_extend, bonus)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TWP, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RLP, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        interpret=interpret,
    )(win_t, read_t, rlen2)
    return out[0]


@functools.partial(
    jax.jit,
    static_argnames=("band_radius", "match", "mismatch", "gap_open",
                     "gap_extend", "bonus"))
def banded_scores_via_pallas(
    text: jnp.ndarray, reads: jnp.ndarray, reads_rc: jnp.ndarray,
    rlen: jnp.ndarray, cand_start: jnp.ndarray, cand_lo: jnp.ndarray,
    cand_hi: jnp.ndarray, cand_rev: jnp.ndarray, cand_valid: jnp.ndarray,
    *, band_radius: int = 16, match: int = 1, mismatch: int = 4,
    gap_open: int = 6, gap_extend: int = 1, bonus: int = 5) -> jnp.ndarray:
    """Drop-in for vg_tpu.ops.align.banded_scores: XLA gathers the text
    windows and per-candidate oriented reads *directly in the kernel's
    lane-major layout* (no transposes — the round-1 wrapper materialized
    (N, TW) then transposed, which erased the kernel's win), the Pallas
    kernel fills the DP. Returns (R, C) int32 with -1 on invalid slots."""
    R, RL = reads.shape
    C = cand_start.shape[1]
    B = band_radius
    W = 2 * B + 1
    WP = _round_up(W, 8)
    TW = RL + 2 * B
    TWP = _round_up(TW + (WP - W) + 16, 8)
    N = R * C
    NP = _round_up(max(N, LANES), LANES)

    start = cand_start.reshape(N).astype(jnp.int32)
    lo = cand_lo.reshape(N).astype(jnp.int32)
    hi = cand_hi.reshape(N).astype(jnp.int32)
    rev = cand_rev.reshape(N)
    valid = cand_valid.reshape(N)
    ridx = (jnp.arange(N, dtype=jnp.int32) // C)

    # windows, built lane-major: row j of candidate n = text[start_n + j]
    pos = start[None, :] + jnp.arange(TWP, dtype=jnp.int32)[:, None]
    ok = ((pos >= lo[None, :]) & (pos < hi[None, :])
          & (pos >= 0) & (pos < text.shape[0])
          & (jnp.arange(TWP, dtype=jnp.int32)[:, None] < TW))
    win_t = jnp.where(ok, text[jnp.clip(pos, 0, text.shape[0] - 1)],
                      jnp.uint8(6))                           # (TWP, N)
    # oriented reads, lane-major
    rd_t = jnp.where(rev[None, :], reads_rc.T[:, ridx],
                     reads.T[:, ridx])                        # (RL, N)
    rl = jnp.where(valid, rlen[ridx], 0).astype(jnp.int32)
    RLP = _round_up(RL, 8)
    rd_t = jnp.pad(rd_t, ((0, RLP - RL), (0, 0)), constant_values=5)
    if NP != N:
        win_t = jnp.pad(win_t, ((0, 0), (0, NP - N)), constant_values=6)
        rd_t = jnp.pad(rd_t, ((0, 0), (0, NP - N)), constant_values=5)
        rl = jnp.pad(rl, (0, NP - N))

    kernel = make_kernel(RLP, TW, W, WP, match, mismatch, gap_open,
                         gap_extend, bonus)
    out = pl.pallas_call(
        kernel,
        grid=(NP // LANES,),
        in_specs=[
            pl.BlockSpec((TWP, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RLP, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, NP), jnp.int32),
    )(win_t, rd_t, rl[None, :])
    res = out[0, :N].reshape(R, C)
    return jnp.where(cand_valid, res, jnp.int32(-1))


@functools.partial(
    jax.jit,
    static_argnames=("T", "band_radius", "match", "mismatch", "gap_open",
                     "gap_extend", "bonus"))
def banded_scores_packed(
    text_packed: jnp.ndarray,   # (ceil(T/8)+2,) int32, pack_text() output
    T: int,                     # true text length in bases
    reads: jnp.ndarray, reads_rc: jnp.ndarray, rlen: jnp.ndarray,
    cand_start: jnp.ndarray, cand_lo: jnp.ndarray, cand_hi: jnp.ndarray,
    cand_rev: jnp.ndarray, cand_valid: jnp.ndarray,
    *, band_radius: int = 16, match: int = 1, mismatch: int = 4,
    gap_open: int = 6, gap_extend: int = 1, bonus: int = 5) -> jnp.ndarray:
    """Production DP entry: packed-word window gather + Pallas kernel.

    Same contract as vg_tpu.ops.align.banded_scores but reads the text
    from its 4-bit packed form: per candidate we gather ~TW/8 words,
    realign by the 0-7 base misalignment with vector shifts, and unpack —
    ~4x less gather traffic than byte gathers, which dominated the
    round-1 wrapper."""
    R, RL = reads.shape
    C = cand_start.shape[1]
    B = band_radius
    W = 2 * B + 1
    WP = _round_up(W, 8)
    TW = RL + 2 * B
    TWP = _round_up(TW + (WP - W) + 16, 8)
    N = R * C
    NP = _round_up(max(N, LANES), LANES)
    NWORDS = TWP // 8 + 2

    start = cand_start.reshape(N).astype(jnp.int32)
    lo = cand_lo.reshape(N).astype(jnp.int32)
    hi = cand_hi.reshape(N).astype(jnp.int32)
    rev = cand_rev.reshape(N)
    valid = cand_valid.reshape(N)

    # window gather, word granularity, lane-major
    w0 = start // 8
    m = (start % 8).astype(jnp.uint32)
    widx = w0[None, :] + jnp.arange(NWORDS, dtype=jnp.int32)[:, None]
    words = text_packed[jnp.clip(widx, 0, text_packed.shape[0] - 1)]
    wu = words.astype(jnp.uint32)
    sh = 4 * m
    lo_w = wu >> sh[None, :]
    hi_w = jnp.where(m == 0, jnp.uint32(0), wu << (32 - sh)[None, :])
    aligned = lo_w.at[:-1].set(lo_w[:-1] | hi_w[1:])
    rep = jnp.repeat(aligned[: TWP // 8 + 1], 8, axis=0)[:TWP]
    shifts = (4 * (jnp.arange(TWP, dtype=jnp.uint32) % 8))[:, None]
    win_t = ((rep >> shifts) & jnp.uint32(15)).astype(jnp.uint8)  # (TWP, N)
    # haplotype-range / text-range masking
    rowpos = start[None, :] + jnp.arange(TWP, dtype=jnp.int32)[:, None]
    ok = ((rowpos >= lo[None, :]) & (rowpos < hi[None, :])
          & (rowpos >= 0) & (rowpos < T)
          & (jnp.arange(TWP, dtype=jnp.int32)[:, None] < TW))
    win_t = jnp.where(ok, win_t, jnp.uint8(6))

    # oriented reads via repeat (affine candidate->read map; no gather)
    rd_f = jnp.repeat(reads.T, C, axis=1)
    rd_r = jnp.repeat(reads_rc.T, C, axis=1)
    rd_t = jnp.where(rev[None, :], rd_r, rd_f)                    # (RL, N)
    rl = jnp.where(valid, jnp.repeat(rlen[:R], C), 0).astype(jnp.int32)
    RLP = _round_up(RL, 8)
    rd_t = jnp.pad(rd_t, ((0, RLP - RL), (0, 0)), constant_values=5)
    if NP != N:
        win_t = jnp.pad(win_t, ((0, 0), (0, NP - N)), constant_values=6)
        rd_t = jnp.pad(rd_t, ((0, 0), (0, NP - N)), constant_values=5)
        rl = jnp.pad(rl, (0, NP - N))

    kernel = make_kernel(RLP, TW, W, WP, match, mismatch, gap_open,
                         gap_extend, bonus)
    out = pl.pallas_call(
        kernel,
        grid=(NP // LANES,),
        in_specs=[
            pl.BlockSpec((TWP, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RLP, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, NP), jnp.int32),
    )(win_t, rd_t, rl[None, :])
    res = out[0, :N].reshape(R, C)
    return jnp.where(cand_valid, res, jnp.int32(-1))
