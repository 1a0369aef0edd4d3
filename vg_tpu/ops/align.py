"""Batched banded alignment against haplotype-text windows (device side).

This is the TPU-native replacement for the reference's DP kernel stack
(gssw graph Smith-Waterman, dozeu X-drop tails, banded global aligner —
reference: src/aligner.cpp, src/dozeu_interface.cpp,
src/banded_global_aligner.cpp). Because vg_tpu extends along *haplotypes*
(flat text, see vg_tpu.index.haplotypes), graph DP over DAG tiles collapses
to classic banded sequence-vs-sequence DP, which batches perfectly:

  score[r, c] = best semiglobal alignment of read r against the text
                window of candidate c

Semantics (matching vg's Aligner defaults, reference
src/alignment_scorer.hpp:17-28): match +1, mismatch -4, gap open 6,
gap extend 1 (a length-g gap costs open + (g-1)*ext), full-length bonus +5
per read end included in the alignment; soft-clips free. This is exactly
the scoring under which giraffe's "score == 73" golden holds for a 63bp
perfect read (test/t/50_vg_giraffe.t:49).

The DP is a jax.lax.scan over read rows; the in-row affine deletion
recurrence is resolved exactly with a cumulative max along the band
(E[j] = max_{j'<j}(H[j'] + ext*j') - open - ext*(j-1)), so each row is a
fixed-shape VPU-friendly vector op over (batch, cands, band). Traceback for
winners runs host-side (vg_tpu.ops.traceback) — scoring all candidates is
the hot loop, traceback touches one candidate per read.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(10**8)  # effective -inf for int32 DP
SENTINEL = 6    # window code that never matches any read code


@dataclass(frozen=True)
class Scoring:
    match: int = 1
    mismatch: int = 4
    gap_open: int = 6        # cost of a length-1 gap
    gap_extend: int = 1
    full_length_bonus: int = 5

    def gap_cost(self, length: int) -> int:
        if length <= 0:
            return 0
        return self.gap_open + (length - 1) * self.gap_extend


DEFAULT_SCORING = Scoring()


@functools.partial(
    jax.jit, static_argnames=("band_radius", "match", "mismatch", "gap_open",
                              "gap_extend", "bonus"))
def banded_scores(
    text: jnp.ndarray,        # (T,) uint8 haplotype text codes
    reads: jnp.ndarray,       # (R, RL) uint8, padded with code 4/5
    reads_rc: jnp.ndarray,    # (R, RL) uint8 reverse complements (padded)
    rlen: jnp.ndarray,        # (R,) int32 true lengths
    cand_start: jnp.ndarray,  # (R, C) int32 window start in text (= diag - B)
    cand_lo: jnp.ndarray,     # (R, C) int32 haplotype text range of candidate
    cand_hi: jnp.ndarray,     # (R, C) int32
    cand_rev: jnp.ndarray,    # (R, C) bool — align reverse complement of read
    cand_valid: jnp.ndarray,  # (R, C) bool
    *,
    band_radius: int = 16,
    match: int = 1,
    mismatch: int = 4,
    gap_open: int = 6,
    gap_extend: int = 1,
    bonus: int = 5,
) -> jnp.ndarray:
    """Best semiglobal score per (read, candidate); -1 for invalid slots.

    Window length is RL + 2*band_radius; read row i may align to window
    columns [i, i + 2B], i.e. text positions diag + [-B, +B].
    """
    R, RL = reads.shape
    C = cand_start.shape[1]
    B = band_radius
    W = 2 * B + 1
    TW = RL + 2 * B

    # gather windows from text with haplotype-boundary masking
    pos = cand_start[:, :, None] + jnp.arange(TW, dtype=jnp.int32)  # (R,C,TW)
    in_range = (pos >= cand_lo[:, :, None]) & (pos < cand_hi[:, :, None])
    in_range &= (pos >= 0) & (pos < text.shape[0])
    win = jnp.where(in_range, text[jnp.clip(pos, 0, text.shape[0] - 1)],
                    jnp.uint8(SENTINEL))                             # (R,C,TW)

    # per-candidate oriented read
    rd = jnp.where(cand_rev[:, :, None], reads_rc[:, None, :],
                   reads[:, None, :])                                # (R,C,RL)

    # band slices of the window per read row: row i uses win[:, :, i : i+W]
    band_idx = jnp.arange(RL)[:, None] + jnp.arange(W)[None, :]      # (RL, W)
    win_rows = win[:, :, band_idx]                                   # (R,C,RL,W)
    win_rows = jnp.moveaxis(win_rows, 2, 0)                          # (RL,R,C,W)
    rd_rows = jnp.moveaxis(rd, 2, 0)                                 # (RL,R,C)

    neg = jnp.int32(NEG)
    H0 = jnp.full((R, C, W), bonus, dtype=jnp.int32)   # row 0: left bonus
    F0 = jnp.full((R, C, W), neg, dtype=jnp.int32)
    best0 = jnp.zeros((R, C), dtype=jnp.int32)         # soft-clip floor
    ext_ramp = gap_extend * jnp.arange(W, dtype=jnp.int32)

    def row(carry, xs):
        H_prev, F_prev, best, i = carry
        win_row, rd_row = xs                            # (R,C,W), (R,C)
        sub = jnp.where(win_row == rd_row[:, :, None],
                        jnp.int32(match), jnp.int32(-mismatch))
        sub = jnp.where(rd_row[:, :, None] >= 4, jnp.int32(-mismatch), sub)
        diag = H_prev + sub
        # F: gap in text (insertion in read): from (i-1, same j) = band k+1
        shift = jnp.concatenate(
            [H_prev[:, :, 1:], jnp.full((R, C, 1), neg, jnp.int32)], axis=2)
        fshift = jnp.concatenate(
            [F_prev[:, :, 1:], jnp.full((R, C, 1), neg, jnp.int32)], axis=2)
        F = jnp.maximum(shift - gap_open, fshift - gap_extend)
        H_nodel = jnp.maximum(jnp.maximum(diag, F), 0)  # 0 = fresh start (clip)
        # E: gap in read (deletion): exact via running max along band
        G = H_nodel + ext_ramp
        Gmax = jax.lax.associative_scan(jnp.maximum, G, axis=2)
        Gmax_prev = jnp.concatenate(
            [jnp.full((R, C, 1), neg, jnp.int32), Gmax[:, :, :-1]], axis=2)
        E = Gmax_prev - gap_open - ext_ramp + gap_extend
        H = jnp.maximum(H_nodel, E)
        # mask rows beyond the read's true length
        active = (i < rlen)[:, None, None]
        H = jnp.where(active, H, H_prev)
        F = jnp.where(active, F, F_prev)
        row_max = jnp.max(H, axis=2)
        # soft-clip-right option anywhere; full-length bonus at the last row
        best = jnp.maximum(best, jnp.where(i < rlen[:, None], row_max, best))
        at_end = (i + 1 == rlen)[:, None]
        best = jnp.maximum(best, jnp.where(at_end, row_max + bonus, neg))
        return (H, F, best, i + 1), None

    (H, F, best, _), _ = jax.lax.scan(
        row, (H0, F0, best0, jnp.int32(0)),
        (win_rows, rd_rows), length=RL)
    return jnp.where(cand_valid, best, jnp.int32(-1))


def gapless_mismatches(
    text: np.ndarray, read: np.ndarray, diag: int, lo: int, hi: int
) -> np.ndarray:
    """Host helper: mismatch mask of read vs text[diag : diag+len] (clipped
    to [lo, hi)); out-of-range counts as mismatch."""
    L = len(read)
    pos = diag + np.arange(L)
    ok = (pos >= lo) & (pos < hi)
    t = np.where(ok, text[np.clip(pos, 0, len(text) - 1)], SENTINEL)
    return (t != read) | (read >= 4)


@functools.partial(
    jax.jit, static_argnames=("band_radius", "gap_open", "gap_extend"))
def banded_scores_qual(
    text: jnp.ndarray, reads: jnp.ndarray, reads_rc: jnp.ndarray,
    quals: jnp.ndarray,          # (R, RL) uint8 phred (forward orientation)
    rlen: jnp.ndarray,
    cand_start: jnp.ndarray, cand_lo: jnp.ndarray, cand_hi: jnp.ndarray,
    cand_rev: jnp.ndarray, cand_valid: jnp.ndarray,
    match_tab: jnp.ndarray,      # (Q+1,) int32 per-quality match score
    mism_tab: jnp.ndarray,       # (Q+1,) int32 SIGNED mismatch score
    bonus_tab: jnp.ndarray,      # (Q+1,) int32 full-length bonus
    *,
    band_radius: int = 16,
    gap_open: int = 6,
    gap_extend: int = 1,
) -> jnp.ndarray:
    """banded_scores with base-quality-adjusted match/mismatch scores and
    full-length bonuses (the QualAdjAligner role, reference
    src/aligner.hpp:218; tables from vg_tpu.ops.qualadj). A low-quality
    base's mismatch costs little (an error was expected) and its match
    earns little. Gap costs stay unadjusted, as in the reference."""
    R, RL = reads.shape
    C = cand_start.shape[1]
    B = band_radius
    W = 2 * B + 1
    TW = RL + 2 * B

    pos = cand_start[:, :, None] + jnp.arange(TW, dtype=jnp.int32)
    in_range = (pos >= cand_lo[:, :, None]) & (pos < cand_hi[:, :, None])
    in_range &= (pos >= 0) & (pos < text.shape[0])
    win = jnp.where(in_range, text[jnp.clip(pos, 0, text.shape[0] - 1)],
                    jnp.uint8(SENTINEL))                         # (R,C,TW)
    rd = jnp.where(cand_rev[:, :, None], reads_rc[:, None, :],
                   reads[:, None, :])                            # (R,C,RL)
    # oriented per-base quality: reverse orientation flips the vector
    # (pad columns beyond rlen read qual 0 -> scores 0, masked by rows)
    ridx = jnp.arange(RL, dtype=jnp.int32)
    qrev_idx = jnp.clip(rlen[:, None] - 1 - ridx[None, :], 0, RL - 1)
    quals_rc = jnp.take_along_axis(quals, qrev_idx, axis=1)
    qd = jnp.where(cand_rev[:, :, None], quals_rc[:, None, :],
                   quals[:, None, :])                            # (R,C,RL)
    q_i = jnp.clip(qd.astype(jnp.int32), 0, match_tab.shape[0] - 1)
    mt = match_tab[q_i]                                          # (R,C,RL)
    mm = mism_tab[q_i]

    band_idx = jnp.arange(RL)[:, None] + jnp.arange(W)[None, :]
    win_rows = jnp.moveaxis(win[:, :, band_idx], 2, 0)           # (RL,R,C,W)
    rd_rows = jnp.moveaxis(rd, 2, 0)                             # (RL,R,C)
    mt_rows = jnp.moveaxis(mt, 2, 0)
    mm_rows = jnp.moveaxis(mm, 2, 0)

    neg = jnp.int32(NEG)
    # left full-length bonus at the first oriented base's quality
    bfirst = bonus_tab[q_i[:, :, 0]]                             # (R,C)
    qlast = jnp.take_along_axis(
        q_i, jnp.clip(rlen[:, None, None] - 1, 0, RL - 1), axis=2)[:, :, 0]
    blast = bonus_tab[qlast]                                     # (R,C)
    H0 = jnp.broadcast_to(bfirst[:, :, None], (R, C, W)).astype(jnp.int32)
    F0 = jnp.full((R, C, W), neg, jnp.int32)
    best0 = jnp.zeros((R, C), jnp.int32)
    ext_ramp = gap_extend * jnp.arange(W, dtype=jnp.int32)

    def row(carry, xs):
        H_prev, F_prev, best, i = carry
        win_row, rd_row, mt_row, mm_row = xs
        sub = jnp.where(win_row == rd_row[:, :, None],
                        mt_row[:, :, None], mm_row[:, :, None])
        sub = jnp.where(rd_row[:, :, None] >= 4, mm_row[:, :, None], sub)
        diag = H_prev + sub
        shift = jnp.concatenate(
            [H_prev[:, :, 1:], jnp.full((R, C, 1), neg, jnp.int32)], axis=2)
        fshift = jnp.concatenate(
            [F_prev[:, :, 1:], jnp.full((R, C, 1), neg, jnp.int32)], axis=2)
        F = jnp.maximum(shift - gap_open, fshift - gap_extend)
        H_nodel = jnp.maximum(jnp.maximum(diag, F), 0)
        G = H_nodel + ext_ramp
        Gmax = jax.lax.associative_scan(jnp.maximum, G, axis=2)
        Gmax_prev = jnp.concatenate(
            [jnp.full((R, C, 1), neg, jnp.int32), Gmax[:, :, :-1]], axis=2)
        E = Gmax_prev - gap_open - ext_ramp + gap_extend
        H = jnp.maximum(H_nodel, E)
        active = (i < rlen)[:, None, None]
        H = jnp.where(active, H, H_prev)
        F = jnp.where(active, F, F_prev)
        row_max = jnp.max(H, axis=2)
        best = jnp.maximum(best, jnp.where(i < rlen[:, None], row_max, best))
        at_end = (i + 1 == rlen)[:, None]
        best = jnp.maximum(best, jnp.where(at_end, row_max + blast, neg))
        return (H, F, best, i + 1), None

    (H, F, best, _), _ = jax.lax.scan(
        row, (H0, F0, best0, jnp.int32(0)),
        (win_rows, rd_rows, mt_rows, mm_rows), length=RL)
    return jnp.where(cand_valid, best, jnp.int32(-1))
