"""Base-quality-adjusted alignment scoring (the QualAdjAligner role).

The reference scales its score matrix per base quality
(src/aligner.hpp:218, derivation in src/alignment_scorer.cpp:438-515
``qual_adjusted_matrix`` / ``qual_adjusted_bonuses``): treat the scores
as log-odds under an HMM whose align-state emission probabilities are
recovered from the unadjusted matrix, mix in the base error rate
err = 10^(-q/10) (an erroneous base is uniform over the other three),
and convert back to integer scores in the same log base. mpmap always
aligns quality-adjusted; vg map does when the input has qualities
(SURVEY.md "What's missing" r2 item 3).

With the default matrix (match=1, mismatch=-4, gc=0.5) the 4x4 matrix
collapses to one adjusted match and one adjusted mismatch value per
quality, so the tables here are 1-D per-quality vectors the DP gathers
per read base.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

MAX_QUAL = 60


def recover_log_base(match: int, mismatch: int, gc_content: float = 0.5,
                     tol: float = 1e-12) -> float:
    """The lambda such that sum_ij f_i f_j exp(lambda*S_ij) == 1 (the
    reference recovers it from the score matrix the same way,
    deps/gssw gssw_dna_recover_log_base; bisection)."""
    f = np.array([0.5 * (1 - gc_content), 0.5 * gc_content,
                  0.5 * gc_content, 0.5 * (1 - gc_content)])
    S = np.full((4, 4), -float(mismatch))
    np.fill_diagonal(S, float(match))

    def val(lam):
        return float((np.outer(f, f) * np.exp(lam * S)).sum()) - 1.0

    lo, hi = 1e-6, 10.0
    while val(hi) < 0:
        hi *= 2
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if val(mid) < 0:
            lo = mid
        else:
            hi = mid
        if hi - lo < tol:
            break
    return 0.5 * (lo + hi)


@lru_cache(maxsize=8)
def qual_tables(match: int = 1, mismatch: int = 4, bonus: int = 5,
                gc_content: float = 0.5, max_qual: int = MAX_QUAL
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(match_q, mismatch_q, bonus_q) int32 vectors indexed by base
    quality 0..max_qual. mismatch_q is SIGNED (negative = penalty).
    Exact port of src/alignment_scorer.cpp:438-515."""
    lam = recover_log_base(match, mismatch, gc_content)
    f = np.array([0.5 * (1 - gc_content), 0.5 * gc_content,
                  0.5 * gc_content, 0.5 * (1 - gc_content)])
    S = np.full((4, 4), -float(mismatch))
    np.fill_diagonal(S, float(match))
    align_prob = np.exp(lam * S) * np.outer(f, f)              # (4,4)
    # sum of emission probs under a base error (true base k != observed j)
    comp = np.zeros((4, 4))
    for i in range(4):
        for j in range(4):
            comp[i, j] = sum(align_prob[i, k] for k in range(4) if k != j)

    lowest_meaningful = int(np.ceil(-10.0 * np.log10(0.75)))
    q = np.arange(max_qual + 1, dtype=np.float64)
    err = np.power(10.0, -q / 10.0)

    def adj(i, j):
        num = (1.0 - err) * align_prob[i, j] + (err / 3.0) * comp[i, j]
        den = f[i] * ((1.0 - err) * f[j] + (err / 3.0) * (1.0 - f[j]))
        s = np.round(np.log(num / den) / lam)
        s[q < lowest_meaningful] = 0
        return s

    match_q = adj(0, 0).astype(np.int32)          # gc=0.5: all diag equal
    mismatch_q = adj(0, 1).astype(np.int32)       # all off-diag equal

    # full-length bonus per quality (alignment_scorer.cpp:494-513)
    p_full = np.exp(lam * bonus) / (1.0 + np.exp(lam * bonus))
    bq = np.zeros(max_qual + 1, np.int32)
    lm = lowest_meaningful + 1      # reference's illumina-q2 hack
    qq = np.arange(lm, max_qual + 1, dtype=np.float64)
    e2 = np.power(10.0, -qq / 10.0)
    bscore = np.log(((1.0 - e2 * 4.0 / 3.0) * p_full
                     + (e2 * 4.0 / 3.0) * (1.0 - p_full))
                    / (1.0 - p_full)) / lam
    bq[lm:] = np.round(bscore).astype(np.int32)
    return match_q, mismatch_q, bq


def parse_quality(qual: str) -> np.ndarray:
    """FASTQ quality string -> phred uint8 vector. Raw phred (clipped
    only to the sanger range): the MAPQ cap uses true error
    probabilities; score-table lookups clip to MAX_QUAL themselves."""
    q = np.frombuffer(qual.encode(), np.uint8).astype(np.int32) - 33
    return np.clip(q, 0, 93).astype(np.uint8)
