"""Mapping quality from candidate score sets.

Implements the reference's exact MAPQ model (reference:
src/mapping_quality_calculator.cpp:26-132 via GSSWAligner::
maximum_mapping_quality_exact): scores are scaled into log-likelihood space
by the Gumbel lambda of the scoring matrix, the posterior of the best
candidate is computed with a log-sum-exp over all candidates, and
mapq = -10*log10(1 - posterior), clamped (giraffe caps at 60 in practice).

log_base (lambda) solves sum_ij p_i p_j exp(lambda * s_ij) = 1 for the
match/mismatch matrix at the given GC content (reference: GSSWAligner::
gssw_dna_recover_log_base; match=1, mismatch=4, gc=0.5 gives
lambda ~= 1.36).
"""
from __future__ import annotations

import functools
import math
from typing import Sequence

import numpy as np


@functools.lru_cache(maxsize=None)
def log_base(match: int = 1, mismatch: int = 4, gc_content: float = 0.5) -> float:
    """Gumbel lambda for a uniform match/mismatch matrix (bisection)."""
    p_match = (gc_content / 2) ** 2 * 2 + ((1 - gc_content) / 2) ** 2 * 2
    # probability two random bases are equal; mismatch otherwise
    def f(lam: float) -> float:
        return (p_match * math.exp(lam * match)
                + (1 - p_match) * math.exp(-lam * mismatch) - 1.0)
    lo, hi = 1e-6, 10.0
    for _ in range(100):
        mid = (lo + hi) / 2
        if f(mid) > 0:
            hi = mid
        else:
            lo = mid
    return (lo + hi) / 2


QUAL_SCALE = 10.0 / math.log(10.0)


def mapq_exact(scores: Sequence[float], which: int = 0,
               match: int = 1, mismatch: int = 4,
               max_mapq: int = 60,
               score_scale: float = 1.0,
               score_window: float = 0.0,
               min_mapq0_score: float = 0.0) -> int:
    """Phred-scaled probability that candidate `which` is wrong.

    The long-read preset knobs (reference giraffe_main.cpp:957-1072 /
    minimizer_mapper.hpp:397-404): score_scale multiplies the scaled
    scores (hifi: 0.001), score_window restricts the posterior to
    scores within the window of the best (r10: 150; 0 = all), and a
    winner below min_mapq0_score gets mapq 0 (r10: 67)."""
    s = np.asarray(scores, dtype=np.float64)
    if len(s) == 0:
        return 0
    if min_mapq0_score > 0 and s[which] < min_mapq0_score:
        return 0
    if score_window > 0:
        keep = (s >= s.max() - score_window) | (
            np.arange(len(s)) == which)
        s = s[keep]
        which = int(np.searchsorted(np.nonzero(keep)[0], which))
    lam = log_base(match, mismatch) * score_scale
    scaled = s * lam
    m = scaled.max()
    lse = m + math.log(np.exp(scaled - m).sum())
    delta = scaled[which] - lse   # log posterior, <= 0
    if delta >= 0:
        return max_mapq
    # log(1 - e^delta)
    one_minus = math.log1p(-math.exp(delta)) if delta < -1e-15 else -50.0
    mapq = -QUAL_SCALE * one_minus
    if not math.isfinite(mapq):
        mapq = max_mapq
    return int(min(max(mapq, 0.0), max_mapq))
