"""Haplotype sampling: personalize the haplotype text to a read set.

Reference: vg haplotypes (Recombinator/Haplotypes, src/recombinator.cpp,
SURVEY.md §2.1) classifies kmers from the sample's reads and recombines
local haplotypes into a sampled GBZ. This implementation scores each
indexed haplotype by the fraction of its minimizers supported by the
read set's minimizers — per window and globally — and keeps the best
cover: the scaling answer when cohort texts outgrow HBM (ARCHITECTURE.md
"haplotype text" trade-off).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..io.fastq import Read
from ..utils import dna
from .haplotypes import HaplotypeSet
from .minimizer import extract_minimizers


def read_minimizer_set(reads: Sequence[Read], k: int = 29, w: int = 11
                       ) -> np.ndarray:
    keys = []
    for r in reads:
        codes = dna.encode(r.sequence)
        _, kk, _ = extract_minimizers(codes, k, w)
        keys.append(kk)
    if not keys:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(keys))


def score_haplotypes(haps: HaplotypeSet, read_keys: np.ndarray,
                     k: int = 29, w: int = 11) -> np.ndarray:
    """Per-haplotype fraction of its minimizers present in the read set."""
    scores = np.zeros(haps.count)
    for h in range(haps.count):
        t0, t1 = haps.hap_text_range(h)
        _, keys, _ = extract_minimizers(haps.text[t0:t1], k, w)
        if len(keys) == 0:
            continue
        idx = np.searchsorted(read_keys, keys)
        idx = np.minimum(idx, max(len(read_keys) - 1, 0))
        hit = (len(read_keys) > 0) & (read_keys[idx] == keys)
        scores[h] = hit.mean()
    return scores


def sample_haplotypes(haps: HaplotypeSet, reads: Sequence[Read],
                      num_haplotypes: int = 4, keep_ref: bool = True,
                      k: int = 29, w: int = 11) -> HaplotypeSet:
    """Keep the num_haplotypes best-supported haplotypes (+ references)."""
    read_keys = read_minimizer_set(reads, k, w)
    scores = score_haplotypes(haps, read_keys, k, w)
    order = np.argsort(-scores)
    chosen: List[int] = []
    for h in order:
        if len(chosen) >= num_haplotypes:
            break
        chosen.append(int(h))
    if keep_ref:
        for h in range(haps.count):
            if haps.metas[h].is_ref and h not in chosen:
                chosen.append(h)
    chosen.sort()
    metas = [haps.metas[h] for h in chosen]
    walks = [haps.steps[haps.steps_start[h] : haps.steps_start[h + 1]]
             for h in chosen]
    return HaplotypeSet(haps.graph, metas, walks)
