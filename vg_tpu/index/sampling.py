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


def _fragment_score(haps: HaplotypeSet, g0: int, g1: int,
                    read_keys: np.ndarray, k: int, w: int) -> float:
    """Read support of the text spelled by global steps [g0, g1)."""
    t0 = int(haps.step_text_pos[g0])
    t1 = int(haps.step_text_pos[g1])
    if t1 - t0 < k:
        return 0.0
    _, keys, _ = extract_minimizers(haps.text[t0:t1], k, w)
    if len(keys) == 0 or len(read_keys) == 0:
        return 0.0
    idx = np.minimum(np.searchsorted(read_keys, keys), len(read_keys) - 1)
    return float((read_keys[idx] == keys).mean())


def recombine_haplotypes(haps: HaplotypeSet, reads: Sequence[Read],
                         num_haplotypes: int = 2,
                         subchain_len: int = 10_000,
                         k: int = 29, w: int = 11) -> HaplotypeSet:
    """Per-subchain recombination (reference: Recombinator,
    src/recombinator.cpp — kmer-classified per-subchain haplotype
    selection stitched into synthetic sampled haplotypes).

    Crossover anchors are handles every indexed haplotype of a contig
    visits exactly once (the subchain boundary nodes of the snarl chain);
    anchors are kept >= subchain_len bp apart. Within each subchain, every
    haplotype's fragment is scored by the fraction of its minimizers
    supported by the read set, and output j stitches the rank-j fragment
    of every subchain — so the top output is the locally best-supported
    mosaic. Junction edges exist by construction: each fragment ends on
    the step preceding a shared anchor."""
    read_keys = read_minimizer_set(reads, k, w)

    # group haplotypes by contig
    groups: dict = {}
    for h in range(haps.count):
        groups.setdefault(haps.metas[h].contig, []).append(h)

    out_metas: List = []
    out_walks: List[np.ndarray] = []
    from .haplotypes import HaplotypeMeta

    for contig, members in groups.items():
        walks = [haps.steps[haps.steps_start[h] : haps.steps_start[h + 1]]
                 for h in members]
        if len(members) == 1:
            out_metas.append(haps.metas[members[0]])
            out_walks.append(walks[0])
            continue
        # anchors: handles visited exactly once by every member haplotype
        once = None
        for wk in walks:
            u, c = np.unique(wk, return_counts=True)
            s = set(u[c == 1].tolist())
            once = s if once is None else (once & s)
        # order + occurrence index along each walk
        occ = [{int(h): i for i, h in enumerate(wk)} for wk in walks]
        w0 = walks[0]
        anchors = [i for i, h in enumerate(w0) if int(h) in once]
        # thin anchors to >= subchain_len bp apart (text pos of hap 0)
        base = int(haps.steps_start[members[0]])
        tp = haps.step_text_pos
        kept: List[int] = []
        last = -subchain_len
        for i in anchors:
            pos = int(tp[base + i])
            if pos - last >= subchain_len:
                kept.append(i)
                last = pos
        cut_handles = [int(w0[i]) for i in kept
                       if 0 < i < len(w0) - 1]

        # fragments per haplotype: [start..anchor1), [anchor1..anchor2)...
        n_sub = len(cut_handles) + 1
        frag_bounds = []          # per member: list of (g0, g1) global steps
        for mi, h in enumerate(members):
            gbase = int(haps.steps_start[h])
            cuts = [occ[mi][ch] for ch in cut_handles]
            if cuts != sorted(cuts):      # order disagreement: bail to copy
                frag_bounds = None
                break
            bounds = [0] + cuts + [len(walks[mi])]
            frag_bounds.append([(gbase + a, gbase + b)
                                for a, b in zip(bounds[:-1], bounds[1:])])
        if frag_bounds is None or n_sub == 1:
            order = np.argsort([-_fragment_score(
                haps, int(haps.steps_start[h]),
                int(haps.steps_start[h + 1]), read_keys, k, w)
                for h in members])
            for j in range(min(num_haplotypes, len(members))):
                h = members[int(order[j])]
                out_metas.append(haps.metas[h])
                out_walks.append(walks[int(order[j])])
            continue

        # score each (subchain, member) fragment, rank per subchain
        scores = np.array([[_fragment_score(haps, g0, g1, read_keys, k, w)
                            for (g0, g1) in fb] for fb in frag_bounds])
        rank = np.argsort(-scores, axis=0, kind="stable")   # (member, sub)
        for j in range(min(num_haplotypes, len(members))):
            pieces = []
            for s in range(n_sub):
                mi = int(rank[j, s])
                g0, g1 = frag_bounds[mi][s]
                pieces.append(haps.steps[g0:g1])
            out_walks.append(np.concatenate(pieces))
            out_metas.append(HaplotypeMeta(
                name=f"recomb#{j}#{contig}" if contig else f"recomb#{j}",
                sample="recomb", phase=j, contig=contig))
    return HaplotypeSet(haps.graph, out_metas, out_walks)
