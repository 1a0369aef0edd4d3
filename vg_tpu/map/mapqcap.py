"""MAPQ caps from explored minimizers and base qualities.

Port of giraffe's ``faster_cap`` (reference src/minimizer_mapper.cpp:2940
``faster_cap``, :3082 ``for_each_agglomeration_interval``, :3157/:3202
interval/column disruption probabilities; applied at :1161-1172): the
mapping quality of a read cannot exceed the phred-scaled probability
that base errors could have disrupted EVERY minimizer that led to the
winning alignment. Without that cap, a read whose handful of seeds are
all on low-quality bases can reach mapq 60 on posterior alone — the
caps are where giraffe's real-world calibration comes from (round-2
verdict item 5).

A minimizer instance is "disrupted" by an error inside its core kmer
(always), or by an error in its agglomeration flank IF the new kmer the
error creates hashes below the minimizer (probability hash/2^64 per
candidate position). The cheapest way to disrupt all explored
minimizers is found by the reference's interval-sweep DP over
agglomeration overlaps, reproduced here verbatim in numpy/python (runs
host-side per winner; ~30 minimizers per read).

Reads without base qualities get an infinite cap, exactly like the
reference (faster_cap returns +inf when quality_bytes is empty).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..index.minimizer import _rolling_kmers, wang_hash_64

_U64_MAX = float(2.0 ** 64)


def minimizer_agglomerations(codes: np.ndarray, k: int, w: int
                             ) -> Tuple[np.ndarray, np.ndarray,
                                        np.ndarray, np.ndarray]:
    """Selected minimizers with their agglomeration extents: the run of
    read bases covered by every window in which each selected kmer is
    minimal (the reference tracks this during find_minimizers,
    src/minimizer_mapper.cpp:3910). Returns (offsets, hashes,
    agg_start, agg_len)."""
    n = len(codes)
    if n < k:
        z = np.zeros(0, np.int64)
        return z, np.zeros(0, np.uint64), z, z, np.zeros(0, np.uint64)
    fwd, rev, valid = _rolling_kmers(codes, k)
    keys = np.where(rev < fwd, rev, fwd)
    hashes = wang_hash_64(keys)
    INVALID = np.uint64(0xFFFFFFFFFFFFFFFF)
    hashes = np.where(valid, hashes, INVALID)
    m = len(hashes)
    w_eff = min(w, m)
    nw = m - w_eff + 1
    mins = hashes[:nw].copy()
    for j in range(1, w_eff):
        np.minimum(mins, hashes[j : j + nw], out=mins)
    first_w = np.full(m, 1 << 30, np.int64)
    last_w = np.full(m, -1, np.int64)
    t = np.arange(nw)
    for j in range(w_eff):
        eq = hashes[j : j + nw] == mins
        sel = t[eq] + j
        first_w[sel] = np.minimum(first_w[sel], t[eq])
        last_w[sel] = np.maximum(last_w[sel], t[eq])
    chosen = (last_w >= 0) & valid
    offs = np.nonzero(chosen)[0].astype(np.int64)
    agg_start = first_w[offs]
    agg_len = (last_w[offs] + w_eff - 1 + k) - agg_start
    return offs, hashes[offs], agg_start, agg_len, keys[offs]


def _prob_for_at_least_one(hash_val: float, n: int) -> float:
    """P(at least one of n fresh uniform hashes beats hash_val)."""
    p_beat = min(hash_val / _U64_MAX, 1.0)
    return 1.0 - (1.0 - p_beat) ** n


def _col_prob(idx: int, quals: np.ndarray, mins: List[dict]) -> float:
    """Probability an error at read column idx disrupts every minimizer
    in `mins` (reference get_prob_of_disruption_in_column)."""
    p = 10.0 ** (-float(quals[idx]) / 10.0)
    for mn in mins:
        core_start = mn["off"]
        if core_start <= idx < core_start + mn["k"]:
            continue   # inside the core kmer: disrupted outright
        possible = min(mn["k"],
                       idx - mn["agg_start"] + 1,
                       (mn["agg_start"] + mn["agg_len"]) - idx)
        p *= _prob_for_at_least_one(mn["hash"], max(possible, 0))
    return p


def faster_cap(offs, hashes, agg_start, agg_len, k: int,
               quals: np.ndarray) -> float:
    """Phred cap = -10*log10 of the max-probability way base errors
    disrupt every explored minimizer. Exact port of the reference's
    sorted interval sweep + DP (src/minimizer_mapper.cpp:2940-3080)."""
    n = len(offs)
    if n == 0 or quals is None or len(quals) == 0:
        return float("inf")
    mins = [{"off": int(offs[i]), "k": k, "hash": float(hashes[i]),
             "agg_start": int(agg_start[i]),
             "agg_len": int(agg_len[i])} for i in range(n)]
    mins.sort(key=lambda m: (m["agg_start"] + m["agg_len"],
                             m["agg_start"]))

    c = np.full(n + 1, -np.inf)
    c[0] = 0.0

    def interval(left: int, right: int, bottom: int, top: int) -> None:
        if left >= right:
            return
        group = mins[bottom:top]
        p = _col_prob(left, quals, group)
        for i in range(left + 1, right):
            cp = _col_prob(i, quals, group)
            p = p + cp - p * cp            # OR, independence-approx
        p_here = np.log10(p) if p > 0 else -np.inf
        val = c[bottom] + p_here
        for i in range(bottom + 1, top + 1):
            if c[i] < val:
                c[i] = val

    # interval sweep over agglomeration overlaps (reference
    # for_each_agglomeration_interval stack algorithm)
    stack = [mins[0]]
    left = mins[0]["agg_start"]
    bottom = 0
    read_len = len(quals)

    def emit_preceding(right: int) -> None:
        nonlocal left, bottom, stack
        while left < right:
            top_end = stack[0]["agg_start"] + stack[0]["agg_len"]
            if top_end <= right:
                interval(left, top_end, bottom, bottom + len(stack))
                left = right if len(stack) == 1 else top_end
                bottom += 1
                stack.pop(0)
            else:
                interval(left, right, bottom, bottom + len(stack))
                left = right

    for mn in mins[1:]:
        emit_preceding(mn["agg_start"])
        stack.append(mn)
    emit_preceding(read_len)

    return float(-10.0 * c[-1]) if np.isfinite(c[-1]) else float("inf")


def explored_cap(codes: np.ndarray, quals, k: int, w: int,
                 count_fn=None) -> float:
    """Convenience: agglomerations + faster_cap for one read. When
    `count_fn` (keys -> hit counts, e.g. MinimizerIndex.count) is
    given, minimizers absent from the index are excluded — they can't
    have contributed seeds (our analog of the reference's explored
    set; the reference tracks explored membership exactly,
    minimizer_mapper.cpp:1155-1160)."""
    if quals is None or (hasattr(quals, "__len__") and len(quals) == 0):
        return float("inf")
    offs, hashes, a_start, a_len, keys = minimizer_agglomerations(
        codes, k, w)
    if count_fn is not None and len(keys):
        keep = np.asarray(count_fn(keys)) > 0
        offs, hashes = offs[keep], hashes[keep]
        a_start, a_len = a_start[keep], a_len[keep]
    return faster_cap(offs, hashes, a_start, a_len, k, np.asarray(quals))
