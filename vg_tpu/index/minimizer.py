"""Minimizer index over the haplotype text.

Reference behavior: gbwtgraph::DefaultMinimizerIndex — (k=29, w=11)
minimizers of all haplotype windows, canonical (min of forward/revcomp
encodings), selected by minimum wang-hash within each window of w
consecutive kmers; built by vg minimizer (src/subcommand/minimizer_main.cpp,
SURVEY.md §2.1 "Minimizer seeding").

Here the index maps minimizer keys to *haplotype text positions*. Because
identical haplotype stretches repeat across a cohort, occurrences that land
on the same graph placement are deduplicated, keeping up to
``max_alt_positions`` distinct text positions so extension can still explore
divergent haplotype contexts (the GBWT would enumerate all of them).

Extraction is vectorized numpy on the host (reads are host-resident when
seeding happens, like tokenization in an ML input pipeline); lookup is a
binary search over a sorted key array, exposed both host-side and as device
arrays for an on-device variant.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .haplotypes import HaplotypeSet

DEFAULT_K = 29
DEFAULT_W = 11


def minimizer_score_table(hard_hit_cap: int, n: int) -> np.ndarray:
    """Quantized minimizer scores: score(c) = max(1, 1 + ln(hard_hit_cap)
    - ln(c)) rounded to the nearest 1/256 (reference policy:
    src/minimizer_mapper.cpp:3918-3931). Quantizing makes cluster-score
    sums EXACT in float32 regardless of summation order, so the host f64
    sequential accumulation, XLA scatter-add, and the Pallas segmented
    reduce (ops/pallas_seed.py) agree bitwise and candidate tie-breaks
    stay deterministic across engines. Entry 0 = 0 (no hits)."""
    c = np.arange(n + 1, dtype=np.float64)
    s = 1.0 + np.log(float(hard_hit_cap)) - np.log(np.maximum(c, 1.0))
    s = np.maximum(s, 1.0)
    s[0] = 0.0
    return (np.round(s * 256.0) / 256.0).astype(np.float32)


def wang_hash_64(x: np.ndarray) -> np.ndarray:
    """Thomas Wang's 64-bit integer hash (as used by gbwtgraph's Key64)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (~x) + (x << np.uint64(21))
        x = x ^ (x >> np.uint64(24))
        x = (x + (x << np.uint64(3))) + (x << np.uint64(8))
        x = x ^ (x >> np.uint64(14))
        x = (x + (x << np.uint64(2))) + (x << np.uint64(4))
        x = x ^ (x >> np.uint64(28))
        x = x + (x << np.uint64(31))
    return x


def _rolling_kmers(codes: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Forward and reverse-complement 2-bit packed kmers at every start
    position (length n-k+1). Positions containing N are marked invalid
    (returned mask)."""
    n = len(codes)
    if n < k:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64), np.zeros(0, bool)
    valid_base = codes < 4
    c2 = np.where(valid_base, codes, 0).astype(np.uint64)
    m = n - k + 1
    # k shifted-OR passes over length-m slices: no (m, k) temporaries
    fwd = np.zeros(m, np.uint64)
    rev = np.zeros(m, np.uint64)
    three = np.uint64(3)
    for j in range(k):
        sl = c2[j : j + m]
        fwd |= sl << np.uint64(2 * (k - 1 - j))
        rev |= (three - sl) << np.uint64(2 * j)
    bad = (~valid_base).astype(np.int32)
    cs = np.zeros(n + 1, np.int64)
    np.cumsum(bad, out=cs[1:])
    valid = (cs[k:] - cs[:-k]) == 0
    return fwd, rev, valid


def extract_minimizers(codes: np.ndarray, k: int = DEFAULT_K, w: int = DEFAULT_W,
                       frequent: Optional[np.ndarray] = None,
                       weight_iterations: int = 3
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (k,w) minimizers of a code sequence (native C++ kernel when
    available, numpy fallback).

    Returns (offsets, keys, is_rev): start offsets of selected kmers, the
    canonical keys, and whether the canonical key is the reverse-complement
    of the forward strand at that offset. A kmer is selected if it achieves
    the minimum hash in any window of w consecutive kmers (all ties kept,
    matching gbwtgraph's "all minimizers" enumeration). `frequent` (a
    sorted uint64 key set) enables weighted-minimizer downweighting
    (apply_kmer_weights) — numpy path only.
    """
    n = len(codes)
    if n < k:
        return (np.zeros(0, np.int64), np.zeros(0, np.uint64), np.zeros(0, bool))
    from ..native import lib, native_extract_minimizers

    if lib() is not None and frequent is None:
        return native_extract_minimizers(np.asarray(codes, np.uint8), k, w)
    fwd, rev, valid = _rolling_kmers(codes, k)
    canon_rev = rev < fwd
    keys = np.where(canon_rev, rev, fwd)
    hashes = wang_hash_64(keys)
    if frequent is not None:
        hashes = apply_kmer_weights(hashes, keys, frequent,
                                    weight_iterations)
    INVALID = np.uint64(0xFFFFFFFFFFFFFFFF)
    hashes = np.where(valid, hashes, INVALID)
    m = len(hashes)
    w_eff = min(w, m)
    nw = m - w_eff + 1
    # window minima via w shifted minimum passes (no (nw, w) temporary)
    mins = hashes[:nw].copy()
    for j in range(1, w_eff):
        np.minimum(mins, hashes[j : j + nw], out=mins)
    # a kmer is chosen if its hash equals the min of any window containing it
    chosen = np.zeros(m, dtype=bool)
    for j in range(w_eff):
        sl = slice(j, j + nw)
        chosen[sl] |= hashes[sl] == mins
    chosen &= valid
    offs = np.nonzero(chosen)[0].astype(np.int64)
    return offs, keys[offs], canon_rev[offs]


def extract_minimizers_batch(codes2d: np.ndarray, k: int = DEFAULT_K,
                             w: int = DEFAULT_W,
                             frequent: Optional[np.ndarray] = None,
                             weight_iterations: int = 3
                             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                        np.ndarray]:
    """(k,w) minimizers for a batch of equal-length reads at once.

    codes2d: (R, L) uint8. Returns flat (read_idx, offsets, keys, is_rev),
    identical per read to extract_minimizers().
    """
    R, L = codes2d.shape
    if L < k:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.uint64), np.zeros(0, bool)
    from ..native import lib as _nlib, native_extract_minimizers_batch

    if _nlib() is not None and frequent is None:
        res = native_extract_minimizers_batch(
            np.asarray(codes2d, np.uint8), k, w)
        if res is not None:
            return res
    from numpy.lib.stride_tricks import sliding_window_view

    valid_base = codes2d < 4
    c2 = np.where(valid_base, codes2d, 0).astype(np.uint64)
    m = L - k + 1
    # rolling 2-bit pack: O(L) column passes, no (R, m, k) temporaries
    fwd = np.empty((R, m), np.uint64)
    rev = np.empty((R, m), np.uint64)
    mask = np.uint64((1 << (2 * k)) - 1)
    two = np.uint64(2)
    topshift = np.uint64(2 * (k - 1))
    three = np.uint64(3)
    cur_f = np.zeros(R, np.uint64)
    cur_r = np.zeros(R, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(L):
            cj = c2[:, j]
            cur_f = ((cur_f << two) | cj) & mask
            cur_r = (cur_r >> two) | ((three - cj) << topshift)
            if j >= k - 1:
                fwd[:, j - k + 1] = cur_f
                rev[:, j - k + 1] = cur_r
    # validity: window contains no N
    bad = (~valid_base).astype(np.int32)
    cs = np.zeros((R, L + 1), np.int32)
    np.cumsum(bad, axis=1, out=cs[:, 1:])
    valid = (cs[:, k:] - cs[:, :-k]) == 0              # (R, m)
    canon_rev = rev < fwd
    keys = np.where(canon_rev, rev, fwd)
    hashes = wang_hash_64(keys)
    if frequent is not None:
        hashes = apply_kmer_weights(hashes.ravel(), keys.ravel(), frequent,
                                    weight_iterations).reshape(hashes.shape)
    INVALID = np.uint64(0xFFFFFFFFFFFFFFFF)
    hashes = np.where(valid, hashes, INVALID)
    m = hashes.shape[1]
    w_eff = min(w, m)
    wins = sliding_window_view(hashes, w_eff, axis=1)  # (R, m-w+1, w)
    mins = wins.min(axis=2)
    chosen = np.zeros((R, m), dtype=bool)
    eq = wins == mins[:, :, None]
    ri, wi, ki = np.nonzero(eq)
    chosen[ri, wi + ki] = True
    chosen &= valid
    ridx, offs = np.nonzero(chosen)
    return (ridx.astype(np.int64), offs.astype(np.int64),
            keys[ridx, offs], canon_rev[ridx, offs])


DEFAULT_SMER = 18          # reference IndexingParameters::minimizer_s
WEIGHT_THRESHOLD = 500     # MinimizerIndexParameters::DEFAULT_THRESHOLD
WEIGHT_ITERATIONS = 3      # MinimizerIndexParameters::DEFAULT_ITERATIONS
_WEIGHT_TOPBIT = np.uint64(1) << np.uint64(63)


def apply_kmer_weights(hashes: np.ndarray, keys: np.ndarray,
                       frequent_sorted: Optional[np.ndarray],
                       iterations: int = WEIGHT_ITERATIONS) -> np.ndarray:
    """Weighted-minimizer hash adjustment (the role of gbwtgraph's
    add_frequent_kmers behind `vg minimizer -W`,
    src/subcommand/minimizer_main.cpp / gbwtgraph_helper.cpp:580-583 —
    winnowmap-style downweighting of over-represented kmers so they stop
    winning window elections and flooding the hit lists). Our scheme:
    a frequent kmer's hash is re-hashed `iterations` times and forced
    into the top half of the hash space, so it is selected only when a
    window contains nothing else. Must be applied identically at index
    build and read seeding (both call this)."""
    if frequent_sorted is None or len(frequent_sorted) == 0:
        return hashes
    keys = np.asarray(keys, np.uint64)
    i = np.searchsorted(frequent_sorted, keys)
    i = np.minimum(i, len(frequent_sorted) - 1)
    freq = frequent_sorted[i] == keys
    if not freq.any():
        return hashes
    out = hashes.copy()
    hw = out[freq]
    for _ in range(iterations):
        hw = wang_hash_64(hw)
    out[freq] = hw | _WEIGHT_TOPBIT
    return out


def _windowed_min(h: np.ndarray, span: int) -> np.ndarray:
    """Min over [i, i+span) for each window start i (1-D)."""
    nw = len(h) - span + 1
    mins = h[:nw].copy()
    for j in range(1, span):
        np.minimum(mins, h[j : j + nw], out=mins)
    return mins


def extract_syncmers(codes: np.ndarray, k: int,
                     s: int = DEFAULT_SMER
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Closed syncmers (`vg minimizer -c`, reference
    src/subcommand/minimizer_main.cpp:147-149, gbwtgraph syncmer index):
    a kmer is selected iff the minimum-hash s-mer inside it sits at the
    FIRST or LAST of its k-s+1 positions. Selection is computed on the
    canonical orientation of each kmer; because reversal maps end
    positions to end positions, the rule is strand-symmetric and both
    strands of a match select the same kmers. Returns (offsets, keys,
    is_rev) like extract_minimizers."""
    n = len(codes)
    if n < k:
        return (np.zeros(0, np.int64), np.zeros(0, np.uint64),
                np.zeros(0, bool))
    fwd, rev, valid = _rolling_kmers(codes, k)
    canon_rev = rev < fwd
    keys = np.where(canon_rev, rev, fwd)
    sf, sr, _sv = _rolling_kmers(codes, s)
    hf = wang_hash_64(sf)
    hr = wang_hash_64(sr)
    m = n - k + 1
    span = k - s + 1
    minf = _windowed_min(hf, span)[:m]
    minr = _windowed_min(hr, span)[:m]
    # ends of the smer run inside kmer i: positions i and i+k-s
    first = np.where(canon_rev, hr[:m], hf[:m])
    last = np.where(canon_rev, hr[k - s : k - s + m], hf[k - s : k - s + m])
    wmin = np.where(canon_rev, minr, minf)
    chosen = ((first == wmin) | (last == wmin)) & valid
    offs = np.nonzero(chosen)[0].astype(np.int64)
    return offs, keys[offs], canon_rev[offs]


def extract_syncmers_batch(codes2d: np.ndarray, k: int, s: int = DEFAULT_SMER
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                      np.ndarray]:
    """Batch closed-syncmer extraction (per-read identical to
    extract_syncmers)."""
    out_r: List[np.ndarray] = []
    out_o: List[np.ndarray] = []
    out_k: List[np.ndarray] = []
    out_v: List[np.ndarray] = []
    for i in range(codes2d.shape[0]):
        offs, keys, crev = extract_syncmers(codes2d[i], k, s)
        out_r.append(np.full(len(offs), i, np.int64))
        out_o.append(offs)
        out_k.append(keys)
        out_v.append(crev)
    if not out_r:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.uint64), np.zeros(0, bool)
    return (np.concatenate(out_r), np.concatenate(out_o),
            np.concatenate(out_k), np.concatenate(out_v))


def count_text_kmers(haps: HaplotypeSet, k: int,
                     threshold: int) -> np.ndarray:
    """Canonical kmers of the haplotype text with > threshold
    occurrences (sorted) — the frequent set for weighted minimizers
    (reference find_frequent_kmers, gbwtgraph_helper.cpp:420-444)."""
    parts_k: List[np.ndarray] = []
    parts_c: List[np.ndarray] = []
    for h in range(haps.count):
        t0, t1 = haps.hap_text_range(h)
        fwd, rev, valid = _rolling_kmers(haps.text[t0:t1], k)
        keys = np.where(rev < fwd, rev, fwd)[valid]
        uniq, c = np.unique(keys, return_counts=True)
        parts_k.append(uniq)
        parts_c.append(c)
    if not parts_k:
        return np.zeros(0, np.uint64)
    allk = np.concatenate(parts_k)
    allc = np.concatenate(parts_c)
    order = np.argsort(allk, kind="stable")
    allk, allc = allk[order], allc[order]
    new = np.ones(len(allk), bool)
    new[1:] = allk[1:] != allk[:-1]
    gid = np.cumsum(new) - 1
    totals = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, np.int64)
    np.add.at(totals, gid, allc)
    uniq = allk[new]
    return uniq[totals > threshold]


@dataclass
class MinimizerHit:
    text_pos: int
    is_rev: bool


class MinimizerIndex:
    """Sorted-array minimizer index over a HaplotypeSet's text.

    scheme='minimizer' is the (k,w) default; scheme='syncmer' indexes
    closed syncmers with s-mer length `smer` (`vg minimizer -c -s`,
    reference minimizer_main.cpp:147-149 — the window parameter is
    ignored). `frequent` (sorted uint64 keys) enables weighted-minimizer
    downweighting (`vg minimizer -W`); read seeding consults the same
    set via extract()/extract_batch() so both sides elect identical
    kmers."""

    def __init__(self, k: int = DEFAULT_K, w: int = DEFAULT_W,
                 max_alt_positions: int = 4, scheme: str = "minimizer",
                 smer: int = DEFAULT_SMER,
                 frequent: Optional[np.ndarray] = None,
                 weight_iterations: int = WEIGHT_ITERATIONS):
        self.k = k
        self.w = w
        self.max_alt_positions = max_alt_positions
        self.scheme = scheme
        self.smer = smer
        self.frequent = frequent
        self.weight_iterations = weight_iterations
        self.keys = np.zeros(0, np.uint64)
        self.offsets = np.zeros(1, np.int64)   # per-key range into positions
        self.pos_text = np.zeros(0, np.int64)
        self.pos_rev = np.zeros(0, bool)

    # -- extraction (index build and read seeding share these) ---------------

    def extract(self, codes: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self.scheme == "syncmer":
            return extract_syncmers(codes, self.k, self.smer)
        return extract_minimizers(codes, self.k, self.w, self.frequent,
                                  self.weight_iterations)

    def extract_batch(self, codes2d: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray]:
        if self.scheme == "syncmer":
            return extract_syncmers_batch(codes2d, self.k, self.smer)
        return extract_minimizers_batch(codes2d, self.k, self.w,
                                        self.frequent,
                                        self.weight_iterations)

    @property
    def plain_minimizers(self) -> bool:
        """True when the native (k,w) seeding kernel applies."""
        return self.scheme == "minimizer" and self.frequent is None

    # -- construction ---------------------------------------------------------

    @classmethod
    def build(cls, haps: HaplotypeSet, k: int = DEFAULT_K, w: int = DEFAULT_W,
              max_alt_positions: int = 4,
              threads: int = 4, scheme: str = "minimizer",
              smer: int = DEFAULT_SMER, weighted: bool = False,
              weight_threshold: int = WEIGHT_THRESHOLD,
              weight_iterations: int = WEIGHT_ITERATIONS
              ) -> "MinimizerIndex":
        """Index construction is parallel over haplotypes: the native
        extraction kernel releases the GIL, so a thread pool gives real
        speedup (the reference's index-construction job parallelism,
        SURVEY.md §2.3, expressed per-haplotype). weighted=True first
        counts text kmers and downweights those above weight_threshold
        (reference vg minimizer -W / find_frequent_kmers)."""
        frequent = None
        if weighted:
            if scheme == "syncmer":
                raise ValueError(
                    "weighted minimizers cannot be used with syncmers")
            frequent = count_text_kmers(haps, k, weight_threshold)
        self = cls(k, w, max_alt_positions, scheme=scheme, smer=smer,
                   frequent=frequent, weight_iterations=weight_iterations)
        all_keys: List[np.ndarray] = []
        all_pos: List[np.ndarray] = []
        all_rev: List[np.ndarray] = []
        graph_key: List[np.ndarray] = []  # graph placement for dedup

        def extract_one(h):
            t0, t1 = haps.hap_text_range(h)
            return t0, self.extract(haps.text[t0:t1])

        if threads > 1 and haps.count > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=threads) as ex:
                extracted = list(ex.map(extract_one, range(haps.count)))
        else:
            extracted = [extract_one(h) for h in range(haps.count)]

        for t0, (offs, keys, is_rev) in extracted:
            if len(offs) == 0:
                continue
            text_pos = offs + t0
            # graph placement of the kmer start for dedup across haplotypes:
            # (step's handle, offset within step) is a stable graph anchor
            si = haps.step_of_text_pos(text_pos)
            handle = haps.steps[si]
            off_in_step = text_pos - haps.step_text_pos[si]
            gkey = (handle.astype(np.int64) << np.int64(32)) | off_in_step
            all_keys.append(keys)
            all_pos.append(text_pos)
            all_rev.append(is_rev)
            graph_key.append(gkey)
        if not all_keys:
            return self
        keys = np.concatenate(all_keys)
        pos = np.concatenate(all_pos)
        rev = np.concatenate(all_rev)
        gkey = np.concatenate(graph_key)

        # dedup identical (key, graph placement); cap alternates per placement
        order = np.lexsort((pos, gkey, keys))
        keys, pos, rev, gkey = keys[order], pos[order], rev[order], gkey[order]
        new_group = np.ones(len(keys), dtype=bool)
        new_group[1:] = (keys[1:] != keys[:-1]) | (gkey[1:] != gkey[:-1])
        group_id = np.cumsum(new_group) - 1
        # rank within group
        first_of_group = np.nonzero(new_group)[0]
        rank = np.arange(len(keys)) - first_of_group[group_id]
        keep = rank < self.max_alt_positions
        keys, pos, rev = keys[keep], pos[keep], rev[keep]

        order = np.argsort(keys, kind="stable")
        keys, pos, rev = keys[order], pos[order], rev[order]
        uniq, starts = np.unique(keys, return_index=True)
        self.keys = uniq
        self.offsets = np.append(starts, len(keys)).astype(np.int64)
        self.pos_text = pos
        self.pos_rev = rev
        return self

    # -- queries ----------------------------------------------------------------

    @property
    def unique_count(self) -> int:
        return len(self.keys)

    def count(self, key) -> np.ndarray:
        """Occurrences per query key (vectorized)."""
        key = np.atleast_1d(np.asarray(key, np.uint64))
        if len(self.keys) == 0:
            return np.zeros(len(key), np.int64)
        i = np.searchsorted(self.keys, key)
        i = np.minimum(i, len(self.keys) - 1)
        found = self.keys[i] == key
        return np.where(found, self.offsets[i + 1] - self.offsets[i], 0)

    def lookup(self, key: int) -> Tuple[np.ndarray, np.ndarray]:
        """(text positions, is_rev) for one key."""
        i = int(np.searchsorted(self.keys, np.uint64(key)))
        if i >= len(self.keys) or self.keys[i] != np.uint64(key):
            return np.zeros(0, np.int64), np.zeros(0, bool)
        s, e = self.offsets[i], self.offsets[i + 1]
        return self.pos_text[s:e], self.pos_rev[s:e]

    def lookup_ranges(self, keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized: (start, end) ranges into pos_text for each query key
        (start==end when absent)."""
        keys = np.asarray(keys, np.uint64)
        i = np.searchsorted(self.keys, keys)
        i = np.minimum(i, max(len(self.keys) - 1, 0))
        found = (len(self.keys) > 0) & (self.keys[i] == keys)
        start = np.where(found, self.offsets[i], 0)
        end = np.where(found, self.offsets[i + 1], 0)
        return start, end
