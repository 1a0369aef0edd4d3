"""Tunnel transfer compression for device dispatches.

On a tunneled single-chip setup (axon) the host<->device link runs at
~10 MB/s with ~50 ms per-transfer latency, so the paired-step dispatch is
transfer-bound, not compute-bound: 150bp reads as uint8 + their
reverse complements + 7 full-width candidate arrays per end cost ~7 MB
per 8k-pair batch. This module shrinks the wire format:

- reads: 4-bit packed (8 base codes per int32 word, little-endian
  nibbles — same layout as pallas_align.pack_text); the reverse
  complement is DERIVED on device instead of uploaded.
- candidates: 3 int32 words per candidate — window start, approximate
  reference offset, and a packed meta word (valid | rev | refpath+1 |
  haplotype id). The per-candidate [lo, hi) haplotype bounds are
  reconstructed on device from the resident text_start table.

The reference has no analogue (shared-memory threads, vg
src/subcommand/giraffe_main.cpp:2369); this is TPU-deployment plumbing.
"""
from __future__ import annotations

import numpy as np


def pack_reads4(a: np.ndarray) -> np.ndarray:
    """(R, L) uint8 base codes -> (R, ceil(L/8)) int32, 4 bits per code
    (nibble k of a word = code at column 8*w + k), padded with 5."""
    a = np.ascontiguousarray(a, np.uint8)
    R, L = a.shape
    Lp = -(-L // 8) * 8
    if Lp != L:
        a = np.concatenate([a, np.full((R, Lp - L), 5, np.uint8)], axis=1)
    w = a.reshape(R, Lp // 8, 8).astype(np.uint32)
    packed = np.zeros((R, Lp // 8), np.uint32)
    for b in range(8):
        packed |= w[:, :, b] << np.uint32(4 * b)
    return packed.view(np.int32)


def unpack_reads4_dev(p):
    """Device inverse of pack_reads4: (R, W) int32 -> (R, W*8) uint8."""
    import jax.numpy as jnp

    shifts = (jnp.arange(8, dtype=jnp.int32) * 4)[None, None, :]
    nib = (p[:, :, None] >> shifts) & 15
    return nib.reshape(p.shape[0], -1).astype(jnp.uint8)


def revcomp_dev(reads, rlen):
    """Device reverse complement of length-rlen rows of a padded (R, RL)
    uint8 code array (pad value 5; code 4+ = N stays as-is)."""
    import jax.numpy as jnp

    RL = reads.shape[1]
    idx = rlen[:, None].astype(jnp.int32) - 1 \
        - jnp.arange(RL, dtype=jnp.int32)[None, :]
    g = jnp.take_along_axis(reads, jnp.clip(idx, 0, RL - 1).astype(jnp.int32),
                            axis=1)
    comp = jnp.where(g < 4, 3 - g, g)
    return jnp.where(idx >= 0, comp, jnp.uint8(5))


def pack_cand_meta(lo: np.ndarray, rev: np.ndarray, valid: np.ndarray,
                   refpath, hap_starts: np.ndarray) -> np.ndarray:
    """Candidate meta word: bit0 valid, bit1 rev, bits2-16 refpath+1,
    bits17-31 haplotype id (index into hap_starts such that
    hap_starts[h] == lo for valid candidates)."""
    hap = np.searchsorted(hap_starts, lo.astype(np.int64),
                          side="right") - 1
    hap = np.clip(hap, 0, max(len(hap_starts) - 2, 0)).astype(np.uint32)
    if refpath is None:
        rp1 = np.zeros(lo.shape, np.uint32)
    else:
        rp1 = (refpath.astype(np.int64) + 1).astype(np.uint32) & 0x7FFF
    m = (valid.astype(np.uint32)
         | (rev.astype(np.uint32) << np.uint32(1))
         | (rp1 << np.uint32(2))
         | ((hap & np.uint32(0x7FFF)) << np.uint32(17)))
    return m.view(np.int32)


def unpack_cand_meta_dev(cm, hap_bounds):
    """Device inverse of pack_cand_meta -> (lo, hi, rev, valid, refpath)."""
    valid = (cm & 1).astype(bool)
    rev = ((cm >> 1) & 1).astype(bool)
    refpath = ((cm >> 2) & 0x7FFF) - 1
    hap = (cm >> 17) & 0x7FFF
    lo = hap_bounds[hap]
    hi = hap_bounds[hap + 1]
    return lo, hi, rev, valid, refpath
