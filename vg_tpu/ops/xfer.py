"""Tunnel transfer compression for device dispatches.

On a tunneled single-chip setup (axon) the host<->device link runs at
~10 MB/s with ~50 ms per-transfer latency, so the paired-step dispatch is
transfer-bound, not compute-bound: 150bp reads as uint8 + their
reverse complements + 7 full-width candidate arrays per end cost ~7 MB
per 8k-pair batch. This module shrinks the wire format:

- reads: 4-bit packed (8 base codes per int32 word, little-endian
  nibbles — same layout as pallas_align.pack_text); the reverse
  complement is DERIVED on device instead of uploaded.
- candidates: window start (int32) + a valid|rev flag byte. The
  [lo, hi) haplotype bounds and the reference projection (refpath,
  refoff) are derived ON DEVICE from resident index arrays
  (parallel/mesh.derive_candidate_meta).

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


def pack_wire(parts, scalars=()) -> np.ndarray:
    """Concatenate int32-viewable arrays (+ trailing float32 scalars,
    bitcast) into ONE flat int32 buffer: each jitted-call argument is a
    separate tunnel transfer paying ~5-30 ms latency, so the whole
    dispatch input travels as a single array and is sliced apart on
    device (static offsets)."""
    flat = [np.ascontiguousarray(a).view(np.int32).ravel() for a in parts]
    if scalars:
        flat.append(np.asarray(scalars, np.float32).view(np.int32))
    return np.concatenate(flat)


EXC_CAP = 64   # fixed per-mate N-exception slots in the 2-bit wire


def pack_reads2(a: np.ndarray, rlen: np.ndarray):
    """(R, L) uint8 base codes -> ((R, ceil(L/16)) int32 at 2 bits per
    code, exc int32 exception list) — half the wire of pack_reads4.
    2 bits cannot carry N (4) or pad (5): pad is reconstructed on device
    from rlen, and each in-read N becomes an exception entry
    row * 4096 + col (rare on real data). Returns exc unpadded; the
    caller falls back to the 4-bit layout when len(exc) > EXC_CAP."""
    a = np.ascontiguousarray(a, np.uint8)
    R, L = a.shape
    rows, cols = np.nonzero((a >= 4)
                            & (np.arange(L)[None, :] < rlen[:R, None]))
    exc = (rows.astype(np.int64) * 4096 + cols).astype(np.int32)
    Lp = -(-L // 16) * 16
    if Lp != L:
        a = np.concatenate([a, np.zeros((R, Lp - L), np.uint8)], axis=1)
    w = (a & 3).reshape(R, Lp // 16, 16).astype(np.uint32)
    packed = np.zeros((R, Lp // 16), np.uint32)
    for b in range(16):
        packed |= w[:, :, b] << np.uint32(2 * b)
    return packed.view(np.int32), exc


def unpack_reads2_dev(p, rlen, RL: int, exc):
    """Device inverse of pack_reads2: (R, W) int32 + rlen + EXC_CAP
    exception words (-1 = unused) -> (R, RL) uint8 with pad 5 beyond
    rlen and code 4 at exception positions."""
    import jax.numpy as jnp

    R = p.shape[0]
    shifts = (jnp.arange(16, dtype=jnp.int32) * 2)[None, None, :]
    codes = ((p[:, :, None] >> shifts) & 3).reshape(R, -1)[:, :RL]
    codes = jnp.where(jnp.arange(RL)[None, :] < rlen[:, None].astype(
        jnp.int32), codes, 5).astype(jnp.uint8)
    rows = jnp.where(exc >= 0, exc >> 12, -1)     # OOB -> dropped
    colz = exc & 4095
    return codes.at[rows, colz].set(jnp.uint8(4), mode="drop")


def unpack_i8_dev(words, n_cols: int):
    """Device: (R, ceil(n/4)) int32 -> (R, n_cols) int8 (little-endian
    bytes within each word)."""
    import jax.numpy as jnp

    R = words.shape[0]
    shifts = (jnp.arange(4, dtype=jnp.int32) * 8)[None, None, :]
    b = (words[:, :, None] >> shifts) & 0xFF
    return b.reshape(R, -1)[:, :n_cols].astype(jnp.int8)


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


def bits_to_pos8_dev(bits):
    """Device: (R, W) int32 mismatch bitmap words -> first 8 mismatch
    column positions as (R, 8) uint8 (valid when the read length fits a
    byte; rows with more than 8 mismatches fall back to a host gather on
    the receive side). Stable argsort puts mismatch columns first in
    column order."""
    import jax.numpy as jnp

    R, W = bits.shape
    msk = (((bits[:, :, None] >> jnp.arange(32, dtype=jnp.int32)) & 1)
           .astype(bool).reshape(R, W * 32))
    order = jnp.argsort(~msk, axis=1, stable=True)[:, :8]
    return order.astype(jnp.uint8)


def pos8_to_mism_rows(pos8: np.ndarray, mm: np.ndarray, RL: int):
    """Host: rebuild (len(pos8), RL) uint8 mismatch rows from position
    lists (only rows with mm <= 8 are meaningful)."""
    n = len(pos8)
    out = np.zeros((n, RL), np.uint8)
    if n:
        k = np.arange(8)[None, :]
        valid = k < mm[:, None]
        rows = np.repeat(np.arange(n), 8).reshape(n, 8)
        idx = np.minimum(pos8.astype(np.int64), RL - 1)
        out[rows[valid], idx[valid]] = 1
    return out
