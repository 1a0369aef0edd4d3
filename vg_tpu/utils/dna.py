"""DNA base coding shared by host (numpy) and device (jnp) code.

Codes: A=0, C=1, G=2, T=3, N(or anything else)=4.
Complement of code c (c<4) is 3-c; N stays N.
"""
from __future__ import annotations

import numpy as np

CODE_A, CODE_C, CODE_G, CODE_T, CODE_N = 0, 1, 2, 3, 4

_ENC = np.full(256, CODE_N, dtype=np.uint8)
for i, b in enumerate(b"ACGT"):
    _ENC[b] = i
for i, b in enumerate(b"acgt"):
    _ENC[b] = i

_DEC = np.frombuffer(b"ACGTN", dtype=np.uint8)

# complement lookup over codes 0..4
_COMP = np.array([3, 2, 1, 0, 4], dtype=np.uint8)


def encode(seq: str | bytes) -> np.ndarray:
    """String/bytes -> uint8 code array."""
    if isinstance(seq, str):
        seq = seq.encode()
    return _ENC[np.frombuffer(seq, dtype=np.uint8)]


def decode(codes: np.ndarray) -> str:
    """uint8 code array -> string."""
    codes = np.asarray(codes, dtype=np.uint8)
    return _DEC[np.minimum(codes, 4)].tobytes().decode()


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return _COMP[np.asarray(codes, dtype=np.uint8)][::-1].copy()


def revcomp_str(seq: str) -> str:
    return decode(revcomp_codes(encode(seq)))


def complement_codes(codes: np.ndarray) -> np.ndarray:
    """Elementwise complement without reversal (vectorized batch use)."""
    return _COMP[np.asarray(codes, dtype=np.uint8)]
