"""Host-side banded alignment with traceback for winning candidates.

The device kernel (vg_tpu.ops.align.banded_scores) scores every candidate;
only the per-read winner needs edits. This module recomputes the same DP
for one (read, window) pair in numpy, with full traceback to an edit list.
Scores are guaranteed to agree with the device kernel (same recurrence,
same band), which the tests assert.

Edit ops mirror vg's Edit algebra (reference: src/path.cpp edit semantics,
SURVEY.md Appendix E): ('M', n) match, ('X', n, read_seq) mismatch,
('I', n, read_seq) insertion-to-graph (includes soft clips at the ends),
('D', n) deletion-from-graph.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .align import NEG, SENTINEL, Scoring, DEFAULT_SCORING


@dataclass
class TextAlignment:
    score: int
    read_start: int          # first aligned read base (left clip = [0, read_start))
    read_end: int            # one past last aligned read base
    text_start: int          # window-relative start of consumed text
    text_end: int
    edits: List[Tuple]       # ('M'|'X'|'I'|'D', length[, seq_codes])
    matches: int = 0


def banded_traceback(
    read: np.ndarray,          # (L,) uint8 codes (true length, no padding)
    window: np.ndarray,        # (TW,) uint8 codes, TW >= L + 2*B
    band_radius: int,
    scoring: Scoring = DEFAULT_SCORING,
    x_drop: int = 0,
) -> Optional[TextAlignment]:
    """Dispatch: native C++ kernel when available (exact parity verified
    by tests), numpy fallback otherwise. x_drop > 0 enables the dozeu
    early exit (long-read tails; reference src/dozeu_interface.cpp)."""
    from ..native import lib, native_banded_traceback

    if lib() is not None:
        res = native_banded_traceback(read, window, band_radius, scoring,
                                      x_drop)
        if res is not False:          # False = edit overflow, retry here
            return res
    return _banded_traceback_py(read, window, band_radius, scoring, x_drop)


def _banded_traceback_py(
    read: np.ndarray,
    window: np.ndarray,
    band_radius: int,
    scoring: Scoring = DEFAULT_SCORING,
    x_drop: int = 0,
) -> Optional[TextAlignment]:
    """Banded semiglobal alignment of read vs window, maximizing the same
    objective as the device kernel. Returns None if nothing scores > 0."""
    L = len(read)
    B = band_radius
    W = 2 * B + 1
    m, x = scoring.match, scoring.mismatch
    go, ge, fb = scoring.gap_open, scoring.gap_extend, scoring.full_length_bonus

    H = np.full((L + 1, W), NEG, dtype=np.int64)
    F = np.full((L + 1, W), NEG, dtype=np.int64)
    E = np.full((L + 1, W), NEG, dtype=np.int64)
    # op codes: 0 diag, 1 from-F (gap in text), 2 from-E (gap in read),
    # 3 fresh start (left clip); E/F own tables track open (0) vs extend (1)
    op = np.zeros((L + 1, W), dtype=np.int8)
    fop = np.zeros((L + 1, W), dtype=np.int8)
    eop = np.zeros((L + 1, W), dtype=np.int8)

    H[0, :] = fb  # alignment includes read start -> left bonus
    op[0, :] = 3

    best = 0
    best_cell = None  # (i, k, with_right_bonus)
    for i in range(1, L + 1):
        rb = read[i - 1]
        # window column for band slot k at row i is j = i + k - 1 (0-based
        # into window): row i uses window[i-1 : i-1+W]
        wrow = window[i - 1 : i - 1 + W]
        sub = np.where((wrow == rb) & (rb < 4), m, -x)
        diag = H[i - 1] + sub
        shiftH = np.concatenate([H[i - 1, 1:], [NEG]])
        shiftF = np.concatenate([F[i - 1, 1:], [NEG]])
        F[i] = np.maximum(shiftH - go, shiftF - ge)
        fop[i] = (shiftF - ge > shiftH - go).astype(np.int8)
        Hn = np.maximum.reduce([diag, F[i], np.zeros(W, np.int64)])
        opn = np.where(F[i] > diag, 1, 0)
        opn = np.where((diag < 0) & (F[i] < 0), 3, opn)
        # in-row E
        Erow = np.full(W, NEG, dtype=np.int64)
        eo = np.zeros(W, dtype=np.int8)
        run = NEG
        for k in range(1, W):
            open_v = Hn[k - 1] - go
            ext_v = Erow[k - 1] - ge
            if ext_v > open_v:
                Erow[k] = ext_v
                eo[k] = 1
            else:
                Erow[k] = open_v
                eo[k] = 0
        E[i] = Erow
        eop[i] = eo
        Hrow = np.maximum(Hn, Erow)
        op[i] = np.where(Erow > Hn, 2, opn)
        H[i] = Hrow
        rm = int(Hrow.max())
        if rm > best:
            best = rm
            best_cell = (i, int(Hrow.argmax()), False)
        if i == L and rm + fb > best:
            best = rm + fb
            best_cell = (i, int(Hrow.argmax()), True)
        if x_drop > 0 and best > 0 and rm < best - x_drop:
            break     # dozeu X-drop: the band fell too far behind
    if best_cell is None or best <= 0:
        return None

    # traceback
    i, k, _ = best_cell
    edits_rev: List[Tuple] = []
    matches = 0

    def push(kind, n=1, seq=None):
        if edits_rev and edits_rev[-1][0] == kind and kind in ("M", "D"):
            prev = edits_rev[-1]
            edits_rev[-1] = (kind, prev[1] + n)
        elif edits_rev and edits_rev[-1][0] == kind and seq is not None:
            prev = edits_rev[-1]
            edits_rev[-1] = (kind, prev[1] + n, np.concatenate([seq, prev[2]]))
        else:
            edits_rev.append((kind, n) if seq is None else (kind, n, seq))

    state = "H"
    while True:
        if state == "H":
            o = op[i, k]
            if o == 3:
                break
            if o == 0:
                j = i + k - 1
                if window[j] == read[i - 1] and read[i - 1] < 4:
                    push("M")
                    matches += 1
                else:
                    push("X", 1, read[i - 1 : i])
                i -= 1
                # k unchanged: diag keeps band slot
            elif o == 1:
                state = "F"
            else:
                state = "E"
        elif state == "F":
            # gap in text: consume read base, j fixed -> k increases going back
            push("I", 1, read[i - 1 : i])
            ext = fop[i, k]
            i -= 1
            k += 1
            state = "F" if ext else "H"
        else:  # E: gap in read, consume text
            push("D")
            ext = eop[i, k]
            k -= 1
            state = "E" if ext else "H"
        if i == 0 and state == "H" and op[i, k] == 3:
            break

    read_start = i
    text_start = i + k  # window position after tracing back (j of start)
    ei, kk, _ = best_cell
    read_end = ei
    text_end = ei + kk
    edits = list(reversed(edits_rev))
    return TextAlignment(
        score=int(best),
        read_start=read_start,
        read_end=read_end,
        text_start=text_start,
        text_end=text_end,
        edits=edits,
        matches=matches,
    )
