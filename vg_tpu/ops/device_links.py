"""Device engine for long-read LINK alignments (VERDICT r3 item 4).

The long-read pipeline's hot stage is the slow-path link DP: ~19 global
affine alignments per read between consecutive anchor blocks (reference
role: chain-gap alignment in minimizer_mapper_from_chains.cpp:708 /
chain_items.cpp; our host twin is native global_align, banded with an
exact band-doubling escape bound). This module batches every slow link
of a read batch into ONE device program:

  fill:      banded affine DP in diagonal space (offset c = j - i -
             base, base = min(0, d) - B, d = lb - la) as a lax.scan
             over rows; per-cell traceback DECISION BITS (diag-ok /
             E-selected / E-extend / F-extend / match) are exactly the
             equality checks the host traceback re-derives, so the walk
             reproduces the host edit sequence bit-for-bit. The in-row
             E scan uses the lazy-E identity (opening from an H that
             equals E never beats extending while gap_open >=
             gap_extend), lowered to one associative cummax.
  traceback: a lockstep lax.scan walk over all problems (one gather per
             step), emitting 4-bit ops packed 8/word.

The b (text) side is gathered ON DEVICE from the resident 4-bit packed
text (same word-granularity row-major gather as
mesh.winner_mismatch_bits), so only the read-side slices cross the
host->device link. Engine-default decision (measured, see
LONGREAD_ENGINE.md): through the ~11 MB/s tunnel the per-batch
transfer (6.2 MB for 9k links) plus two-pass orchestration loses to
the fused host C++ pipeline (1.65 s vs 0.40 s / 496 reads), so
engine="native" stays the production default on this host; on
PCIe-attached chips the transfer term is ~2 ms and bench re-probes
both engines every run. A device result is used only when provably exact:
score >= match*min(la,lb) - 2*gap_open - gap_extend*(|d| + 2B) (any
path leaving the band scores below that), else the caller's host DP
runs — the identical exactness rule as native global_align's band
doubling (vgtpu_host.cpp).
"""
from __future__ import annotations

from functools import partial

import numpy as np

NEG = -(1 << 28)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _build_engine():
    import jax

    @partial(jax.jit, static_argnames=(
        "RMAX", "WB", "T", "match", "mismatch", "gap_open", "gap_extend"))
    def engine(a4, la, ta, base, lb, text_packed,
               RMAX: int, WB: int, T: int, match: int, mismatch: int,
               gap_open: int, gap_extend: int):
        import jax.numpy as jnp
        from jax import lax

        N = a4.shape[0]
        KB = _round_up(RMAX + WB + 8, 8)

        # device-side b gather: bdiag[n, t] = text[ta + base - 1 + t]
        b0 = ta + base - 1
        NW = KB // 8 + 2
        w0 = b0 >> 3
        widx = w0[:, None] + jnp.arange(NW, dtype=jnp.int32)[None, :]
        words = text_packed[jnp.clip(widx, 0, text_packed.shape[0] - 1)]
        rep = jnp.repeat(words, 8, axis=1).astype(jnp.uint32)
        sh = ((jnp.arange(NW * 8, dtype=jnp.uint32) % 8) * 4)[None, :]
        basn = ((rep >> sh) & jnp.uint32(15)).astype(jnp.uint8)
        mis = (b0 & 7)
        bdiag = jnp.zeros((N, KB), jnp.uint8)
        for off in range(8):
            bdiag = jnp.where((mis == off)[:, None],
                              lax.slice(basn, (0, off), (N, off + KB)),
                              bdiag)
        gpos = b0[:, None] + jnp.arange(KB, dtype=jnp.int32)[None, :]
        bdiag = jnp.where((gpos >= 0) & (gpos < T), bdiag, jnp.uint8(6))

        # unpack read side: a_all[n, i] = a[i] (4-bit packed input)
        arep = jnp.repeat(a4, 8, axis=1).astype(jnp.uint32)
        ash = ((jnp.arange(RMAX, dtype=jnp.uint32) % 8) * 4)[None, :]
        a_all = ((arep >> ash) & jnp.uint32(15)).astype(jnp.uint8)

        cgrid = jnp.arange(WB, dtype=jnp.int32)[None, :]       # (1, WB)
        ramp = (cgrid * gap_extend).astype(jnp.int32)
        lbb = lb[:, None]
        bse = base[:, None]

        # row 0 boundary: H[0, j] = E[0, j] = -(go + (j-1)*ge), H[0,0]=0
        j0 = bse + cgrid
        in0 = (j0 >= 0) & (j0 <= lbb)
        H0 = jnp.where(j0 == 0, 0,
                       jnp.where(in0 & (j0 > 0),
                                 -(gap_open + (j0 - 1) * gap_extend),
                                 NEG)).astype(jnp.int32)
        F0 = jnp.full((N, WB), NEG, jnp.int32)
        # row-0 decision bits: every j>0 cell is E-selected; E extends
        # while j >= 2 (E(0,j) == E(0,j-1) - ge, and H(0,j-1) - go
        # differs because go != ge)
        bits0 = jnp.where(
            in0 & (j0 > 0),
            (jnp.uint8(2) | ((j0 >= 2).astype(jnp.uint8) << 2)),
            jnp.uint8(0))

        cfin = lb - la - base                    # final band column

        def row(carry, i):
            Hp, Fp = carry                       # full H / F of row i-1
            j = i + bse + cgrid                  # (N, WB)
            inb = (j >= 0) & (j <= lbb) & (i <= la[:, None])
            ai = lax.dynamic_index_in_dim(a_all, i - 1, axis=1,
                                          keepdims=False)      # (N,)
            # b[j-1] = text[ta + j - 1] = bdiag[i + c]: c is the
            # contiguous 0..WB-1 grid and i is the scalar scan index,
            # so this is ONE dynamic slice — take_along_axis here
            # lowered to a one-hot masked reduce over the whole row
            # (~100x slower, measured on v5e)
            bt = lax.dynamic_slice_in_dim(bdiag, i, WB, axis=1)
            mbit = (bt == ai[:, None]) & (ai[:, None] < 4)
            sub = jnp.where(mbit, match, -mismatch).astype(jnp.int32)
            # diag (i-1, j-1) -> same c; up (i-1, j) -> c+1
            diag = Hp + sub
            Hup1 = jnp.concatenate(
                [Hp[:, 1:], jnp.full((N, 1), NEG, jnp.int32)], 1)
            Fup1 = jnp.concatenate(
                [Fp[:, 1:], jnp.full((N, 1), NEG, jnp.int32)], 1)
            F = jnp.maximum(Hup1 - gap_open, Fup1 - gap_extend)
            f_ext = (F == Fup1 - gap_extend) & (F != Hup1 - gap_open)
            hn = jnp.maximum(diag, F)            # H without E
            # lazy-E via cummax: E[c] = max_{c'<=c}(open[c'] + c'*ge)
            #                           - go - c*ge
            hn_sh = jnp.concatenate(
                [jnp.full((N, 1), NEG, jnp.int32), hn[:, :-1]], 1)
            colH = jnp.where(i <= la[:, None],
                             -(gap_open + (i - 1) * gap_extend), NEG)
            opensrc = jnp.where(j == 1, jnp.maximum(hn_sh, colH), hn_sh)
            g = jnp.maximum(opensrc, NEG) + ramp
            pref = lax.associative_scan(jnp.maximum, g, axis=1)
            E = jnp.maximum(pref - gap_open - ramp, NEG)
            H = jnp.maximum(hn, E)
            e_sel = H == E
            E_sh = jnp.concatenate(
                [jnp.full((N, 1), NEG, jnp.int32), E[:, :-1]], 1)
            Hfull_sh = jnp.concatenate(
                [jnp.full((N, 1), NEG, jnp.int32), H[:, :-1]], 1)
            Hfull_sh = jnp.where(j == 1, jnp.maximum(Hfull_sh, colH),
                                 Hfull_sh)
            e_ext = (E == E_sh - gap_extend) & (E != Hfull_sh - gap_open)
            diag_ok = H == diag
            H = jnp.where(inb, H, NEG)
            F = jnp.where(inb, F, NEG)
            bits = (diag_ok.astype(jnp.uint8)
                    | (e_sel.astype(jnp.uint8) << 1)
                    | (e_ext.astype(jnp.uint8) << 2)
                    | (f_ext.astype(jnp.uint8) << 3)
                    | (mbit.astype(jnp.uint8) << 4))
            bits = jnp.where(inb, bits, jnp.uint8(0))
            hit = jnp.where(cgrid == jnp.clip(cfin, 0, WB - 1)[:, None],
                            H, NEG).max(axis=1)
            return (H, F), (bits, jnp.where(i == la, hit, NEG))

        (_Hl, _Fl), (bp, hits) = lax.scan(
            row, (H0, F0), jnp.arange(1, RMAX + 1, dtype=jnp.int32))
        score = hits.max(axis=0)
        score = jnp.where(
            la == 0,
            jnp.where(lb == 0, 0, -(gap_open + (lb - 1) * gap_extend)),
            score)

        # rows 0..RMAX of decision bits, flattened FULLY (the walk
        # gathers with absolute flat indices — a true 1-D gather; any
        # (N, wide) take_along_axis form lowers to a one-hot reduce)
        bp_all = jnp.concatenate([bits0[None], bp], axis=0)
        bpf = bp_all.transpose(1, 0, 2).reshape(N * (RMAX + 1) * WB)
        lane_base = jnp.arange(N, dtype=jnp.int32) * ((RMAX + 1) * WB)

        # certified paths satisfy total-gap-length <= 2*go/ge + |d| + 2B
        # (from the escape bound), so steps = lb + #I <= (RMAX + 2B) +
        # (2*go/ge + |d| + 2B + |d|)/2 — 64 slack covers any scoring in
        # use; longer walks fail `complete` and fall back to the host
        STEPS = _round_up(RMAX + WB + 64, 8)

        def tb(state, _):
            i, c, st, done = state
            j = i + base + c
            cell = bpf[lane_base + i * WB + jnp.clip(c, 0, WB - 1)]
            diag_ok = (cell & 1).astype(bool)
            e_sel = ((cell >> 1) & 1).astype(bool)
            e_ext = ((cell >> 2) & 1).astype(bool)
            f_ext = ((cell >> 3) & 1).astype(bool)
            mtc = ((cell >> 4) & 1).astype(bool)
            at_end = (i == 0) & (j == 0)
            take_d = (st == 0) & (i > 0) & (j > 0) & diag_ok
            in_e = (st == 2) | ((st == 0) & ~take_d & (j > 0) & e_sel)
            in_f = ~take_d & ~in_e
            # ops: 0=M 1=X 2=I(read gap char) 3=D(text) 4=pad
            op = jnp.where(take_d, jnp.where(mtc, 0, 1),
                           jnp.where(in_e, 3, 2)).astype(jnp.uint8)
            halt = done | at_end
            op = jnp.where(halt, jnp.uint8(4), op)
            ni = jnp.where(take_d | in_f, i - 1, i)
            nc = jnp.where(take_d, c,
                           jnp.where(in_e, c - 1, c + 1))
            nst = jnp.where(
                take_d, 0,
                jnp.where(in_e, jnp.where(e_ext & (j > 1), 2, 0),
                          jnp.where(f_ext & (i > 1), 1, 0))
            ).astype(jnp.int32)
            ni = jnp.where(halt, i, ni)
            nc = jnp.where(halt, c, nc)
            nst = jnp.where(halt, st, nst)
            return (ni, nc, nst, halt), op

        st0 = jnp.zeros(N, jnp.int32)
        done0 = (la == 0) & (lb == 0)
        (fi, fc, _fst, fdone), ops = lax.scan(
            tb, (la, jnp.clip(cfin, 0, WB - 1), st0, done0),
            None, length=STEPS)
        n_steps = (ops != 4).sum(axis=0).astype(jnp.int32)
        complete = fdone | ((fi == 0) & ((fi + base + fc) == 0))
        # pack 4-bit ops 8/word, traceback order
        SW = STEPS // 8
        sh4 = ((jnp.arange(STEPS, dtype=jnp.uint32) % 8) * 4)[None, :]
        packed = ((ops.T.astype(jnp.uint32) << sh4)
                  .reshape(N, SW, 8).sum(axis=2, dtype=jnp.uint32))
        return score, packed, n_steps, complete

    return engine


_ENGINE = None


def link_engine():
    global _ENGINE
    if _ENGINE is None:
        _ENGINE = _build_engine()
    return _ENGINE


class DeviceLinkAligner:
    """Host wrapper: batches slow-link problems into the device engine
    and returns per-problem (score, unit edits) identical to native
    global_align — (op, 1, read_off) triples in traceback order, op
    0=M 1=X 2=I 3=D. Problems outside the engine's shape envelope, or
    whose band cannot be certified exact, return None (caller runs the
    host DP)."""

    def __init__(self, text_packed_dev, T: int, scoring,
                 RMAX: int = 256, B: int = 16, buckets=(256, 768)):
        self.text_packed = text_packed_dev
        self.T = T
        self.sc = scoring
        self.RMAX = RMAX
        self.B = B
        self.buckets = tuple(buckets)
        assert scoring.gap_open >= scoring.gap_extend, \
            "lazy-E fill requires gap_open >= gap_extend"

    def eligible(self, la: int, lb: int) -> bool:
        # band cover: WB = 4B+1 columns hold offsets up to |d| + 2B + 1
        return 0 < la <= self.RMAX and 0 < lb and abs(lb - la) <= 2 * self.B

    def align_runs_arrays(self, a_rows, la, ta, lb):
        """Bulk resolver form over PRE-PADDED task arrays: a_rows (n,
        LAMAX) uint8 oriented read slices, la/ta/lb (n,) int. Returns
        (resolved bool, scores i64, runs (m,3) i32 forward-merged
        (op, len, 0) for resolved tasks concatenated in task order,
        counts i64). Tasks route to the smallest engine size bucket
        that fits (one XLA program per bucket); everything is
        vectorized — a per-task Python loop here cost more than the
        device DP at ~18k tasks."""
        import jax.numpy as jnp

        sc = self.sc
        n = len(la)
        la = np.asarray(la, np.int64)
        lb = np.asarray(lb, np.int64)
        ta = np.asarray(ta, np.int64)
        resolved = np.zeros(n, bool)
        scores = np.zeros(n, np.int64)
        counts = np.zeros(n, np.int64)
        run_segs = {}
        d = lb - la
        base_ok = (la > 0) & (lb > 0) & (np.abs(d) <= 2 * self.B)
        assigned = np.zeros(n, bool)
        nib = np.arange(8, dtype=np.uint32) * 4
        for RMAX in self.buckets:
            sel = np.nonzero(base_ok & ~assigned & (la <= RMAX))[0]
            assigned[base_ok & (la <= RMAX)] = True
            if len(sel) == 0:
                continue
            # pad the task count to a power-of-two grid: every distinct
            # N is a fresh XLA compile (~40 s through the tunnel)
            N = max(1 << int(np.ceil(np.log2(max(len(sel), 1)))), 1024)
            WB = 4 * self.B + 1
            a_pad = np.zeros((N, RMAX), np.uint8)
            w = min(RMAX, a_rows.shape[1])
            a_pad[: len(sel), :w] = a_rows[sel, :w]
            # zero bases beyond la (padding must be deterministic)
            colm = np.arange(RMAX)[None, :] >= la[sel, None]
            a_pad[: len(sel)][colm[:, :RMAX]] = 0
            a4 = (a_pad.reshape(N, RMAX // 8, 8).astype(np.uint32)
                  << nib[None, None]).sum(axis=2, dtype=np.uint32)
            la_a = np.zeros(N, np.int32)
            ta_a = np.zeros(N, np.int32)
            ba_a = np.zeros(N, np.int32)
            lb_a = np.ones(N, np.int32)
            la_a[: len(sel)] = la[sel]
            ta_a[: len(sel)] = ta[sel]
            lb_a[: len(sel)] = lb[sel]
            ba_a[: len(sel)] = np.minimum(0, d[sel]) - self.B
            score_d, packed, n_steps, complete = link_engine()(
                jnp.asarray(a4.view(np.int32)), jnp.asarray(la_a),
                jnp.asarray(ta_a), jnp.asarray(ba_a), jnp.asarray(lb_a),
                self.text_packed, RMAX=RMAX, WB=WB, T=self.T,
                match=sc.match, mismatch=sc.mismatch,
                gap_open=sc.gap_open, gap_extend=sc.gap_extend)
            score_d = np.asarray(score_d)[: len(sel)]
            n_steps = np.asarray(n_steps)[: len(sel)]
            complete = np.asarray(complete)[: len(sel)]
            packed = np.asarray(packed)[: len(sel)]
            dd = np.abs(d[sel])
            escape_ub = (sc.match * np.minimum(la[sel], lb[sel])
                         - 2 * sc.gap_open
                         - sc.gap_extend * (dd + 2 * self.B))
            cert = complete & (score_d >= escape_ub)
            if not cert.any():
                continue
            SW8 = packed.shape[1] * 8
            codes = ((packed[:, :, None]
                      >> (np.arange(8, dtype=np.uint32) * 4)[None, None])
                     & 15).reshape(len(packed), SW8).astype(np.uint8)
            ci = np.nonzero(cert)[0]
            ns = n_steps[ci].astype(np.int64)
            rev_idx = np.clip(ns[:, None] - 1
                              - np.arange(SW8, dtype=np.int64)[None, :],
                              0, SW8 - 1)
            fwd = np.take_along_axis(codes[ci], rev_idx, axis=1)
            msk = np.arange(SW8)[None, :] < ns[:, None]
            flat = fwd[msk]
            tid = np.repeat(np.arange(len(ci)), ns)
            brk = np.ones(len(flat), bool)
            brk[1:] = (flat[1:] != flat[:-1]) | (tid[1:] != tid[:-1])
            starts = np.nonzero(brk)[0]
            ends = np.concatenate([starts[1:], [len(flat)]])
            runs = np.zeros((len(starts), 3), np.int32)
            runs[:, 0] = flat[starts]
            runs[:, 1] = (ends - starts).astype(np.int32)
            tstart = np.concatenate([[0], np.cumsum(ns)])[:-1]
            r0 = np.searchsorted(starts, tstart, side="left")
            r1 = np.concatenate([r0[1:], [len(starts)]])
            g_t = sel[ci]
            counts[g_t] = r1 - r0
            resolved[g_t] = True
            scores[g_t] = score_d[ci]
            # per-task run segments, keyed by global task id
            seg_off = np.concatenate([[0], np.cumsum(r1 - r0)])
            run_segs[RMAX] = (g_t, runs, seg_off)
        # concatenate per-bucket run segments in GLOBAL task order
        if not run_segs:
            return resolved, scores, np.zeros((0, 3), np.int32), counts
        runs_off = np.concatenate([[0], np.cumsum(counts)])
        all_runs = np.zeros((int(runs_off[-1]), 3), np.int32)
        for RMAX, (g_t, runs, seg_off) in run_segs.items():
            seg = counts[g_t]
            tot = int(seg.sum())
            if tot == 0:
                continue
            within = (np.arange(tot)
                      - np.repeat(seg_off[:-1], seg))
            dest = np.repeat(runs_off[g_t], seg) + within
            all_runs[dest] = runs[:tot]
        return resolved, scores, all_runs, counts

    def align(self, problems):
        """problems: list of (a_codes uint8[la], ta_global int, lb int).
        Returns a list of (score, edits) or None per problem."""
        import jax.numpy as jnp

        sc = self.sc
        n = len(problems)
        out = [None] * n
        dev_idx = [t for t, (a, _ta, lb) in enumerate(problems)
                   if self.eligible(len(a), lb)]
        if not dev_idx:
            return out
        N = _round_up(len(dev_idx), 8)
        RMAX = self.RMAX
        WB = 4 * self.B + 1
        a4 = np.zeros((N, RMAX // 8), np.uint32)
        la_a = np.zeros(N, np.int32)
        ta_a = np.zeros(N, np.int32)
        ba_a = np.zeros(N, np.int32)
        lb_a = np.ones(N, np.int32)
        nib = (np.arange(8, dtype=np.uint32) * 4)
        for k, t in enumerate(dev_idx):
            a, ta, lb = problems[t]
            la = len(a)
            ap = np.zeros(RMAX, np.uint8)
            ap[:la] = a
            a4[k] = (ap.reshape(-1, 8).astype(np.uint32) << nib).sum(
                axis=1, dtype=np.uint32)
            la_a[k], ta_a[k], lb_a[k] = la, ta, lb
            ba_a[k] = min(0, lb - la) - self.B
        score, packed, n_steps, complete = link_engine()(
            jnp.asarray(a4.view(np.int32)), jnp.asarray(la_a),
            jnp.asarray(ta_a), jnp.asarray(ba_a), jnp.asarray(lb_a),
            self.text_packed, RMAX=RMAX, WB=WB, T=self.T,
            match=sc.match, mismatch=sc.mismatch,
            gap_open=sc.gap_open, gap_extend=sc.gap_extend)
        score = np.asarray(score)
        n_steps = np.asarray(n_steps)
        complete = np.asarray(complete)
        packed = np.asarray(packed)
        SW8 = packed.shape[1] * 8
        codes = ((packed[:, :, None]
                  >> (np.arange(8, dtype=np.uint32) * 4)[None, None])
                 & 15).reshape(len(packed), SW8).astype(np.uint8)
        for k, t in enumerate(dev_idx):
            a, _ta, lb = problems[t]
            la = len(a)
            d = abs(lb - la)
            escape_ub = (sc.match * min(la, lb) - 2 * sc.gap_open
                         - sc.gap_extend * (d + 2 * self.B))
            if not complete[k] or score[k] < escape_ub:
                continue
            ns = int(n_steps[k])
            ops = codes[k, :ns]
            consume = (ops == 0) | (ops == 1) | (ops == 2)
            rp_after = (la - np.cumsum(consume)).astype(np.int64)
            # host convention (vgtpu_host.cpp global_align traceback):
            # M/X/I carry the read index consumed; D carries -1
            rp_after = np.where(ops == 3, -1, rp_after)
            out[t] = (int(score[k]),
                      [(int(o), 1, int(p))
                       for o, p in zip(ops, rp_after)])
        return out
