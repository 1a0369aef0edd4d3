"""Paired-end mapping: fragment-length model, pair scoring, mate rescue.

Reference behavior being reproduced (SURVEY.md §2.3, Appendix B):
- FragmentLengthDistribution (src/mapper.hpp:80-143): robust running
  estimate over observed lengths from unambiguously-mapped pairs;
  finalized after 1000 samples with the central 95% (giraffe ctor
  FragmentLengthDistribution(1000, 1000, 0.95), src/minimizer_mapper.cpp:72).
  Until finalized, ambiguous pairs are buffered
  (MinimizerMapper::map_paired, src/minimizer_mapper.cpp:1298).
- Pair scoring: candidate pairs in proper orientation get a Gaussian
  fragment-length log-likelihood bonus scaled into score space by the
  scoring matrix's log base (src/minimizer_mapper.cpp:6013).
- Rescue (src/minimizer_mapper.cpp:3319-3424): an unmapped mate is
  re-aligned inside a window around its partner — mean +
  rescue_subgraph_stdevs(=4)*sigma — here a seed scan over the haplotype
  text window followed by one extra batched DP call.

Because both mates live on the same haplotype text, "graph min distance
between mates" is plain position arithmetic: fragment length = span from
the leftmost aligned base of the forward-strand mate to the rightmost of
the reverse-strand mate.
"""
from __future__ import annotations

import math
import time as _time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..io.fastq import Read
from ..io.gam import Alignment
from .giraffe import GiraffeMapper, ScoredBatch
from .mapq import log_base, mapq_exact


class FragmentLengthDistribution:
    """Robust fragment length estimator (reference src/mapper.hpp:80-143)."""

    def __init__(self, maximum_sample_size: int = 1000,
                 robust_fraction: float = 0.95):
        self.max_samples = maximum_sample_size
        self.robust_fraction = robust_fraction
        self.samples: List[float] = []
        self._mean = 0.0
        self._stdev = 0.0
        self.finalized = False

    def add(self, length: float) -> None:
        if self.finalized:
            return
        self.samples.append(float(length))
        if len(self.samples) >= self.max_samples:
            self.finalize()

    def finalize(self) -> None:
        if not self.samples:
            # fallback prior so mapping can proceed (vg errors out instead;
            # we degrade gracefully for tiny inputs)
            self._mean, self._stdev = 400.0, 100.0
        else:
            s = np.sort(np.asarray(self.samples))
            n = len(s)
            lo = int(math.floor(n * (1 - self.robust_fraction) / 2))
            hi = n - lo
            core = s[lo:hi]
            self._mean = float(core.mean())
            self._stdev = float(core.std() + 1e-9)
            # floor keeps the pair bonus tolerant of small real length
            # differences (indel alleles across haplotype copies) even when
            # the training data is unnaturally uniform
            if self._stdev < 10.0:
                self._stdev = 10.0
        self.finalized = True

    @property
    def mean(self) -> float:
        return self._mean

    @property
    def stdev(self) -> float:
        return self._stdev

    def log_likelihood(self, length: np.ndarray) -> np.ndarray:
        mu, sd = self._mean, self._stdev
        return (-((np.asarray(length, float) - mu) ** 2) / (2 * sd * sd)
                - math.log(sd * math.sqrt(2 * math.pi)))


class _PaddedBatch(list):
    """A pair batch padded up to the compiled batch shape; true_len is
    the number of real pairs (records past 2*true_len are dropped)."""

    true_len: int = 0


@dataclass
class PairedParams:
    max_fragment_length: int = 2000      # reference minimizer_mapper.hpp:479
    rescue_stdevs: float = 4.0           # rescue_subgraph_stdevs
    paired_distance_stdevs: float = 2.0  # clustering/pairing window
    rescue_seed_k: int = 11              # seed scan kmer inside the window
    max_rescue_candidates: int = 4
    unpaired_penalty: float = 30.0       # score-space penalty for improper pairs


class PairedGiraffeMapper:
    """Maps read pairs with fragment model warmup, pairing, and rescue."""

    def __init__(self, mapper: GiraffeMapper,
                 params: Optional[PairedParams] = None):
        self.mapper = mapper
        self.params = params or PairedParams()
        self.fragdist = FragmentLengthDistribution()
        # pairs deferred until the fragment model finalizes (the
        # reference's ambiguous_pair_buffer, src/minimizer_mapper.cpp:1298)
        self._ambiguous_buffer: List[Tuple[Read, Read]] = []
        # cumulative per-stage wall seconds + reads, the TPU analogue of
        # the reference's M-instructions/read canary
        # (src/subcommand/giraffe_main.cpp:2116-2137): dev_wait is time
        # blocked on the device fetch inside stage_rescue, so
        # host-s/read = (score+rescue+emit-dev_wait)/reads.
        self.stage_seconds = {"score": 0.0, "rescue": 0.0, "emit": 0.0,
                              "dev_wait": 0.0}
        self.stage_reads = 0
        # opt-in per-call trace [(stage, t_start, t_end), ...] — set to
        # a list to enable; bench archives it so a degraded capture's
        # slow ticks are attributable to a stage (host stall vs device/
        # tunnel wait) from the recorded JSON alone
        self.stage_trace = None
        import threading as _threading

        self._stat_lock = _threading.Lock()
        # serializes warmup-item emission (mutates the fragment model)
        # when the pipeline runs multiple emitter threads
        self._emit_lock = _threading.Lock()
        # serializes lazy jit-cache construction when the pipeline runs
        # multiple seeder threads (a double compile wastes ~12 s)
        self._compile_lock = _threading.Lock()
        # created here, not lazily: two seeder threads racing on a lazy
        # getattr could each assign a fresh dict and drop a compiled step
        self._pair_steps: dict = {}

    # ------------------------------------------------------------ warmup

    def _observe_batch(self, sb1: ScoredBatch, sb2: ScoredBatch) -> None:
        """Collect fragment lengths from unambiguous proper pairs.

        Uniqueness is judged over *distinct placements* (haplotype copies
        of one region are one mapping, not ambiguity — vg sees this for
        free because it maps in graph space)."""
        j1, u1 = _unique_best_batch(sb1, self.mapper)
        j2, u2 = _unique_best_batch(sb2, self.mapper)
        for i in np.nonzero(u1 & u2)[0]:
            frag = _fragment_length(self.mapper, sb1, int(i), int(j1[i]),
                                    sb2, int(i), int(j2[i]))
            if frag is not None and 0 < frag <= self.params.max_fragment_length:
                self.fragdist.add(frag)

    # ------------------------------------------------------------- map

    def map_pairs(self, pairs: Sequence[Tuple[Read, Read]]
                  ) -> List[Tuple[Alignment, Alignment]]:
        """Map pairs. While the fragment model is warming up, unambiguous
        pairs are mapped immediately (their pairing does not depend on the
        model) and ambiguous pairs are buffered, mirroring the reference's
        map_paired ambiguous_pair_buffer (src/minimizer_mapper.cpp:1298);
        the model finalizes after 1000 samples
        (FragmentLengthDistribution(1000, 1000, 0.95),
        src/minimizer_mapper.cpp:72). Call finish() at end of input to
        flush. Output order can differ from input order during warmup."""
        if not pairs:
            return []
        m = self.mapper
        sb1, sb2 = self.score_pairs(pairs)
        if not self.fragdist.finalized:
            part = self._warmup_partition(pairs, sb1, sb2)
            if part is not None:
                unamb = part
                if not unamb:
                    return []
                sub1 = _subset(sb1, unamb)
                sub2 = _subset(sb2, unamb)
                return self._map_unambiguous(sub1, sub2)
            # model finalized on this batch: map it normally, then flush
            # anything buffered during warmup
            return (self._map_pairs_finalized(pairs, sb1, sb2)
                    + self._drain_buffer())
        return self._map_pairs_finalized(pairs, sb1, sb2)

    def _map_pairs_finalized(self, pairs, sb1, sb2
                             ) -> List[Tuple[Alignment, Alignment]]:
        m = self.mapper
        # rescue pass: reads with no candidates but a confidently-mapped mate
        self._rescue(sb1, sb2)
        self._rescue(sb2, sb1)

        sel = self._pair_select(sb1, sb2)
        j1, j2, mq1, mq2, any1, any2, use_pair, frags = sel
        mq1 = m.apply_mapq_caps(sb1, mq1)
        mq2 = m.apply_mapq_caps(sb2, mq2)
        alns1 = m.emit_chosen(sb1, j1, mq1, any1)
        alns2 = m.emit_chosen(sb2, j2, mq2, any2)
        proper = use_pair & any1 & any2
        out: List[Tuple[Alignment, Alignment]] = []
        for i in range(len(pairs)):
            a1, a2 = alns1[i], alns2[i]
            a1.fragment_next = Alignment(name=a2.name)
            a2.fragment_prev = Alignment(name=a1.name)
            if proper[i]:
                for a in (a1, a2):
                    a.annotation["proper_pair"] = True
                    a.annotation["fragment_length"] = int(frags[i])
            elif a1.path is not None or a2.path is not None:
                for a in (a1, a2):
                    a.annotation["proper_pair"] = False
            out.append((a1, a2))
        return out

    # ----------------------------------------------------- warmup plumbing

    def _warmup_partition(self, pairs, sb1: ScoredBatch, sb2: ScoredBatch):
        """Observe fragment lengths; if the model is still not finalized,
        buffer ambiguous pairs and return the indices of unambiguous ones.
        Returns None once finalized (caller maps the batch normally)."""
        self._observe_batch(sb1, sb2)
        if self.fragdist.finalized:
            return None
        _, u1 = _unique_best_batch(sb1, self.mapper)
        _, u2 = _unique_best_batch(sb2, self.mapper)
        both = u1 & u2
        self._ambiguous_buffer.extend(
            pairs[i] for i in np.nonzero(~both)[0])
        return np.nonzero(both)[0].tolist()

    def _map_unambiguous(self, sb1: ScoredBatch, sb2: ScoredBatch
                         ) -> List[Tuple[Alignment, Alignment]]:
        """Emit pairs whose two ends each map uniquely: selection is
        forced, MAPQ is each end's own posterior (no pair bonus — the
        fragment model is not available yet). Proper-pair annotation is
        geometric: opposite strands, positive span ≤ max_fragment_length."""
        alns1 = self.mapper.emit_batch(sb1)
        alns2 = self.mapper.emit_batch(sb2)
        j1 = np.argmax(np.where(sb1.cand_valid, sb1.scores, -1), axis=1)
        j2 = np.argmax(np.where(sb2.cand_valid, sb2.scores, -1), axis=1)
        out: List[Tuple[Alignment, Alignment]] = []
        for i, (a1, a2) in enumerate(zip(alns1, alns2)):
            a1.fragment_next = Alignment(name=a2.name)
            a2.fragment_prev = Alignment(name=a1.name)
            frag = _fragment_length(self.mapper, sb1, i, int(j1[i]),
                                    sb2, i, int(j2[i]))
            if (frag is not None and a1.path is not None
                    and a2.path is not None
                    and frag <= self.params.max_fragment_length):
                for a in (a1, a2):
                    a.annotation["proper_pair"] = True
                    a.annotation["fragment_length"] = int(frag)
            elif a1.path is not None or a2.path is not None:
                for a in (a1, a2):
                    a.annotation["proper_pair"] = False
            out.append((a1, a2))
        return out

    def _drain_buffer(self) -> List[Tuple[Alignment, Alignment]]:
        out: List[Tuple[Alignment, Alignment]] = []
        buf, self._ambiguous_buffer = self._ambiguous_buffer, []
        bs = max(self.mapper.params.batch_reads, 64)
        for i in range(0, len(buf), bs):
            chunk = buf[i : i + bs]
            n_true = len(chunk)
            if 0 < n_true < bs:       # reuse the compiled batch shape
                chunk = chunk + [chunk[-1]] * (bs - n_true)
            out.extend(self.map_pairs(chunk)[:n_true])
        return out

    def finish(self) -> List[Tuple[Alignment, Alignment]]:
        """End-of-input flush: finalize the fragment model on whatever
        samples were seen and map all buffered ambiguous pairs."""
        if not self.fragdist.finalized:
            self.fragdist.finalize()
        return self._drain_buffer()

    def finish_encoded(self) -> List[bytes]:
        """finish() for the encoded-record output path."""
        recs: List[bytes] = []
        for a1, a2 in self.finish():
            recs.append(a1.encode())
            recs.append(a2.encode())
        return recs

    def _pair_select(self, sb1: ScoredBatch, sb2: ScoredBatch):
        """Vectorized pairing over the whole batch: all (C1, C2) candidate
        combos scored at once; returns chosen candidates + MAPQs (emission
        happens through the mapper's vectorized or encoded path)."""
        m = self.mapper
        p = m.params
        pp = self.params
        lam = log_base(p.match, p.mismatch)
        R = len(sb1.reads)
        C = sb1.scores.shape[1]
        B = p.band_radius
        s1 = sb1.scores.astype(np.float64)
        s2 = sb2.scores.astype(np.float64)
        v1 = sb1.cand_valid & (s1 > 0)
        v2 = sb2.cand_valid & (s2 > 0)
        # haplotype copies of one placement are one mapping; keep the best
        # copy per placement for both selection and MAPQ
        v1 = v1 & m._distinct_placements(sb1, v1)
        v2 = v2 & m._distinct_placements(sb2, v2)
        L1 = np.array([len(c) for c in sb1.codes])
        L2 = np.array([len(c) for c in sb2.codes])
        d1 = sb1.cand_start + B            # (R, C)
        d2 = sb2.cand_start + B
        rev1 = sb1.cand_rev
        rev2 = sb2.cand_rev

        # fragment span per combo (R, C, C): read1-fwd combos measure
        # d2+L2-d1, read1-rev combos d1+L1-d2. Mates may land on different
        # haplotype copies of the same region, so distance is measured in
        # reference-projected coordinates when both candidates project
        # (vg measures graph min-distance; ref projection is its linear
        # equivalent here), falling back to same-text-copy arithmetic.
        f_fwd = (d2[:, None, :] + L2[:, None, None]) - d1[:, :, None]
        f_rev = (d1[:, :, None] + L1[:, None, None]) - d2[:, None, :]
        frag_txt = np.where(rev1[:, :, None], f_rev, f_fwd).astype(np.float64)
        same_copy = sb1.cand_lo[:, :, None] == sb2.cand_lo[:, None, :]
        rp1, ro1 = sb1.cand_refpath, sb1.cand_refoff
        rp2, ro2 = sb2.cand_refpath, sb2.cand_refoff
        on_ref = (rp1[:, :, None] >= 0) & (rp1[:, :, None] == rp2[:, None, :])
        rf_fwd = (ro2[:, None, :] + L2[:, None, None]) - ro1[:, :, None]
        rf_rev = (ro1[:, :, None] + L1[:, None, None]) - ro2[:, None, :]
        frag_ref = np.where(rev1[:, :, None], rf_rev, rf_fwd).astype(np.float64)
        frag = np.where(same_copy, frag_txt,
                        np.where(on_ref, frag_ref, -1.0))
        proper = ((rev1[:, :, None] != rev2[:, None, :])
                  & (same_copy | on_ref)
                  & (frag > 0) & (frag <= pp.max_fragment_length)
                  & v1[:, :, None] & v2[:, None, :])
        ll = self.fragdist.log_likelihood(frag)
        pair_scaled = np.where(
            proper, lam * (s1[:, :, None] + s2[:, None, :]) + ll, -np.inf)
        flat = pair_scaled.reshape(R, C * C)
        best_combo = np.argmax(flat, axis=1)
        best_pair = flat[np.arange(R), best_combo]
        j1p = best_combo // C
        j2p = best_combo % C

        # independent fallback
        b1 = np.argmax(np.where(v1, s1, -np.inf), axis=1)
        b2 = np.argmax(np.where(v2, s2, -np.inf), axis=1)
        s1b = np.where(v1.any(axis=1), s1[np.arange(R), b1], 0.0)
        s2b = np.where(v2.any(axis=1), s2[np.arange(R), b2], 0.0)
        indep = lam * (s1b + s2b) - lam * pp.unpaired_penalty
        use_pair = np.isfinite(best_pair) & (best_pair >= indep)

        # pair MAPQ: logsumexp over proper combos; capped by each end's own
        # candidate ambiguity (+25 for the pair evidence)
        with np.errstate(over="ignore", invalid="ignore", divide="ignore"):
            mxp = best_pair
            lsep = mxp + np.log(
                np.nansum(np.exp(np.where(np.isfinite(flat),
                                          flat - mxp[:, None], -np.inf)),
                          axis=1))
            deltap = best_pair - lsep
            one_minus = np.where(deltap < -1e-12,
                                 np.log1p(-np.exp(np.minimum(deltap, -1e-12))),
                                 -50.0)
        mq_pair = np.clip(-10.0 / np.log(10.0) * one_minus, 0, p.max_mapq)
        mq_pair = np.where(np.isfinite(mq_pair), mq_pair, p.max_mapq)

        def end_mapq(s, v, chosen):
            sc = np.where(v, s * lam, -np.inf)
            mx = sc.max(axis=1, where=v, initial=-np.inf)
            with np.errstate(over="ignore", invalid="ignore", divide="ignore"):
                lse = mx + np.log(np.exp(sc - mx[:, None]).sum(axis=1))
                ch = s[np.arange(R), chosen] * lam
                delta = ch - lse
                om = np.where(delta < -1e-12,
                              np.log1p(-np.exp(np.minimum(delta, -1e-12))),
                              -50.0)
            mq = np.clip(-10.0 / np.log(10.0) * om, 0, p.max_mapq)
            return np.where(np.isfinite(mq), mq, p.max_mapq)

        j1 = np.where(use_pair, j1p, b1)
        j2 = np.where(use_pair, j2p, b2)
        mq1_solo = end_mapq(s1, v1, j1)
        mq2_solo = end_mapq(s2, v2, j2)
        mq1 = np.where(use_pair,
                       np.minimum(mq_pair, mq1_solo + 25), mq1_solo)
        mq2 = np.where(use_pair,
                       np.minimum(mq_pair, mq2_solo + 25), mq2_solo)
        any1 = v1.any(axis=1)
        any2 = v2.any(axis=1)
        frags = np.where(use_pair,
                         frag.reshape(R, C * C)[np.arange(R), best_combo], 0)
        return (j1, j2, np.clip(mq1, 0, p.max_mapq).astype(np.int32),
                np.clip(mq2, 0, p.max_mapq).astype(np.int32),
                any1, any2, use_pair, frags)

    def score_pairs(self, pairs: Sequence[Tuple[Read, Read]]):
        """Stage 1: seed + dispatch both sides as ONE folded 2R-read
        device dispatch (ScoredBatch.split keeps the score fetch lazy).
        Each dispatch→sync roundtrip carries fixed tunnel latency, so
        halving the dispatches matters more than the marginal compute."""
        m = self.mapper
        sb = m.score_reads([a for a, _ in pairs] + [b for _, b in pairs])
        return sb.split(len(pairs))

    # ------------------------------------------- device pair selection

    def _get_pair_step(self, layout):
        """Jitted single-chip paired step: per-mate DP + pair selection +
        MAPQ on device in ONE dispatch (parallel/mesh.make_paired_step
        math with the production Pallas scorer). Built lazily, cached
        per wire layout (Rpad, C, RW1, RW2); the whole input travels as
        ONE flat int32 buffer (ops/xfer.pack_wire) because every jit
        argument is a separate tunnel transfer with ~5-30 ms latency."""
        cache = self._pair_steps
        if layout in cache:
            return cache[layout]
        with self._compile_lock:
            return self._build_pair_step(cache, layout)

    def _build_pair_step(self, cache, layout):
        if layout not in cache:
            import jax

            from ..parallel.mesh import make_paired_step

            m = self.mapper
            p = m.params
            pp = self.params
            if m.text_packed_dev is not None:
                from ..ops.pallas_align import banded_scores_packed

                T = len(m.haps.text)

                def score_fn(text, reads, rc, rlen, cand):
                    return banded_scores_packed(
                        text, T, reads, rc, rlen, *cand[:5],
                        band_radius=p.band_radius, match=p.match,
                        mismatch=p.mismatch, gap_open=p.gap_open,
                        gap_extend=p.gap_extend, bonus=p.full_length_bonus)

                text_arg = m.text_packed_dev
            else:
                score_fn = None
                text_arg = m.text_dev
            step = make_paired_step(
                band_radius=p.band_radius, match=p.match,
                mismatch=p.mismatch, gap_open=p.gap_open,
                gap_extend=p.gap_extend, bonus=p.full_length_bonus,
                max_fragment_length=pp.max_fragment_length,
                unpaired_penalty=pp.unpaired_penalty,
                max_mapq=p.max_mapq, score_fn=score_fn,
                text_packed=m.text_packed_dev is not None,
                text_len=len(m.haps.text))

            import jax.numpy as jnp
            from jax import lax

            from ..ops.xfer import (revcomp_dev, unpack_i8_dev,
                                    unpack_reads4_dev)
            from ..parallel.mesh import derive_candidate_meta

            B = p.band_radius
            step_bonus = p.full_length_bonus
            Rpad, C, RW1, RW2, wire2 = (
                layout if len(layout) == 5 else (*layout, False))
            Cw = -(-C // 4)
            from ..ops.xfer import EXC_CAP, unpack_reads2_dev

            def packed_step(text, hb, stp, steps, nlen, nrp, nro, wirebuf):
                """Transfer-compressed paired step (see ops/xfer.py): the
                tunnel runs at ~10 MB/s, so reads arrive 4-bit packed
                (reverse complements derived here), candidates as just
                (start, rev|valid) — lo/hi/refpath/refoff are derived
                from the resident index arrays — the whole input is ONE
                int32 buffer and ALL outputs leave as ONE int16 buffer
                (each separate transfer pays ~5-30 ms)."""
                off = [0]

                def take(n, shape=None):
                    v = lax.slice(wirebuf, (off[0],), (off[0] + n,))
                    off[0] += n
                    return v.reshape(shape) if shape else v

                def take_mate(RW):
                    rp = take(Rpad * RW, (Rpad, RW))
                    rl = take(Rpad)
                    ca = take(Rpad * C, (Rpad, C))
                    cf = unpack_i8_dev(take(Rpad * Cw, (Rpad, Cw)), C)
                    exc = take(EXC_CAP) if wire2 else None
                    return rp, rl, ca, cf, exc

                rp1, rl1, ca1, cf1, exc1 = take_mate(RW1)
                rp2, rl2, ca2, cf2, exc2 = take_mate(RW2)
                musd = lax.bitcast_convert_type(take(2), jnp.float32)
                mu, sd = musd[0], musd[1]

                def mate(rp, rl, ca, cf, exc, RW):
                    if wire2:
                        r = unpack_reads2_dev(rp, rl, RW * 16, exc)
                    else:
                        r = unpack_reads4_dev(rp)
                    rc = revcomp_dev(r, rl)
                    valid = (cf & 1).astype(bool)
                    rev = ((cf >> 1) & 1).astype(bool)
                    lo, hi, rpth, ro = derive_candidate_meta(
                        ca + B, hb, stp, steps, nlen, nrp, nro)
                    return r, rc, (ca, lo, hi, rev, valid, rpth, ro)

                r1, r1rc, c1 = mate(rp1, rl1, ca1, cf1, exc1, RW1)
                r2, r2rc, c2 = mate(rp2, rl2, ca2, cf2, exc2, RW2)
                (s1, s2, j1, j2, mq1, mq2, use_pair, frags,
                 mm1, mm2, bits1, bits2, _stats, _cov) = step(
                    text, r1, r1rc, rl1, c1, r2, r2rc, rl2, c2, mu, sd)
                i16 = lambda a: jnp.clip(a, -32768, 32767).astype(jnp.int16)
                R_, C_ = s1.shape
                # wire-format choices must hold for BOTH mates' padded
                # read widths (asymmetrically trimmed pairs can differ)
                RLmax = max(r1.shape[1], r2.shape[1])
                # short-read scores fit int8 with a +64 bias (max score
                # RL + 2*bonus; deep negatives floor at -64, far below
                # any winner): halves the largest chunk of the fetch
                if RLmax + 2 * step_bonus <= 191 and C_ % 2 == 0:
                    pack_s = lambda s: lax.bitcast_convert_type(
                        jnp.clip(s - 64, -128, 127).astype(jnp.int8)
                        .reshape(R_, C_ // 2, 2), jnp.int16).ravel()
                else:
                    pack_s = lambda s: i16(s).ravel()
                # mismatch payload: first-8 positions (8 bytes/read) when
                # the read length fits a byte; full bitmap otherwise.
                # NOTE: bitmap widths W differ per mate when the padded
                # read widths differ, so pack_b is applied per mate and
                # the host splits the two payload blocks by each mate's
                # own width
                if RLmax <= 255:
                    from ..ops.xfer import bits_to_pos8_dev

                    pack_b = lambda b: lax.bitcast_convert_type(
                        bits_to_pos8_dev(b).reshape(R_, 4, 2),
                        jnp.int16).ravel()
                else:
                    pack_b = lambda b: lax.bitcast_convert_type(
                        b, jnp.int16).ravel()
                return jnp.concatenate([
                    pack_s(s1), pack_s(s2),
                    i16(j1), i16(j2), i16(mq1), i16(mq2),
                    use_pair.astype(jnp.int16), i16(jnp.round(frags)),
                    i16(mm1), i16(mm2),
                    pack_b(bits1), pack_b(bits2)])

            common = getattr(self, "_pair_step_common", None)
            if common is None:
                dev32 = lambda a: jax.device_put(np.asarray(a, np.int32))
                g = m.graph
                resident = (jax.device_put(
                                np.asarray(m.haps.text_start, np.int32)),
                            dev32(m.haps.step_text_pos),
                            dev32(m.haps.steps),
                            dev32(g.seq_start[1:] - g.seq_start[:-1]),
                            dev32(m._node_ref_path),
                            dev32(m._node_ref_off))
                common = self._pair_step_common = (text_arg, resident)
            cache[layout] = (jax.jit(packed_step),) + common
        return cache[layout]

    def _get_pair_step_seeded(self):
        """Jitted FULLY-fused paired dispatch: device-side minimizer
        seeding (ops/devseed.py) + DP + pair selection + MAPQ + winner
        payloads — input is just the 4-bit packed reads, output a
        winner-only int16 buffer (no candidate tables cross the tunnel
        in either direction)."""
        if getattr(self, "_pair_step_seeded", None) is not None:
            return self._pair_step_seeded
        with self._compile_lock:
            return self._build_pair_step_seeded()

    def _build_pair_step_seeded(self):
        if getattr(self, "_pair_step_seeded", None) is None:
            import jax
            import jax.numpy as jnp
            from jax import lax

            from ..ops.devseed import (rolling_minimizers,
                                       seed_candidates_dev)
            from ..ops.xfer import (bits_to_pos8_dev, revcomp_dev,
                                    unpack_reads4_dev)
            from ..parallel.mesh import (derive_candidate_meta,
                                         make_paired_step)

            m = self.mapper
            p = m.params
            pp = self.params
            if m.text_packed_dev is not None:
                from ..ops.pallas_align import banded_scores_packed

                T = len(m.haps.text)

                def score_fn(text, reads, rc, rlen, cand):
                    return banded_scores_packed(
                        text, T, reads, rc, rlen, *cand[:5],
                        band_radius=p.band_radius, match=p.match,
                        mismatch=p.mismatch, gap_open=p.gap_open,
                        gap_extend=p.gap_extend, bonus=p.full_length_bonus)

                text_arg = m.text_packed_dev
            else:
                score_fn = None
                text_arg = m.text_dev
            step = make_paired_step(
                band_radius=p.band_radius, match=p.match,
                mismatch=p.mismatch, gap_open=p.gap_open,
                gap_extend=p.gap_extend, bonus=p.full_length_bonus,
                max_fragment_length=pp.max_fragment_length,
                unpaired_penalty=pp.unpaired_penalty,
                max_mapq=p.max_mapq, score_fn=score_fn,
                text_packed=m.text_packed_dev is not None,
                text_len=len(m.haps.text))
            B = p.band_radius
            kk, ww = m.index.k, m.index.w
            seed_kw = dict(k=kk, hit_cap=p.hit_cap,
                           hard_hit_cap=p.hard_hit_cap,
                           score_fraction=p.score_fraction,
                           max_candidates=p.max_candidates,
                           band_radius=B)

            def seeded_step(text, hb, stp, steps, nlen, nrp, nro,
                            ih, il, ioff, ipos, irev, stab,
                            rp1, rl1, rp2, rl2, mu, sd):
                def mate(rp, rl):
                    r = unpack_reads4_dev(rp)
                    rc = revcomp_dev(r, rl)
                    kh, kl, cr, chosen, vld = rolling_minimizers(
                        r, rl, kk, ww)
                    ca, rev, cv = seed_candidates_dev(
                        kh, kl, cr, chosen, vld, rl,
                        ih, il, ioff, ipos, irev, stab, **seed_kw)
                    lo, hi, rpth, ro = derive_candidate_meta(
                        ca + B, hb, stp, steps, nlen, nrp, nro)
                    return r, rc, (ca, lo, hi, rev, cv, rpth, ro)

                r1, r1rc, c1 = mate(rp1, rl1)
                r2, r2rc, c2 = mate(rp2, rl2)
                if p.locality_sort:
                    # device-side locality sort: rows ordered by mate-1's
                    # top candidate position for the DP window gather,
                    # outputs inverse-permuted back (bit-identical)
                    from ..ops.pallas_seed import argsort_i32

                    key = jnp.where(c1[4][:, 0], c1[0][:, 0],
                                    jnp.int32(2**31 - 1))
                    perm = argsort_i32(key)
                    inv = argsort_i32(perm)
                    P = lambda a: jnp.take(a, perm, axis=0)
                    U = lambda a: jnp.take(a, inv, axis=0)
                    out = step(text, P(r1), P(r1rc), P(rl1),
                               tuple(P(a) for a in c1),
                               P(r2), P(r2rc), P(rl2),
                               tuple(P(a) for a in c2), mu, sd)
                    (s1, s2, j1, j2, mq1, mq2, use_pair, frags,
                     mm1, mm2, bits1, bits2, _stats, _cov) = (
                        [U(a) for a in out[:12]] + list(out[12:]))
                else:
                    (s1, s2, j1, j2, mq1, mq2, use_pair, frags,
                     mm1, mm2, bits1, bits2, _stats, _cov) = step(
                        text, r1, r1rc, rl1, c1, r2, r2rc, rl2, c2,
                        mu, sd)
                i16 = lambda a: jnp.clip(a, -32768,
                                         32767).astype(jnp.int16)
                take = lambda a, j: jnp.take_along_axis(
                    a, j[:, None], 1)[:, 0]
                R_ = s1.shape[0]

                def mate_out(s, j, c, mm, bits, mq):
                    ca, lo, hi, rev, cv, rpth, ro = c
                    ws = take(s, j)
                    wstart = take(ca, j)
                    wrev = take(rev, j)
                    wv = take(cv, j) & (ws > 0)
                    flags = (wv.astype(jnp.int16)
                             | (wrev.astype(jnp.int16) << 1))
                    return [i16(ws),
                            lax.bitcast_convert_type(
                                wstart.reshape(R_, 1),
                                jnp.int16).reshape(R_ * 2),
                            flags, i16(mq), i16(mm),
                            lax.bitcast_convert_type(
                                bits_to_pos8_dev(bits).reshape(R_, 4, 2),
                                jnp.int16).reshape(R_ * 4)]

                parts = (mate_out(s1, j1, c1, mm1, bits1, mq1)
                         + mate_out(s2, j2, c2, mm2, bits2, mq2)
                         + [use_pair.astype(jnp.int16),
                            i16(jnp.round(frags))])
                return jnp.concatenate(parts)

            self._pair_step_seeded = (
                jax.jit(seeded_step), text_arg, m._resident_arrays(),
                m._resident_seed_arrays())
        return self._pair_step_seeded

    def score_pairs_device_seeded(self, pairs: Sequence[Tuple[Read,
                                                              Read]]):
        """Fully-fused dispatch: reads in, winner-only buffer out; host
        candidate tables are synthesized as single-column (C=1)
        ScoredBatches at fetch time so rescue/emit run unchanged."""
        from ..ops.xfer import pack_reads4

        m = self.mapper
        reads1 = [a for a, _ in pairs]
        reads2 = [b for _, b in pairs]
        p1 = m.prepare_light(reads1)
        p2 = m.prepare_light(reads2)
        if max(p1["reads_arr"].shape[1], p2["reads_arr"].shape[1]) > 255:
            return self.score_pairs_device(pairs)   # pos8 wire limit
        import jax.numpy as jnp

        step, text_arg, resident, seed_res = self._get_pair_step_seeded()
        packed = step(text_arg, *resident, *seed_res,
                      pack_reads4(p1["reads_arr"]), p1["rlens"],
                      pack_reads4(p2["reads_arr"]), p2["rlens"],
                      jnp.float32(self.fragdist.mean),
                      jnp.float32(max(self.fragdist.stdev, 1e-3)))
        Rpad = p1["rlens"].shape[0]
        sb1 = ScoredBatch(
            reads=reads1, codes=p1["codes"], codes_rc=p1["codes_rc"],
            cand_start=None, cand_lo=None, cand_hi=None, cand_rev=None,
            cand_valid=None, scores_raw=None,
            codes2d=p1["reads_arr"], codes_rc2d=p1["reads_rc_arr"])
        sb2 = ScoredBatch(
            reads=reads2, codes=p2["codes"], codes_rc=p2["codes_rc"],
            cand_start=None, cand_lo=None, cand_hi=None, cand_rev=None,
            cand_valid=None, scores_raw=None,
            codes2d=p2["reads_arr"], codes_rc2d=p2["reads_rc_arr"])
        sel = ("seeded", packed, Rpad, sb1, sb2)
        return sb1, sb2, sel

    def _force_seeded_sel(self, sel, R: int):
        """Fetch the winner-only buffer and synthesize C=1 candidate
        tables (winner per mate) so all host stages run unchanged."""
        _, packed, Rpad, sb1, sb2 = sel
        m = self.mapper
        _t0 = _time.time()
        buf = np.asarray(packed)
        self.stage_seconds["dev_wait"] += _time.time() - _t0
        blk = 10 * Rpad

        def mate(sb, off):
            ws = buf[off : off + Rpad].astype(np.int32)
            start = np.ascontiguousarray(
                buf[off + Rpad : off + 3 * Rpad]).view(np.int32)
            flags = buf[off + 3 * Rpad : off + 4 * Rpad]
            mq = buf[off + 4 * Rpad : off + 5 * Rpad].astype(np.int32)
            mm = buf[off + 5 * Rpad : off + 6 * Rpad].astype(np.int32)
            pos8 = np.ascontiguousarray(
                buf[off + 6 * Rpad : off + 10 * Rpad]
                .reshape(Rpad, 4)).view(np.uint8)
            wv = (flags & 1).astype(bool)
            wrev = ((flags >> 1) & 1).astype(bool)
            diag = start.astype(np.int64) + m.params.band_radius
            hap = np.searchsorted(m.haps.text_start[1:],
                                  np.clip(diag, 0,
                                          len(m.haps.text) - 1),
                                  side="right")
            sb.cand_start = start[:R, None].copy()
            sb.cand_lo = m.haps.text_start[hap][:R, None].astype(np.int32)
            sb.cand_hi = m.haps.text_start[hap + 1][:R, None].astype(
                np.int32)
            sb.cand_rev = wrev[:R, None].copy()
            sb.cand_valid = wv[:R, None].copy()
            sb.scores_raw = np.where(wv, ws, -1)[:R, None].copy()
            rp, ro = m._diag_refproj(sb.cand_start, sb.cand_valid)
            sb.cand_refpath = rp
            sb.cand_refoff = ro
            sb.winner_mism = (np.zeros(R, np.int64), mm[:R],
                              pos8[:R].copy())
            return mq[:R]

        mq1 = mate(sb1, 0)
        mq2 = mate(sb2, blk)
        use_pair = buf[2 * blk : 2 * blk + Rpad][:R].astype(bool)
        frags = buf[2 * blk + Rpad : 2 * blk + 2 * Rpad][:R]
        z = np.zeros(R, np.int64)
        return (z, z.copy(), mq1, mq2, use_pair, frags)

    def score_pairs_device(self, pairs: Sequence[Tuple[Read, Read]]):
        """Seed both mates on the host, then one device dispatch computes
        scores AND pair selection/MAPQ. Returns (sb1, sb2, sel_lazy)
        where sel_lazy holds the un-fetched device outputs. Falls back to
        score_pairs when the fragment model isn't finalized yet (warmup
        observes pairs on the host)."""
        from ..ops.xfer import EXC_CAP, pack_reads2, pack_reads4, pack_wire

        m = self.mapper
        reads1 = [a for a, _ in pairs]
        reads2 = [b for _, b in pairs]
        wp2 = not getattr(self, "_wire4", False)
        p1 = m.prepare_batch(reads1, want_packed2=wp2)
        p2 = m.prepare_batch(reads2, want_packed2=wp2)
        R = len(pairs)
        # 2-bit read payload (half the dominant wire chunk; ~27 ms/batch
        # on the ~20 MB/s tunnel) unless a batch carries more than
        # EXC_CAP in-read Ns — then the mapper stays on the 4-bit layout
        # for its lifetime (a mid-stream layout flip costs a ~12 s XLA
        # recompile, worse than the bytes). The N count is permutation-
        # invariant, so the layout choice happens before locality sort.
        wire2 = not getattr(self, "_wire4", False)
        if wire2:
            n_ns = 0
            for pr in (p1, p2):
                if pr.get("n_exc", -1) >= 0:   # fused native encoder
                    n_ns += pr["n_exc"]
                else:
                    n_ns += int(np.count_nonzero(
                        (pr["reads_arr"] >= 4)
                        & (np.arange(pr["reads_arr"].shape[1])[None, :]
                           < pr["rlens"][:, None])))
            if n_ns > EXC_CAP:
                self._wire4 = True
                wire2 = False

        def wire(pr):
            """(packed reads, rlen, cand start, valid|rev flags[, exc])."""
            flags = (pr["cand_valid"].astype(np.int8)
                     | (pr["cand_rev"].astype(np.int8) << 1))
            if flags.shape[1] % 4:
                flags = np.concatenate(
                    [flags, np.zeros((flags.shape[0],
                                      -flags.shape[1] % 4), np.int8)], 1)
            if wire2:
                pk = pr.get("packed2")
                e = pr.get("exc2")
                if pk is not None and e is not None:
                    # prepacked by the fused native encoder (exception
                    # row ids must match the row order, so the locality-
                    # sort path only passes these through when empty)
                    exc = np.full(EXC_CAP, -1, np.int32)
                    exc[: len(e)] = e
                else:
                    pk, exc = pack_reads2(pr["reads_arr"], pr["rlens"])
                    exc = np.pad(exc[:EXC_CAP],
                                 (0, EXC_CAP - len(exc[:EXC_CAP])),
                                 constant_values=-1)
                return (pk, pr["rlens"], pr["cand_start"], flags, exc)
            return (pack_reads4(pr["reads_arr"]), pr["rlens"],
                    pr["cand_start"], flags)

        perm = None
        if m.params.locality_sort:
            # order reads by mate-1's top candidate position: the DP
            # window gather then sweeps the text near-sequentially
            # (profile_tpu gather A/B). Rows are independent in the
            # device step, so unpermuting the fetched buffer restores
            # bit-identical records.
            key = np.where(p1["cand_valid"][:, 0],
                           p1["cand_start"][:, 0], np.int32(2**31 - 1))
            perm = np.argsort(key, kind="stable")
            for pr in (p1, p2):
                for name in ("rlens", "cand_start",
                             "cand_valid", "cand_rev"):
                    pr["w_" + name] = pr[name][perm]
                if (wire2 and pr.get("packed2") is not None
                        and pr.get("n_exc", 1) == 0):
                    # permute the prepacked 2-bit words (0.3 MB) instead
                    # of the byte-code array (2 MB) — rows pack
                    # independently, so row permutation commutes with
                    # packing; N exceptions carry absolute row ids, so
                    # only exception-free batches ride this path
                    pr["w_packed2"] = pr["packed2"][perm]
                    pr["w_exc2"] = pr["exc2"][:0]
                else:
                    pr["w_reads_arr"] = pr["reads_arr"][perm]
            wire_src = lambda pr: {k[2:]: v for k, v in pr.items()
                                   if k.startswith("w_")}
            w1 = wire(wire_src(p1))
            w2 = wire(wire_src(p2))
        else:
            w1 = wire(p1)
            w2 = wire(p2)
        Rpad, C = p1["cand_start"].shape
        layout = (Rpad, C, w1[0].shape[1], w2[0].shape[1], wire2)
        step, text_arg, resident = self._get_pair_step(layout)
        wirebuf = pack_wire(
            list(w1) + list(w2),
            scalars=(self.fragdist.mean, max(self.fragdist.stdev, 1e-3)))
        packed = step(text_arg, *resident, wirebuf)
        bpw = 16 if wire2 else 8          # bases per packed read word
        RLmax = bpw * max(w1[0].shape[1], w2[0].shape[1])
        s_i8 = (RLmax + 2 * m.params.full_length_bonus <= 191
                and C % 2 == 0)
        pos_mode = RLmax <= 255
        # per-mate payload width in int16 units (bitmap widths follow
        # each mate's own padded read width)
        if pos_mode:
            pw1 = pw2 = 4
        else:
            pw1 = -(-(w1[0].shape[1] * bpw) // 32) * 2
            pw2 = -(-(w2[0].shape[1] * bpw) // 32) * 2
        sb1 = ScoredBatch(
            reads=reads1, codes=p1["codes"], codes_rc=p1["codes_rc"],
            cand_start=p1["cand_start"][:R], cand_lo=p1["cand_lo"][:R],
            cand_hi=p1["cand_hi"][:R], cand_rev=p1["cand_rev"][:R],
            cand_valid=p1["cand_valid"][:R], scores_raw=None,
            cand_refpath=p1["cand_refpath"], cand_refoff=p1["cand_refoff"])
        sb2 = ScoredBatch(
            reads=reads2, codes=p2["codes"], codes_rc=p2["codes_rc"],
            cand_start=p2["cand_start"][:R], cand_lo=p2["cand_lo"][:R],
            cand_hi=p2["cand_hi"][:R], cand_rev=p2["cand_rev"][:R],
            cand_valid=p2["cand_valid"][:R], scores_raw=None,
            cand_refpath=p2["cand_refpath"], cand_refoff=p2["cand_refoff"])
        sel = ("packed", packed, Rpad, C, sb1, sb2, s_i8, pos_mode,
               pw1, pw2, perm)
        return sb1, sb2, sel

    def _force_device_sel(self, sel, R: int):
        """ONE device fetch of the packed buffer; unpack scores + winner
        mismatch payloads into the two ScoredBatches and return the host
        selection arrays."""
        if sel[0] == "seeded":
            return self._force_seeded_sel(sel, R)
        (_, packed, Rpad, C, sb1, sb2, s_i8, pos_mode, pw1, pw2,
         perm) = sel
        _t0 = _time.time()
        buf = np.asarray(packed)          # int16 wire buffer
        self.stage_seconds["dev_wait"] += _time.time() - _t0
        if perm is not None:              # undo the locality sort
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            up = lambda rows: rows[inv]
        else:
            up = lambda rows: rows
        if s_i8:
            # biased-int8 score pairs inside int16 units
            n = Rpad * C // 2
            unpack_s = lambda a: up(np.ascontiguousarray(a)
                                    .view(np.int8).reshape(Rpad, C)
                                    )[:R].astype(np.int32) + 64
        else:
            n = Rpad * C
            unpack_s = lambda a: up(a.reshape(Rpad, C))[:R].astype(
                np.int32)
        sb1.scores_raw = unpack_s(buf[:n])
        sb2.scores_raw = unpack_s(buf[n : 2 * n])
        off = 2 * n
        rest = up(buf[off : off + 6 * Rpad].reshape(6, Rpad).T).T
        off += 6 * Rpad
        mm1 = up(buf[off : off + Rpad]).astype(np.int32)
        mm2 = up(buf[off + Rpad : off + 2 * Rpad]).astype(np.int32)
        off += 2 * Rpad
        # mismatch payload: 8 uint8 positions (pos_mode) or bitmap words,
        # both traveling as int16 halves (lax.bitcast little-endian);
        # widths are per mate
        raw1 = np.ascontiguousarray(
            up(buf[off : off + Rpad * pw1].reshape(Rpad, pw1)))
        raw2 = np.ascontiguousarray(
            up(buf[off + Rpad * pw1 :].reshape(Rpad, pw2)))
        conv = (lambda a: a.view(np.uint8)) if pos_mode else \
            (lambda a: a.view(np.int32))
        sb1.winner_mism = (rest[0, :R].astype(np.int64), mm1[:R],
                           conv(raw1)[:R])
        sb2.winner_mism = (rest[1, :R].astype(np.int64), mm2[:R],
                           conv(raw2)[:R])
        return (rest[0, :R], rest[1, :R], rest[2, :R], rest[3, :R],
                rest[4, :R].astype(bool), rest[5, :R])

    def map_pairs_encoded(self, pairs: Sequence[Tuple[Read, Read]],
                          scored=None):
        """Paired mapping with native encoded GAM output: interleaved
        records (r1, r2, ...) with fragment linkage and pair annotations
        appended as protobuf suffixes. None if the native path is off."""
        if not pairs:
            return []
        m = self.mapper
        reads1 = [a for a, _ in pairs]
        reads2 = [b for _, b in pairs]
        if scored is not None:
            sb1, sb2 = scored
        else:
            sb1, sb2 = self.score_pairs(pairs)
        extra: List[bytes] = []
        if not self.fragdist.finalized:
            part = self._warmup_partition(pairs, sb1, sb2)
            if part is not None:
                unamb = part
                if not unamb:
                    return []
                sub1 = _subset(sb1, unamb)
                sub2 = _subset(sb2, unamb)
                recs = []
                for a1, a2 in self._map_unambiguous(sub1, sub2):
                    recs.append(a1.encode())
                    recs.append(a2.encode())
                return recs
            # finalized on this batch: flush warmup buffer afterwards.
            # Pad short chunks up to the compiled batch shape (same ~12s
            # recompile avoidance as stage_score) and drop the padding
            # records after encoding.
            buf, self._ambiguous_buffer = self._ambiguous_buffer, []
            bs = max(m.params.batch_reads, 64)
            for i in range(0, len(buf), bs):
                chunk_pairs = buf[i : i + bs]
                n_true = len(chunk_pairs)
                if 0 < n_true < bs:
                    chunk_pairs = chunk_pairs + [chunk_pairs[-1]] * (
                        bs - n_true)
                chunk = self.map_pairs_encoded(chunk_pairs)
                if chunk is None:
                    chunk = [a.encode()
                             for a in self.map_pairs_flat(chunk_pairs)]
                extra.extend(chunk[: 2 * n_true])
        self._rescue(sb1, sb2)
        self._rescue(sb2, sb1)
        out = self._emit_pairs_encoded(pairs, sb1, sb2)
        if out is None:
            return None
        return out + extra

    def _emit_pairs_encoded(self, pairs, sb1: ScoredBatch, sb2: ScoredBatch,
                            sel=None):
        """Pair-select (unless precomputed on device) + encoded emission
        + fragment linkage."""
        import os as _os

        m = self.mapper
        prof = _os.environ.get("VGTPU_EMIT_PROF")
        tprof = _time.perf_counter if prof else None
        if sel is None:
            sel = self._pair_select(sb1, sb2)
        j1, j2, mq1, mq2, any1, any2, use_pair, frags = sel
        _t = tprof() if prof else 0
        mq1 = m.apply_mapq_caps(sb1, mq1)
        mq2 = m.apply_mapq_caps(sb2, mq2)
        if prof:
            _t2 = tprof()
            self._eprof("caps", _t2 - _t)
            _t = _t2
        res1 = m.emit_chosen_spans(sb1, j1, mq1, any1)
        res2 = m.emit_chosen_spans(sb2, j2, mq2, any2)
        if prof:
            _t2 = tprof()
            self._eprof("spans", _t2 - _t)
            _t = _t2
        if res1 is None or res2 is None:
            return None
        out = self._finalize_pairs_native(pairs, res1[1], res2[1],
                                          any1, any2, use_pair, frags)
        if prof:
            self._eprof("finalize", tprof() - _t)
        if out is not None:
            return out
        recs1 = m.records_from_spans(*res1)
        recs2 = m.records_from_spans(*res2)
        from ..io.wire import field_bytes, field_str

        improper = _annotation_suffix(False, 0)
        out = []
        for i in range(len(pairs)):
            # fragment_next (12) on read1, fragment_prev (11) on read2:
            # inline single-byte-varint wire building (tag 98/90, inner
            # name field tag 26) — the generic field_bytes/field_str
            # call chain was ~30% of emit time at production batch sizes
            nb1 = pairs[i][1].name.encode()
            nb2 = pairs[i][0].name.encode()
            if len(nb1) < 124 and len(nb2) < 124:
                nm1 = bytes((98, len(nb1) + 2, 26, len(nb1))) + nb1
                nm2 = bytes((90, len(nb2) + 2, 26, len(nb2))) + nb2
            else:
                nm1 = field_bytes(12, field_str(3, pairs[i][1].name))
                nm2 = field_bytes(11, field_str(3, pairs[i][0].name))
            if use_pair[i]:
                suffix = _annotation_suffix(True, int(frags[i]))
            elif any1[i] or any2[i]:
                suffix = improper
            else:
                suffix = b""
            out.append(bytes(recs1[i]) + nm1 + suffix)
            out.append(bytes(recs2[i]) + nm2 + suffix)
        return out

    def _finalize_pairs_native(self, pairs, sp1, sp2, any1, any2,
                               use_pair, frags):
        """Assemble the final interleaved pair records (record bytes +
        fragment_next/prev mate-name field + annotation suffix) via ONE
        native scatter-gather copy (concat_spans). Per-record Python in
        the old loop (bytes() copies, concatenation, suffix lookups) was
        ~1/3 of emit time at production batch sizes. Returns the record
        list (memoryview slices of one buffer) or None to fall back."""
        from ..native import native_concat_spans

        R = len(pairs)
        if R == 0:
            return []
        from .giraffe import str_blob

        n1_off, n1_blob = str_blob([a.name for a, _ in pairs])
        n2_off, n2_blob = str_blob([b.name for _, b in pairs])
        l1 = np.diff(n1_off)
        l2 = np.diff(n2_off)
        if max(int(l1.max()), int(l2.max())) >= 124:
            return None      # multi-byte varint names: generic wire path
        # single-byte-varint name-field prefixes (same bytes as the
        # fallback loop): rec1 gets fragment_next (tag 98) wrapping
        # mate2's name, rec2 gets fragment_prev (tag 90) wrapping mate1's
        pre = np.empty((2, R, 4), np.uint8)
        pre[0, :, 0] = 98
        pre[0, :, 1] = l2 + 2
        pre[0, :, 2] = 26
        pre[0, :, 3] = l2
        pre[1, :, 0] = 90
        pre[1, :, 1] = l1 + 2
        pre[1, :, 2] = 26
        pre[1, :, 3] = l1
        prebuf = np.ascontiguousarray(pre.reshape(-1))
        # suffix table: fragment lengths cluster in a few hundred values,
        # so encode each unique annotation Struct once
        use_pair = np.asarray(use_pair, bool)
        anyb = np.asarray(any1, bool) | np.asarray(any2, bool)
        fr = np.where(use_pair, np.asarray(frags).astype(np.int64), 0)
        uf = (np.unique(fr[use_pair]) if use_pair.any()
              else np.zeros(0, np.int64))
        suf_parts = [_annotation_suffix(False, 0)] + \
            [_annotation_suffix(True, int(v)) for v in uf]
        suf_lens = np.array([len(x) for x in suf_parts], np.int64)
        suf_offs = np.zeros(len(suf_parts) + 1, np.int64)
        np.cumsum(suf_lens, out=suf_offs[1:])
        suf_blob = b"".join(suf_parts)
        sidx = np.zeros(R, np.int64)
        if len(uf):
            sidx[use_pair] = np.searchsorted(uf, fr[use_pair]) + 1
        s_off = suf_offs[sidx]
        s_len = np.where(~use_pair & ~anyb, 0, suf_lens[sidx])
        # span table: 4 spans per record, 2 records per pair, flattened
        # row-major so output records interleave (r1, r2) per pair
        bufs1, id1, off1, len1 = sp1
        bufs2, id2, off2, len2 = sp2
        sources = (list(bufs1) + list(bufs2)
                   + [n1_blob, n2_blob, prebuf, suf_blob])
        N1, N2, PRE, SUF = 6, 7, 8, 9
        sid = np.empty((R, 8), np.uint8)
        soff = np.empty((R, 8), np.int64)
        slen = np.empty((R, 8), np.int64)
        ar = np.arange(R, dtype=np.int64)
        sid[:, 0] = id1
        soff[:, 0] = off1
        slen[:, 0] = len1
        sid[:, 1] = PRE
        soff[:, 1] = 4 * ar
        slen[:, 1] = 4
        sid[:, 2] = N2
        soff[:, 2] = n2_off[:-1]
        slen[:, 2] = l2
        sid[:, 3] = SUF
        soff[:, 3] = s_off
        slen[:, 3] = s_len
        sid[:, 4] = id2 + 3
        soff[:, 4] = off2
        slen[:, 4] = len2
        sid[:, 5] = PRE
        soff[:, 5] = 4 * (R + ar)
        slen[:, 5] = 4
        sid[:, 6] = N1
        soff[:, 6] = n1_off[:-1]
        slen[:, 6] = l1
        sid[:, 7] = SUF
        soff[:, 7] = s_off
        slen[:, 7] = s_len
        flat_len = np.ascontiguousarray(slen.reshape(-1))
        dst = np.zeros(8 * R + 1, np.int64)
        np.cumsum(flat_len, out=dst[1:])
        outbuf = native_concat_spans(
            sources, sid.reshape(-1), soff.reshape(-1), flat_len,
            dst[:-1], int(dst[-1]))
        if outbuf is None:
            return None
        bl = dst[::4].tolist()           # 2R+1 record boundaries
        mv = memoryview(outbuf)
        return [mv[a:b] for a, b in zip(bl, bl[1:])]

    # ------------------------------------------------- pipeline stages

    def stage_score(self, batch):
        """First pipeline stage: seed + one device dispatch. Once the
        fragment model is finalized the dispatch also computes pair
        selection + MAPQ on device (score_pairs_device); during warmup
        the host observes pairs itself."""
        _t0 = _time.time()
        try:
            return self._stage_score_inner(batch)
        finally:
            with self._stat_lock:
                _t1 = _time.time()
                self.stage_seconds["score"] += _t1 - _t0
                self.stage_reads += 2 * len(batch)
                if self.stage_trace is not None:
                    self.stage_trace.append(("score", _t0, _t1))

    def _stage_score_inner(self, batch):
        if self.fragdist.finalized:
            bs = self.mapper.params.batch_reads
            if 0 < len(batch) < bs:
                # pad a short (final) batch up to the compiled batch
                # shape: reusing the hot executable wastes <0.5 s of
                # device compute; a fresh shape costs a ~12 s XLA
                # recompile (measured) — the dominant stall in any
                # streaming run whose read count isn't a batch multiple
                padded = _PaddedBatch(batch)
                padded.extend([batch[-1]] * (bs - len(batch)))
                padded.true_len = len(batch)
                batch = padded
            if self.mapper.params.device_seed:
                return ("dev", batch,
                        self.score_pairs_device_seeded(batch))
            return ("dev", batch, self.score_pairs_device(batch))
        return ("host", batch, self.score_pairs(batch))

    def stage_rescue(self, item_or_batch, scored=None):
        """Middle pipeline stage: force the main DP fetch and dispatch
        rescue DP; the rescue fetch stays lazy for stage_emit."""
        _t0 = _time.time()
        try:
            return self._stage_rescue_inner(item_or_batch, scored)
        finally:
            _t1 = _time.time()
            self.stage_seconds["rescue"] += _t1 - _t0
            if self.stage_trace is not None:
                with self._stat_lock:
                    self.stage_trace.append(("rescue", _t0, _t1))

    def _stage_rescue_inner(self, item_or_batch, scored=None):
        if scored is not None:                       # legacy signature
            item = ("host", item_or_batch, scored)
        else:
            item = item_or_batch
        kind, batch = item[0], item[1]
        tl = getattr(batch, "true_len", None)
        if kind == "dev":
            sb1, sb2, sel = item[2]
            # the packed fetch fills sb1/sb2 scores as a side effect
            selh = self._force_device_sel(sel, len(batch))
            st2 = self._rescue_begin(sb1, sb2, tl)
            st1 = self._rescue_begin(sb2, sb1, tl)
            return ("main_dev", batch, sb1, sb2, st1, st2, selh)
        sb1, sb2 = item[2]
        if not self.fragdist.finalized:
            return ("warmup", batch, (sb1, sb2))
        _ = sb1.scores
        _ = sb2.scores
        st2 = self._rescue_begin(sb1, sb2, tl)   # rescues sb2
        st1 = self._rescue_begin(sb2, sb1, tl)   # rescues sb1
        return ("main", batch, sb1, sb2, st1, st2)

    def _eprof(self, key, dt):
        """Accumulate emit sub-stage seconds (VGTPU_EMIT_PROF=1)."""
        with self._stat_lock:
            d = getattr(self, "_emit_prof", None)
            if d is None:
                d = self._emit_prof = {}
            d[key] = d.get(key, 0.0) + dt

    def stage_emit(self, item):
        """Final pipeline stage: finish rescues, pair, emit encoded.
        Safe to call from multiple emitter threads on DISTINCT items
        once the fragment model is finalized (batch-local state only);
        warmup items mutate the fragment model / ambiguous buffer and
        are serialized by the emit lock."""
        _t0 = _time.time()
        out = self._stage_emit_inner(item)
        batch = item[1]
        if isinstance(batch, _PaddedBatch) and out is not None:
            out = out[: 2 * batch.true_len]
        _t1 = _time.time()
        with self._stat_lock:
            self.stage_seconds["emit"] += _t1 - _t0
            if self.stage_trace is not None:
                self.stage_trace.append(("emit", _t0, _t1))
        return out

    def _stage_emit_inner(self, item):
        if item[0] == "warmup":
            _, batch, scored = item
            with self._emit_lock:
                recs = self.map_pairs_encoded(batch, scored=scored)
                if recs is None:
                    recs = [a.encode() for a in self.map_pairs_flat(batch)]
            return recs
        if item[0] == "main_dev":
            import os as _os

            prof = _os.environ.get("VGTPU_EMIT_PROF")
            _t = _time.perf_counter() if prof else 0
            _, batch, sb1, sb2, st1, st2, selh = item
            self._rescue_finish(sb2, st2)
            self._rescue_finish(sb1, st1)
            # pairs whose candidates changed via rescue re-select on host
            rows = sorted({i for (i, _) in (st2[0] if st2 else ())}
                          | {i for (i, _) in (st1[0] if st1 else ())})
            sel = tuple(a.copy() for a in selh)
            if prof:
                self._eprof("rescue_fin", _time.perf_counter() - _t)
            if rows:
                # rescue replaced candidates in these rows: their device
                # winner bitmaps describe stale candidates — invalidate
                for sbx in (sb1, sb2):
                    if sbx.winner_mism is not None:
                        sbx.winner_mism[0][rows] = -1
                sub1 = _subset(sb1, rows)
                sub2 = _subset(sb2, rows)
                rs = self._pair_select(sub1, sub2)
                # rs = (j1, j2, mq1, mq2, any1, any2, use_pair, frags)
                for arr, sub_arr in zip(sel, (rs[0], rs[1], rs[2], rs[3],
                                              rs[6], rs[7])):
                    arr[rows] = np.asarray(sub_arr)[: len(rows)]
            if prof:
                _t = _time.perf_counter()
            j1, j2, mq1, mq2, use_pair, frags = sel
            any1 = (sb1.cand_valid & (sb1.scores > 0)).any(axis=1)
            any2 = (sb2.cand_valid & (sb2.scores > 0)).any(axis=1)
            if prof:
                self._eprof("reselect", _time.perf_counter() - _t)
            out = self._emit_pairs_encoded(
                batch, sb1, sb2,
                sel=(j1, j2, mq1, mq2, any1, any2, use_pair, frags))
            if out is None:
                out = []
                for a1, a2 in self._map_pairs_finalized(batch, sb1, sb2):
                    out.append(a1.encode())
                    out.append(a2.encode())
            return out
        _, batch, sb1, sb2, st1, st2 = item
        self._rescue_finish(sb2, st2)
        self._rescue_finish(sb1, st1)
        out = self._emit_pairs_encoded(batch, sb1, sb2)
        if out is None:
            out = []
            for a1, a2 in self._map_pairs_finalized(batch, sb1, sb2):
                out.append(a1.encode())
                out.append(a2.encode())
        return out

    def map_pairs_flat(self, pairs) -> List[Alignment]:
        out = []
        for a1, a2 in self.map_pairs(pairs):
            out.append(a1)
            out.append(a2)
        return out

    # ----------------------------------------------------------- pairing

    # ----------------------------------------------------------- rescue

    def _rescue(self, sb_have: ScoredBatch, sb_need: ScoredBatch) -> None:
        """Synchronous rescue: begin + finish in one call."""
        self._rescue_finish(sb_need, self._rescue_begin(sb_have, sb_need))

    def _rescue_begin(self, sb_have: ScoredBatch, sb_need: ScoredBatch,
                      n_rows: Optional[int] = None):
        """For each pair where sb_need has no valid candidate but sb_have
        maps well, seed-scan the fragment window around the mate on the
        haplotype text and dispatch one batched DP call for the rescue
        candidates. Returns opaque state for _rescue_finish (None when
        nothing to rescue); the device fetch stays lazy so a pipeline can
        overlap it with other batches."""
        m = self.mapper
        p = m.params
        pp = self.params
        text = m.haps.text
        B = p.band_radius
        mu, sd = self.fragdist.mean, self.fragdist.stdev
        radius = int(mu + pp.rescue_stdevs * sd)

        need_any = (sb_need.cand_valid & (sb_need.scores > 0)).any(axis=1)
        have_v = sb_have.cand_valid & (sb_have.scores > 0)
        have_any = have_v.any(axis=1)
        cand_js = np.argmax(np.where(have_v, sb_have.scores, -1), axis=1)
        rows = np.nonzero(~need_any & have_any)[0]
        if n_rows is not None:
            # padded tail rows replicate batch[-1]: skip their rescue DP
            rows = rows[rows < n_rows]
        todo = [(int(i), int(cand_js[i])) for i in rows]
        if not todo:
            return None

        C = pp.max_rescue_candidates
        R = len(sb_need.reads)
        r_start = np.zeros((R, C), np.int32)
        r_lo = np.zeros((R, C), np.int32)
        r_hi = np.zeros((R, C), np.int32)
        r_rev = np.zeros((R, C), bool)
        r_valid = np.zeros((R, C), bool)
        for i, j in todo:
            mate_diag = int(sb_have.cand_start[i, j]) + B
            mate_rev = bool(sb_have.cand_rev[i, j])
            lo = int(sb_have.cand_lo[i, j])
            hi = int(sb_have.cand_hi[i, j])
            L_mate = len(sb_have.codes[i])
            # expected window: downstream of a forward mate, upstream of a
            # reverse mate; rescued read is on the opposite strand
            if not mate_rev:
                wlo = mate_diag
                whi = min(hi, mate_diag + radius + L_mate)
            else:
                wlo = max(lo, mate_diag + L_mate - radius - L_mate)
                whi = mate_diag + L_mate
            wlo = max(wlo, lo)
            whi = min(whi, hi)
            if whi - wlo < 20:
                continue
            need = sb_need.codes[i] if mate_rev else sb_need.codes_rc[i]
            diags = _seed_scan(text[wlo:whi], need, pp.rescue_seed_k)
            for jj, d in enumerate(diags[:C]):
                r_start[i, jj] = wlo + int(d) - B
                r_lo[i, jj] = lo
                r_hi[i, jj] = hi
                r_rev[i, jj] = not mate_rev
                r_valid[i, jj] = True
        if not r_valid.any():
            return None
        scores = self._score_rescues_host(sb_need, r_start, r_lo, r_hi,
                                          r_rev, r_valid)
        if scores is None:   # no native lib: one extra device roundtrip
            scores = m.rescore_candidates(sb_need, r_start, r_lo, r_hi,
                                          r_rev, r_valid, force=False)
        return todo, r_start, r_lo, r_hi, r_rev, r_valid, scores

    def _score_rescues_host(self, sb_need, r_start, r_lo, r_hi, r_rev,
                            r_valid):
        """Score the (few) rescue candidates with the native host DP —
        a device dispatch would pay full tunnel latency and queue behind
        the next batches' main DP."""
        from ..native import native_banded_scores_host

        m = self.mapper
        p = m.params
        B = p.band_radius
        ii, jj = np.nonzero(r_valid)
        n = len(ii)
        Lmax = max(len(sb_need.codes[i]) for i in set(ii.tolist()))
        TW = Lmax + 2 * B
        reads = np.full((n, Lmax), 5, np.uint8)
        rlen = np.zeros(n, np.int32)
        for t, i in enumerate(ii):
            c = sb_need.codes_rc[i] if r_rev[i, jj[t]] else sb_need.codes[i]
            reads[t, : len(c)] = c
            rlen[t] = len(c)
        text = m.haps.text
        pos = r_start[ii, jj].astype(np.int64)[:, None] + np.arange(TW)
        ok = ((pos >= r_lo[ii, jj][:, None]) & (pos < r_hi[ii, jj][:, None])
              & (pos >= 0) & (pos < len(text)))
        wins = np.where(ok, text[np.clip(pos, 0, len(text) - 1)],
                        6).astype(np.uint8)
        from ..ops.align import Scoring

        sc = native_banded_scores_host(
            reads, wins, rlen, B,
            Scoring(p.match, p.mismatch, p.gap_open, p.gap_extend,
                    p.full_length_bonus))
        if sc is None:
            return None
        out = np.full(r_valid.shape, -1, np.int32)
        out[ii, jj] = sc
        return out

    def _rescue_finish(self, sb_need: ScoredBatch, state) -> None:
        if state is None:
            return
        todo, r_start, r_lo, r_hi, r_rev, r_valid, scores_dev = state
        r_scores = np.asarray(scores_dev)
        if self.mapper.params.track_provenance:
            got = int(((r_scores > 0) & r_valid).any(axis=1).sum())
            self.mapper.funnel.filter("rescue", "mate-rescue",
                                      len(todo), got)
        # merge rescue candidates into the batch tables (replace empty slots)
        for i, _ in todo:
            got = r_valid[i] & (r_scores[i] > 0)
            if not got.any():
                continue
            order = np.argsort(-r_scores[i])
            n = min(int(got.sum()), sb_need.cand_start.shape[1])
            sel = order[:n]
            sb_need.cand_start[i, :n] = r_start[i, sel]
            sb_need.cand_lo[i, :n] = r_lo[i, sel]
            sb_need.cand_hi[i, :n] = r_hi[i, sel]
            sb_need.cand_rev[i, :n] = r_rev[i, sel]
            sb_need.cand_valid[i, :n] = True
            sb_need.scores[i, :n] = r_scores[i, sel]
            sb_need.scores[i, n:] = -1
            sb_need.cand_valid[i, n:] = False


# ---------------------------------------------------------------- helpers

def _subset(sb: ScoredBatch, idx: Sequence[int]) -> ScoredBatch:
    """New ScoredBatch restricted to the given read indices."""
    ii = np.asarray(idx, np.int64)
    cut = lambda a: None if a is None else a[ii]
    return ScoredBatch(
        reads=[sb.reads[i] for i in idx],
        codes=[sb.codes[i] for i in idx],
        codes_rc=[sb.codes_rc[i] for i in idx],
        cand_start=sb.cand_start[ii], cand_lo=sb.cand_lo[ii],
        cand_hi=sb.cand_hi[ii], cand_rev=sb.cand_rev[ii],
        cand_valid=sb.cand_valid[ii], scores_raw=sb.scores[ii],
        cand_refpath=cut(sb.cand_refpath), cand_refoff=cut(sb.cand_refoff))


def _unique_best_batch(sb: ScoredBatch, mapper: GiraffeMapper
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """(best candidate index, is-unique) per read, with haplotype copies
    of one placement collapsed before judging ambiguity."""
    s = sb.scores
    R = len(sb.reads)
    v = sb.cand_valid & (s > 0)
    vd = v & mapper._distinct_placements(sb, v)
    sm = np.where(vd, s, -1)
    j = np.argmax(sm, axis=1)
    ar = np.arange(R)
    best = sm[ar, j]
    L = np.array([len(c) for c in sb.codes])
    solid = best >= 0.8 * L
    sm2 = sm.copy()
    sm2[ar, j] = -1
    second = sm2.max(axis=1) if sm2.shape[1] else np.full(R, -1)
    unique = solid & ((vd.sum(axis=1) <= 1) | (second < best - 5))
    return j, unique


def _unique_best(sb: ScoredBatch, i: int) -> Optional[int]:
    """Candidate index if read i maps uniquely and confidently."""
    v = sb.cand_valid[i] & (sb.scores[i] > 0)
    if not v.any():
        return None
    s = np.where(v, sb.scores[i], -1)
    order = np.argsort(-s)
    best = int(order[0])
    L = len(sb.codes[i])
    if s[best] < L * 0.8:                      # solid alignment only
        return None
    if v.sum() > 1 and s[int(order[1])] >= s[best] - 5:
        return None                             # ambiguous
    return best


def _fragment_length(m: GiraffeMapper, sb1: ScoredBatch, i1: int, j1: int,
                     sb2: ScoredBatch, i2: int, j2: int) -> Optional[float]:
    """Outer fragment span if the two candidates are properly oriented on
    the same haplotype copy, or on different copies that both project to
    the same reference path; else None."""
    B = m.params.band_radius
    rev1 = bool(sb1.cand_rev[i1, j1])
    rev2 = bool(sb2.cand_rev[i2, j2])
    if rev1 == rev2:
        return None
    L1, L2 = len(sb1.codes[i1]), len(sb2.codes[i2])
    if sb1.cand_lo[i1, j1] == sb2.cand_lo[i2, j2]:   # same haplotype copy
        d1 = int(sb1.cand_start[i1, j1]) + B
        d2 = int(sb2.cand_start[i2, j2]) + B
    elif (sb1.cand_refpath is not None and sb2.cand_refpath is not None
          and sb1.cand_refpath[i1, j1] >= 0
          and sb1.cand_refpath[i1, j1] == sb2.cand_refpath[i2, j2]):
        d1 = int(sb1.cand_refoff[i1, j1])            # ref projection
        d2 = int(sb2.cand_refoff[i2, j2])
    else:
        return None
    if not rev1:                                # read1 fwd, read2 rev
        frag = (d2 + L2) - d1
    else:                                       # read2 fwd, read1 rev
        frag = (d1 + L1) - d2
    return float(frag) if frag > 0 else None


def _seed_scan(window: np.ndarray, read: np.ndarray, k: int) -> np.ndarray:
    """Exact-kmer scan of read vs a text window; returns candidate diagonals
    (window-relative) ordered by support. Rescue's replacement for
    re-running full seeding (vg re-aligns the whole window instead)."""
    if len(window) < k or len(read) < k:
        return np.zeros(0, np.int64)

    def pack(c):
        from numpy.lib.stride_tricks import sliding_window_view
        w = sliding_window_view(np.where(c < 4, c, 0).astype(np.uint64), k)
        sh = np.uint64(2) * np.arange(k - 1, -1, -1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (w << sh).sum(axis=1, dtype=np.uint64)

    wk = pack(window)
    rk = pack(read)
    order = np.argsort(wk, kind="stable")
    wks = wk[order]
    lo = np.searchsorted(wks, rk, side="left")
    hi = np.searchsorted(wks, rk, side="right")
    diags = []
    for ri in range(len(rk)):
        for x in range(int(lo[ri]), int(hi[ri])):
            diags.append(int(order[x]) - ri)
    if not diags:
        return np.zeros(0, np.int64)
    d = np.array(diags)
    vals, counts = np.unique(d // 8, return_counts=True)
    best = vals[np.argsort(-counts)]
    out = []
    for b in best:
        members = d[d // 8 == b]
        out.append(int(np.median(members)))
    return np.array(out, np.int64)


_SUFFIX_CACHE: dict = {}


def _annotation_suffix(proper: bool, fragment_length: int) -> bytes:
    """Encoded `annotation` Struct (field 100) with proper_pair and
    fragment_length — appended to native records (protobuf field order is
    free, so suffix concatenation is valid). Memoized: fragment lengths
    cluster in a few hundred values, and re-encoding a Struct per pair was
    a measurable slice of emit time."""
    key = (proper, fragment_length)
    out = _SUFFIX_CACHE.get(key)
    if out is None:
        from ..io.gam import _encode_struct
        from ..io.wire import field_bytes

        d = {"proper_pair": proper}
        if fragment_length:
            d["fragment_length"] = fragment_length
        out = field_bytes(100, _encode_struct(d))
        if len(_SUFFIX_CACHE) < 65536:
            _SUFFIX_CACHE[key] = out
    return out
