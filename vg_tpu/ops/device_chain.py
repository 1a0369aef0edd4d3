"""Device (TPU) twin of the anchor-chaining DP.

Reference role: algorithms/chain_items.cpp chain_items_dp — the
sequential sparse-chaining recurrence behind the hifi/r10 long-read
presets (minimizer_mapper_from_chains.cpp:1646). SURVEY §7 step 9 plans
it as a segmented scan; this is that scan: anchors sorted by
(text_pos, read_off) stream through a `lax.scan` whose carry is a
rolling window of the last J anchors' (f, roff, tpos, index), so each
step scores all J candidate predecessors as one vector op and the whole
batch of reads advances in lockstep. Work is O(N * J) with everything
on the VPU — identical shape to the numpy/native host DP
(map/chain.chain_anchors), which remains the production default on
tunnel-attached chips (the anchor arrays are small; the win appears
when anchors already live on device next to the link engine).

Semantics match chain_anchors element-for-element: window = previous J
anchors in sort order, first-maximum argmax, strict improvement over
the anchor's own score, parent -1 otherwise. Floating point is float32
on device (the host DP is float64); parity tests assert exactness for
exactly-representable parameter sets and tight allclose otherwise.
"""
from __future__ import annotations

from functools import partial

import numpy as np

NEGF = np.float32(-3.0e38)


def _build_step():
    import jax

    @partial(jax.jit, static_argnames=("J", "kmer", "max_lookback",
                                       "max_indel"))
    def chain_scan(roff, tpos, ascore, valid, J: int, kmer: int,
                   max_lookback: int, max_indel: int,
                   gap_scale, gap_open):
        import jax.numpy as jnp
        from jax import lax

        R, N = roff.shape
        gap_scale = jnp.float32(gap_scale)
        gap_open = jnp.float32(gap_open)

        def step(carry, xs):
            fwin, rwin, twin, jwin = carry           # (R, J) each
            r_i, t_i, s_i, v_i, i = xs               # (R,) + scalar
            dt = (t_i[:, None] - twin).astype(jnp.int32)
            dr = (r_i[:, None] - rwin).astype(jnp.int32)
            ok = ((jwin >= 0) & (dr > 0) & (dt > 0)
                  & (dt <= max_lookback)
                  & (jnp.abs(dt - dr) <= max_indel))
            gap = jnp.abs(dt - dr).astype(jnp.float32)
            gain = jnp.minimum(jnp.minimum(dr, dt),
                               kmer).astype(jnp.float32)
            cost = jnp.where(gap > 0, gap_open + gap_scale * gap,
                             jnp.float32(0))
            cand = jnp.where(ok, fwin + gain - cost, NEGF)
            best = jnp.argmax(cand, axis=1)          # first max, like np
            bv = jnp.take_along_axis(cand, best[:, None], 1)[:, 0]
            base = s_i.astype(jnp.float32)
            better = bv > base
            f_i = jnp.where(better, bv, base)
            p_i = jnp.where(
                better,
                jnp.take_along_axis(jwin, best[:, None], 1)[:, 0],
                jnp.int32(-1))
            f_i = jnp.where(v_i, f_i, NEGF)
            p_i = jnp.where(v_i, p_i, jnp.int32(-1))
            j_i = jnp.where(v_i, jnp.full((R,), i, jnp.int32),
                            jnp.int32(-1))
            sh = lambda w, nv: jnp.concatenate(
                [w[:, 1:], nv[:, None]], axis=1)
            return ((sh(fwin, f_i), sh(rwin, r_i), sh(twin, t_i),
                     sh(jwin, j_i)), (f_i, p_i))

        init = (jnp.full((R, J), NEGF),
                jnp.zeros((R, J), jnp.int32),
                jnp.zeros((R, J), jnp.int32),
                jnp.full((R, J), -1, jnp.int32))
        xs = (roff.T, tpos.T, ascore.T, valid.T,
              jnp.arange(N, dtype=jnp.int32))
        _, (f, parent) = lax.scan(step, init, xs)
        return f.T, parent.T                          # back to (R, N)

    return chain_scan


_SCAN = None


def _scan():
    global _SCAN
    if _SCAN is None:
        _SCAN = _build_step()
    return _SCAN


def chain_anchors_device_batch(roff, tpos, ascore, valid, params):
    """Batched device chain DP over (R, N) anchor arrays (each row
    sorted by (tpos, roff), padded with valid=False trailing slots).
    Returns host (f float32 (R, N), parent int32 (R, N))."""
    import jax.numpy as jnp

    roff = np.ascontiguousarray(roff, np.int32)
    tpos = np.ascontiguousarray(tpos, np.int32)
    ascore = np.ascontiguousarray(ascore, np.float32)
    valid = np.ascontiguousarray(valid, bool)
    R, N = roff.shape
    J = int(min(params.lookback_cands, max(N - 1, 1)))
    f, parent = _scan()(
        jnp.asarray(roff), jnp.asarray(tpos), jnp.asarray(ascore),
        jnp.asarray(valid), J=J, kmer=int(params.kmer),
        max_lookback=int(params.max_lookback),
        max_indel=int(params.max_indel),
        gap_scale=float(params.gap_scale),
        gap_open=float(params.gap_open))
    return np.asarray(f), np.asarray(parent)


def chain_anchors_device(roff, tpos, ascore, params):
    """Single-problem signature matching map/chain.chain_anchors:
    returns (f, parent) for anchors already sorted by (tpos, roff)."""
    n = len(roff)
    if n == 0:
        return (np.zeros(0, np.float64), np.zeros(0, np.int64))
    f, parent = chain_anchors_device_batch(
        np.asarray(roff, np.int64)[None, :],
        np.asarray(tpos, np.int64)[None, :],
        np.asarray(ascore, np.float64)[None, :],
        np.ones((1, n), bool), params)
    return f[0].astype(np.float64), parent[0].astype(np.int64)
