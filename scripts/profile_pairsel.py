"""Time the full device paired step (DP + pair selection + MAPQ) on the
chip with production-like shapes (R=6144 pairs, C=8 candidates) — the A/B
harness for the selection-block layout work (TODO perf item 3: the
(R,C,C) combo math pads C=8 to 128 lanes, 16x waste; candidate-major
(C,C,R) puts the read axis on the lanes).

Usage:  python scripts/profile_pairsel.py [R] [C] [iters]
Prints step wall time (device-only, inputs resident) and a rough
selection share estimated by also timing a scores-only step.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from vg_tpu.ops import align as align_ops
    from vg_tpu.parallel.mesh import make_paired_step

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    RL = 152
    B = 16
    T = 5_000_000
    rng = np.random.default_rng(0)
    text = rng.integers(0, 4, T).astype(np.uint8)

    def mate(starts):
        reads = np.zeros((R, RL), np.uint8)
        for i in range(R):
            reads[i] = text[starts[i] : starts[i] + RL]
        rc = reads[:, ::-1] ^ 3
        rlen = np.full(R, RL, np.int32)
        cs = np.zeros((R, C), np.int64)
        cs[:, 0] = starts - B
        cs[:, 1:] = rng.integers(0, T - 2 * RL, (R, C - 1))
        lo = np.zeros((R, C), np.int64)
        hi = np.full((R, C), T, np.int64)
        rev = np.zeros((R, C), bool)
        rev[:, 1::2] = True
        valid = np.ones((R, C), bool)
        rp = np.zeros((R, C), np.int32)
        ro = cs.astype(np.int64).copy()
        return reads, rc, rlen, (cs, lo, hi, rev, valid, rp, ro)

    s1 = rng.integers(0, T - 3000, R)
    m1 = mate(s1)
    m2 = mate(s1 + 350)

    import os
    if os.environ.get("PACKED", "1") == "1":
        from vg_tpu.ops.pallas_align import banded_scores_packed, pack_text

        text_use = pack_text(text)

        def score_fn(t, reads, rc, rlen, cand):
            return banded_scores_packed(
                t, T, reads, rc, rlen, *cand[:5], band_radius=B)

        step = make_paired_step(band_radius=B, text_len=T,
                                score_fn=score_fn, text_packed=True)
    else:
        text_use = text
        score_fn = None
        step = make_paired_step(band_radius=B, text_len=T)
    dev = jax.devices()[0]
    put = lambda x: jax.device_put(np.asarray(x), dev)
    t_d = put(text_use)
    a1 = [put(x) for x in m1[:3]] + [tuple(put(x) for x in m1[3])]
    a2 = [put(x) for x in m2[:3]] + [tuple(put(x) for x in m2[3])]
    jstep = jax.jit(step)
    args = (t_d, *a1, *a2, jnp.float32(450.0), jnp.float32(50.0))
    sink = lambda out: np.asarray(jax.tree_util.tree_leaves(out)[2][:4])
    sink(jstep(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sink(jstep(*args))
    full = (time.perf_counter() - t0) / iters

    # scores-only twin: same DP, no selection
    def scores_only(text, r1, r1rc, rl1, c1, r2, r2rc, rl2, c2, mu, sd):
        if score_fn is not None:
            return score_fn(text, r1, r1rc, rl1, c1), \
                score_fn(text, r2, r2rc, rl2, c2)
        s1 = align_ops.banded_scores(text, r1, r1rc, rl1, *c1[:5],
                                     band_radius=B)
        s2 = align_ops.banded_scores(text, r2, r2rc, rl2, *c2[:5],
                                     band_radius=B)
        return s1, s2

    jsc = jax.jit(scores_only)
    sink2 = lambda out: np.asarray(out[0][:4])
    sink2(jsc(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sink2(jsc(*args))
    sc = (time.perf_counter() - t0) / iters
    print(f"R={R} C={C} full_step={full*1e3:.1f} ms  scores_only={sc*1e3:.1f} ms"
          f"  selection~={(full-sc)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
