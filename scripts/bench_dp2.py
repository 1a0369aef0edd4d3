"""Isolate wrapper-gather cost vs raw kernel cost."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from vg_tpu.ops import align as align_ops
from vg_tpu.ops.pallas_align import banded_scores_pallas, _round_up, LANES

R, C, RL, B = 2048, 8, 160, 16
T = 5_000_000
N = R * C
W = 2 * B + 1
WP = _round_up(W, 8)
TW = RL + 2 * B
TWP = _round_up(TW + (WP - W) + 16, 8)
NP = _round_up(N, LANES)

rng = np.random.default_rng(0)
text = jnp.asarray(rng.integers(0, 4, T).astype(np.uint8))
start = jnp.asarray(rng.integers(0, T - TWP, N).astype(np.int32))
reads_t = jnp.asarray(rng.integers(0, 4, (RL, R)).astype(np.uint8))
ridx = jnp.arange(N, dtype=jnp.int32) // C
rlen = jnp.full(NP, 150, jnp.int32)


@jax.jit
def gather_only(text, start, reads_t):
    pos = start[None, :] + jnp.arange(TWP, dtype=jnp.int32)[:, None]
    win_t = text[jnp.clip(pos, 0, T - 1)]
    rd_t = reads_t[:, ridx]
    return win_t, rd_t


win_t, rd_t = jax.block_until_ready(gather_only(text, start, reads_t))
win_t = jnp.pad(win_t, ((0, 0), (0, NP - N)), constant_values=6)
rd_t = jnp.pad(rd_t, ((0, 0), (0, NP - N)), constant_values=5)


def timeit(name, fn, *a, n_it=20):
    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(n_it):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_it
    print(f"{name:14s} {dt*1e3:8.2f} ms   {R/dt:9.0f} reads/s")
    return out


timeit("gather_only", gather_only, text, start, reads_t)


# raw kernel on pre-transposed inputs (win already lane-major)
from vg_tpu.ops.pallas_align import make_kernel
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.jit
def kernel_only(win_t, rd_t, rlen):
    kernel = make_kernel(RL, TW, W, WP, 1, 4, 6, 1, 5)
    return pl.pallas_call(
        kernel,
        grid=(NP // LANES,),
        in_specs=[
            pl.BlockSpec((TWP, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RL, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, NP), jnp.int32),
    )(win_t, rd_t, rlen[None, :])


timeit("kernel_only", kernel_only, win_t, rd_t, rlen)
