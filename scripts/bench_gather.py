"""Compare window-gather strategies for the DP wrapper."""
import time

import jax
import jax.numpy as jnp
import numpy as np

R, C, RL, B = 2048, 8, 160, 16
T = 5_000_000
N = R * C
TW = RL + 2 * B
TWP = 200

rng = np.random.default_rng(0)
text_np = rng.integers(0, 4, T).astype(np.uint8)
text = jnp.asarray(text_np)
text_i32 = jnp.asarray(text_np.astype(np.int32))
# 4-bit packed: 8 bases per int32 word, little-endian within word
pad = (-len(text_np)) % 8 + 16
tp = np.concatenate([text_np, np.full(pad, 6, np.uint8)]).astype(np.uint32)
packed = np.zeros(len(tp) // 8, np.uint32)
for b in range(8):
    packed |= tp[b::8] << np.uint32(4 * b)
text_packed = jnp.asarray(packed.view(np.int32))

start = jnp.asarray(rng.integers(0, T - TWP - 64, N).astype(np.int32))
reads_t = jnp.asarray(rng.integers(0, 4, (RL, R)).astype(np.uint8))
reads_rc_t = jnp.asarray(rng.integers(0, 4, (RL, R)).astype(np.uint8))
rev = jnp.asarray(rng.integers(0, 2, N).astype(bool))
ridx = jnp.arange(N, dtype=jnp.int32) // C

NW = TWP // 8 + 2   # words per window incl. realign slack


@jax.jit
def gather_u8(start):
    pos = start[None, :] + jnp.arange(TWP, dtype=jnp.int32)[:, None]
    return text[jnp.clip(pos, 0, T - 1)]


@jax.jit
def gather_i32(start):
    pos = start[None, :] + jnp.arange(TWP, dtype=jnp.int32)[:, None]
    return text_i32[jnp.clip(pos, 0, T - 1)]


@jax.jit
def gather_packed(start):
    w0 = start // 8
    m = (start % 8).astype(jnp.uint32)           # base misalignment
    widx = w0[None, :] + jnp.arange(NW, dtype=jnp.int32)[:, None]
    words = text_packed[jnp.clip(widx, 0, text_packed.shape[0] - 1)]
    wu = words.astype(jnp.uint32)
    sh = 4 * m                                    # (N,)
    lo = wu >> sh[None, :]
    hi = jnp.where(m == 0, jnp.uint32(0), wu << (32 - sh)[None, :])
    aligned = lo.at[:-1].set(lo[:-1] | hi[1:])    # (NW, N) aligned words
    # unpack: row j of output = base (j%8) of aligned word j//8
    rep = jnp.repeat(aligned[: TWP // 8 + 1], 8, axis=0)[:TWP]
    shifts = (4 * (jnp.arange(TWP, dtype=jnp.uint32) % 8))[:, None]
    return ((rep >> shifts) & jnp.uint32(15)).astype(jnp.uint8)


@jax.jit
def reads_gather(rev):
    return jnp.where(rev[None, :], reads_rc_t[:, ridx], reads_t[:, ridx])


@jax.jit
def reads_repeat(rev):
    f = jnp.repeat(reads_t, C, axis=1)
    r = jnp.repeat(reads_rc_t, C, axis=1)
    return jnp.where(rev[None, :], r, f)


def timeit(name, fn, *a, n_it=30):
    out = jax.block_until_ready(fn(*a))
    t0 = time.time()
    for _ in range(n_it):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_it
    print(f"{name:14s} {dt*1e3:8.2f} ms")
    return out


a = timeit("gather_u8", gather_u8, start)
timeit("gather_i32", gather_i32, start)
b = timeit("gather_packed", gather_packed, start)
timeit("reads_gather", reads_gather, rev)
timeit("reads_repeat", reads_repeat, rev)
print("packed parity:", bool(jnp.all(a == b)))
print("reads parity:", bool(jnp.all(reads_gather(rev) == reads_repeat(rev))))
