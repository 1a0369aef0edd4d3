"""Microbenchmark: XLA-scan DP vs Pallas DP at bench shapes."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from vg_tpu.ops import align as align_ops
from vg_tpu.ops.pallas_align import banded_scores_via_pallas

R, C, RL, B = 2048, 8, 160, 16
T = 5_000_000
rng = np.random.default_rng(0)
text = jnp.asarray(rng.integers(0, 4, T).astype(np.uint8))
reads = rng.integers(0, 4, (R, RL)).astype(np.uint8)
reads_rc = (3 - reads)[:, ::-1].copy()
rlen = np.full(R, 150, np.int32)
cand_start = rng.integers(0, T - RL - 2 * B, (R, C)).astype(np.int32)
cand_lo = np.zeros((R, C), np.int32)
cand_hi = np.full((R, C), T, np.int32)
cand_rev = rng.integers(0, 2, (R, C)).astype(bool)
cand_valid = np.ones((R, C), bool)

args = (text, reads, reads_rc, rlen, cand_start, cand_lo, cand_hi,
        cand_rev, cand_valid)
kw = dict(band_radius=B)

for name, fn in [("xla_scan", align_ops.banded_scores),
                 ("pallas", banded_scores_via_pallas)]:
    out = np.asarray(fn(*args, **kw))  # compile
    t0 = time.time()
    n_it = 20
    for _ in range(n_it):
        r = fn(*args, **kw)
    r.block_until_ready()
    dt = (time.time() - t0) / n_it
    print(f"{name:10s} {dt*1e3:8.2f} ms/batch  {R/dt:9.0f} reads/s  "
          f"({R*C*RL*(2*B+1)/dt/1e9:.1f} Gcell/s)")

a = np.asarray(align_ops.banded_scores(*args, **kw))
b = np.asarray(banded_scores_via_pallas(*args, **kw))
print("parity:", np.array_equal(a, b),
      "" if np.array_equal(a, b) else (a != b).sum())
