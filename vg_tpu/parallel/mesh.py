"""Device-mesh sharding for the mapping pipeline.

The reference parallelizes with OpenMP threads over read batches
(vg::io::for_each_parallel, reference src/subcommand/giraffe_main.cpp:2369)
and merges coverage with binned mutexes (src/packer.hpp:119-156). The
TPU-native equivalent (SURVEY.md §2.3): reads are data-parallel across the
mesh, the haplotype text / minimizer arrays are replicated in HBM, and
reductions (pack coverage, fragment-length stats) ride ICI as psums.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import align as align_ops


def make_mesh(n_devices: Optional[int] = None, axis: str = "data",
              devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_map_step(mesh: Mesh, text, reads, reads_rc, rlen,
                     cand_start, cand_lo, cand_hi, cand_rev, cand_valid,
                     band_radius: int = 16):
    """One data-parallel mapping step over the mesh.

    Scores every (read, candidate) with the banded DP (reads sharded on the
    data axis, text replicated), then reduces a per-shard text-coverage
    histogram with a psum — the same collective pattern the pack stage uses
    to merge coverage across shards.

    Returns (scores, coverage): scores (R, C) sharded like the reads,
    coverage (buckets,) fully replicated (already psummed).
    """
    axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P(axis))

    text = jax.device_put(text, repl)
    reads = jax.device_put(reads, shard0)
    reads_rc = jax.device_put(reads_rc, shard0)
    rlen = jax.device_put(rlen, shard0)
    cands = [jax.device_put(a, shard0)
             for a in (cand_start, cand_lo, cand_hi, cand_rev, cand_valid)]
    cand_start, cand_lo, cand_hi, cand_rev, cand_valid = cands

    n_buckets = 1024

    @jax.jit
    def step(text, reads, reads_rc, rlen, cand_start, cand_lo, cand_hi,
             cand_rev, cand_valid):
        scores = align_ops.banded_scores(
            text, reads, reads_rc, rlen, cand_start, cand_lo, cand_hi,
            cand_rev, cand_valid, band_radius=band_radius)
        # winner text bucket per read -> coverage histogram (pack-style
        # scatter_add); XLA inserts the cross-shard reduction because the
        # output is unsharded while inputs are data-sharded
        best = jnp.argmax(scores, axis=1)
        best_score = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
        start = jnp.take_along_axis(cand_start, best[:, None], axis=1)[:, 0]
        bucket = jnp.clip(start // jnp.maximum(text.shape[0] // n_buckets, 1),
                          0, n_buckets - 1)
        cov = jnp.zeros((n_buckets,), jnp.int32).at[bucket].add(
            (best_score > 0).astype(jnp.int32))
        return scores, cov

    out_shardings = (shard0, repl)
    step_sharded = jax.jit(step.__wrapped__, out_shardings=out_shardings)
    with mesh:
        return step_sharded(text, reads, reads_rc, rlen, cand_start,
                            cand_lo, cand_hi, cand_rev, cand_valid)
