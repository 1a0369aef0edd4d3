"""vg_tpu — a TPU-native pangenome graph toolkit.

A from-scratch reimplementation of the capabilities of vgteam/vg (variation
graph toolkit) designed for TPU hardware:

- The pangenome graph is an immutable structure-of-arrays (CSR topology,
  packed sequence pool, path runs) that lives in HBM as jnp arrays.
- Read mapping (giraffe-style seed / cluster / extend / align) runs as a
  fixed-shape batched JAX pipeline with the DP inner loops written in Pallas.
- Haplotype-aware mapping uses a "haplotype text" layout: all indexed
  haplotypes concatenated into one coordinate space, making haplotype-
  consistent extension a dense gather/compare instead of an FM-index walk.
- Coverage packing and snarl genotyping are segmented reductions.
- Multi-chip scaling is data-parallel over a jax.sharding.Mesh with psum
  merges for coverage / fragment statistics.

Reference behavior is documented against vgteam/vg (cited as file:line in
docstrings); the implementation is new and TPU-first.
"""

__version__ = "0.1.0"

import os as _os

# persistent XLA compilation cache: first TPU compile of each pipeline
# shape costs tens of seconds (more through a tunneled device); cache it
# across processes unless the user chose their own location
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/vg_tpu/jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
