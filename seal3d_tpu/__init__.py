"""seal3d_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the Seal-3D stack.

A from-scratch framework with the capabilities of windingwind/seal-3d
(Seal-3D: Interactive Pixel-Level Editing for NeRFs, built on torch-ngp),
re-designed TPU-first:

- compute path: JAX/XLA with Pallas kernels for the hot ops
  (multires hash-grid encoding, occupancy-bitfield ray marching),
- static shapes + masked/compacted marching instead of CUDA's
  atomic-counter irregular kernels,
- SPMD scaling over a `jax.sharding.Mesh` (data-parallel ray batches,
  replicated fields, XLA collectives) instead of DDP/NCCL,
- a functional core: params as pytrees, optax optimizers, one jitted
  train step.

Reference layer map and parity targets live in /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

import jax as _jax

# rbg is dramatically faster than the default threefry on TPU (measured ~10x
# on v5e for bulk uniforms); NeRF training draws rays/jitter/bg noise every
# step, so the generator choice is on the hot path.
try:  # pragma: no cover
    _jax.config.update("jax_default_prng_impl", "rbg")
except Exception:
    pass
