"""Multiresolution hash/tiled grid encoding (instant-NGP style), XLA-native.

Equivalent of the reference gridencoder CUDA extension
(gridencoder/src/gridencoder.cu:87-366 fwd/bwd, gridencoder/grid.py wrapper):
L levels of 3D grids, dense ("tiled") when the level fits the table, hashed
with the 3-prime XOR hash otherwise; trilinear (or smoothstep) interpolation
of per-corner feature vectors.

TPU design notes:
- All 8*L corner lookups for a batch are fused into ONE `jnp.take` gather so
  XLA emits a single large gather instead of 128 small ones.
- The backward pass (gradient scatter, reference gridencoder.cu:245-337
  atomicAdd) is the autodiff transpose of the gather: XLA lowers it to a
  sorted scatter-add — order-independent, no atomics needed.
- Input gradients (reference's optional dy_dx Jacobian path,
  gridencoder.cu:198-241) come for free from autodiff through the
  interpolation weights (d frac / dx = level scale; floor contributes zero).
- The table stays fp32 (the reference also keeps grids fp32-master under AMP,
  gridencoder/grid.py:41-44); activations downstream may be bf16.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import cached_property
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861, 3674653429)


def _corner_offsets(dim: int) -> np.ndarray:
    """Static [2^dim, dim] corner offsets of a grid cell."""
    return np.array(
        [[(i >> d) & 1 for d in range(dim)] for i in range(2**dim)], dtype=np.int64
    )


@dataclass(frozen=True)
class HashGridConfig:
    """Static hash-grid hyperparameters (mirrors reference get_encoder args,
    encoding.py:44-77)."""

    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int = 2048
    gridtype: str = "hash"  # 'hash' | 'tiled'
    align_corners: bool = False
    interpolation: str = "linear"  # 'linear' | 'smoothstep'
    input_dim: int = 3  # 2 for the background sphere encoder
    # 'xla' gathers via jnp.take (any table size); 'pallas' routes lookups
    # through the blocked one-hot MXU kernel (ops/pallas/lookup.py) — every
    # level is padded to the full 2^log2_hashmap_size so the level stack is
    # one [L, F, R, 128] VMEM-resident array. TPU-native configs should use
    # 'pallas' with log2_hashmap_size <= 16.
    backend: str = "xla"

    @cached_property
    def per_level_scale(self) -> float:
        if self.num_levels <= 1:
            return 1.0
        return math.exp(
            math.log(self.desired_resolution / self.base_resolution)
            / (self.num_levels - 1)
        )

    @cached_property
    def level_params(self) -> Tuple[Tuple[int, int, int, bool, float], ...]:
        """Per level: (resolution, offset, params_in_level, use_hash, scale).

        `scale` is the FRACTIONAL interpolation scale base*g^l - 1 used by the
        reference kernel (gridencoder.cu:138: exp2f(level*S)*H - 1); the
        integer `resolution` (= ceil(scale)+1 entries per axis) only sizes the
        dense table / clips corner coords. Using resolution-1 as the interp
        scale would sample up to a full cell off vs reference checkpoints.
        """
        out = []
        offset = 0
        hashmap_size = 2**self.log2_hashmap_size
        for lvl in range(self.num_levels):
            scale = self.base_resolution * (self.per_level_scale**lvl) - 1.0
            # Entries per axis: the reference's ceil(scale)+1 grid resolution
            # plus one extra entry when corners are not aligned
            # (gridencoder.cu:74: stride *= align_corners ? res : res+1).
            resolution = int(math.ceil(scale)) + (1 if self.align_corners else 2)
            dense_size = resolution**self.input_dim
            # Align each level's block to 8 entries (matches reference layout
            # logic in gridencoder/grid.py). The pallas backend pads every
            # level to the full table so levels stack uniformly.
            if self.backend == "pallas":
                params_in_level = hashmap_size
            else:
                params_in_level = min(((dense_size + 7) // 8) * 8, hashmap_size)
            use_hash = self.gridtype == "hash" and dense_size > hashmap_size
            out.append((resolution, offset, params_in_level, use_hash, scale))
            offset += params_in_level
        return tuple(out)

    @cached_property
    def total_params(self) -> int:
        res, off, n, _, _ = self.level_params[-1]
        return off + n

    @cached_property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def hashgrid_init(key: jax.Array, cfg: HashGridConfig, std: float = 1e-4) -> jnp.ndarray:
    """Uniform(-std, std) init, matching reference grid.py (std=1e-4)."""
    return jax.random.uniform(
        key, (cfg.total_params, cfg.level_dim), jnp.float32, -std, std
    )


def _corner_indices(pos0: jnp.ndarray, resolution: int, use_hash: bool,
                    params_in_level: int, dim: int) -> jnp.ndarray:
    """[M, 2^dim, dim] int corner coords -> [M, 2^dim] table-local indices."""
    if use_hash:
        c = pos0.astype(jnp.uint32)
        h = c[..., 0] * jnp.uint32(_PRIMES[0])
        for d in range(1, dim):
            h = h ^ c[..., d] * jnp.uint32(_PRIMES[d])
        return (h & jnp.uint32(params_in_level - 1)).astype(jnp.int32)
    # Tiled (dense) indexing; when the dense level exceeds the table the index
    # wraps modulo table size (reference GridTypeTiled semantics) — strides are
    # computed in uint32 with natural wraparound.
    if resolution**dim <= params_in_level:
        stride = jnp.array([resolution**d for d in range(dim)], dtype=jnp.int32)
        idx = (pos0.astype(jnp.int32) * stride).sum(-1)
        return jnp.minimum(idx, params_in_level - 1)
    stride = jnp.array([(resolution**d) & 0xFFFFFFFF for d in range(dim)],
                       dtype=jnp.uint32)
    idx = (pos0.astype(jnp.uint32) * stride).sum(-1)
    return (idx % jnp.uint32(params_in_level)).astype(jnp.int32)


def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig) -> jnp.ndarray:
    """Encode positions.

    Args:
      table: [total_params, F] feature table.
      x: [..., input_dim] positions in [0, 1] (callers normalize by scene
        bound, like the reference does at nerf/network.py:100).
      cfg: static config.

    Returns:
      [..., L * F] features (level-major, matching reference output layout
      after its [L,B,C]->[B,L*C] permute, gridencoder/grid.py:47-57).

    The feature width is taken from `table.shape[-1]`, which may exceed
    cfg.level_dim: `hashgrid_encode_stacked` fuses several same-config tables
    (e.g. NGP's sigma + color encoders, which share every corner index) into
    one widened gather.
    """
    dim = cfg.input_dim
    f_dim = table.shape[-1]
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, dim).astype(jnp.float32)
    m = xf.shape[0]

    if cfg.backend == "pallas" and dim == 3 and not cfg.align_corners:
        # fully-fused kernel: index math + interpolation + lookup in VMEM
        from seal3d_tpu.ops.pallas.hash_encode import hash_encode_fused

        t = 2**cfg.log2_hashmap_size
        rows = max(t // 128, 1)
        stack = table.reshape(cfg.num_levels, rows, 128, f_dim)
        stack = stack.transpose(0, 3, 1, 2)  # [L, F, R, 128]
        out = hash_encode_fused(stack, xf, cfg)
        return out.reshape(*batch_shape, cfg.num_levels * f_dim)

    corners = jnp.asarray(_corner_offsets(dim), dtype=jnp.int32)  # [2^dim, dim]
    n_corners = 2**dim

    all_idx = []
    all_w = []
    for resolution, offset, params_in_level, use_hash, scale in cfg.level_params:
        # Fractional interp scale (base*g^l - 1), NOT resolution-1 — matches
        # the reference kernel exactly (gridencoder.cu:138,148).
        pos = xf * scale + (0.0 if cfg.align_corners else 0.5)
        # Guard inputs slightly outside [0,1]; at the top edge frac becomes 0 so
        # the (clipped) +1 corner gets zero weight.
        pos = jnp.clip(pos, 0.0, float(resolution - 1))
        pos0 = jnp.floor(pos)
        frac = pos - pos0
        if cfg.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        cpos = pos0[:, None, :] + corners[None, :, :]  # [M, 2^dim, dim]
        cpos = jnp.clip(cpos, 0, resolution - 1)
        idx = _corner_indices(cpos, resolution, use_hash, params_in_level, dim) + offset
        w = jnp.where(corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :])
        w = w.prod(-1)  # [M,8]
        all_idx.append(idx)
        all_w.append(w)

    idx = jnp.stack(all_idx, axis=1)  # [M, L, 2^dim]
    w = jnp.stack(all_w, axis=1)  # [M, L, 2^dim]
    if cfg.backend == "pallas":
        from seal3d_tpu.ops.pallas.lookup import multilevel_lookup

        t = 2**cfg.log2_hashmap_size
        assert t % (128 * 128) == 0 or t <= 128 * 128, t
        rows = max(t // 128, 1)
        # flat [L*T, F] -> [L, F, R, 128]; level-local indices (drop offsets)
        stack = table.reshape(cfg.num_levels, rows, 128, f_dim)
        stack = stack.transpose(0, 3, 1, 2)
        offsets = jnp.asarray([off for _, off, _, _, _ in cfg.level_params],
                              jnp.int32)
        idx_local = (idx - offsets[None, :, None]).transpose(1, 0, 2).reshape(
            cfg.num_levels, m * n_corners)
        vals = multilevel_lookup(stack, idx_local)  # [L, M*2^dim, F]
        feats = vals.reshape(cfg.num_levels, m, n_corners, f_dim)
        out = (feats * w.transpose(1, 0, 2)[..., None]).sum(axis=2)  # [L, M, F]
        out = out.transpose(1, 0, 2)
    else:
        feats = jnp.take(table, idx.reshape(m, -1), axis=0).reshape(
            m, cfg.num_levels, n_corners, f_dim
        )
        out = (feats * w[..., None]).sum(axis=2)  # [M, L, F]
    return out.reshape(*batch_shape, cfg.num_levels * f_dim)


def hashgrid_encode_stacked(tables, x: jnp.ndarray, cfg: HashGridConfig):
    """Encode through several SAME-CONFIG tables with one fused gather.

    NGP's sigma and color hash grids (reference nerf/network.py:32,56) share
    every corner index and interpolation weight for a given x — gathering a
    feature-concatenated table halves the index math / lookup count, and on
    the Pallas backend widens the per-mask matmul (better MXU utilization).

    Args:
      tables: sequence of [total_params, F_i] tables.
      x: [..., input_dim] positions in [0, 1].
    Returns:
      list of [..., L * F_i] feature arrays, one per input table.
    """
    widths = [t.shape[-1] for t in tables]
    fused = jnp.concatenate(tables, axis=-1)
    out = hashgrid_encode(fused, x, cfg)  # [..., L * sum(F)]
    f_total = sum(widths)
    out = out.reshape(*out.shape[:-1], cfg.num_levels, f_total)
    parts = []
    start = 0
    for f in widths:
        part = out[..., start:start + f]
        parts.append(part.reshape(*part.shape[:-2], cfg.num_levels * f))
        start += f
    return parts


def hashgrid_tv_loss(table: jnp.ndarray, cfg: HashGridConfig, level: int = 0) -> jnp.ndarray:
    """Total-variation regularizer on one dense level (differentiable analog of
    reference grad_total_variation, gridencoder.cu:503-642)."""
    resolution, offset, params_in_level, use_hash, _ = cfg.level_params[level]
    if use_hash:
        raise ValueError("TV loss only defined on dense (tiled) levels")
    n = resolution**cfg.input_dim
    grid = table[offset : offset + n].reshape((resolution,) * cfg.input_dim + (-1,))
    tv = 0.0
    for axis in range(cfg.input_dim):
        d = jnp.diff(grid, axis=axis)
        tv = tv + jnp.mean(d * d)
    return tv
