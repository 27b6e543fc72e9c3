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
    # 'hash': 3-prime XOR hash when a level exceeds the table (reference
    #   gridencoder.cu:50-63).
    # 'tiled': dense index wrapping modulo T (reference GridTypeTiled).
    # 'wrap': per-dim sheared block-wrap — coords wrap modulo a per-dim
    #   period P (P^3 = T), then 4^3 blocks are mapped to rows through a
    #   per-level triangular shear (injective mod the wrap, breaks
    #   axis-aligned aliasing). Unlike 'hash', the block -> row map is
    #   LOCAL (unit coord steps move to statically-known neighbor rows),
    #   which is what lets the halo kernel fetch one 5x5x5 row per sample
    #   instead of 8 corner rows. Aliasing differs from 'hash': points
    #   collide only at exact per-level period translations, and the
    #   periods diverge across levels (world-space period = P * cell_l),
    #   so joint multi-level features stay unique.
    gridtype: str = "hash"  # 'hash' | 'tiled' | 'wrap'
    align_corners: bool = False
    interpolation: str = "linear"  # 'linear' | 'smoothstep'
    input_dim: int = 3  # 2 for the background sphere encoder
    # 'xla': jnp.take gathers, autodiff scatter backward (any size; backward
    #   is ~24M rows/s — fine for small tables, 2s/step at 2^19).
    # 'pallas': blocked one-hot MXU kernel (ops/pallas/hash_encode.py);
    #   cost LINEAR in table size — use log2_hashmap_size <= 14.
    # 'bucket': reference-capacity path — XLA gather forward + sorted-bucket
    #   Pallas scatter backward (ops/pallas/bucket_grad.py); cost independent
    #   of table size, native per-level sizing like 'xla'.
    # 'halo': one-row-per-sample Pallas kernel (ops/pallas/halo_encode.py);
    #   requires gridtype='wrap' with T = P^3; 4x fewer MACs than 'pallas'
    #   (one 5x5x5 halo-block fetch per sample-level vs 8 corner rows).
    backend: str = "xla"
    # Tensor parallelism over a 2-D device mesh: pad every level to the full
    # table (uniform [L, T, F] stack) and shard the LEVEL axis over the
    # ambient mesh's 'model' axis (parallel/mesh.py:make_mesh_2d). Each chip
    # gathers/scatters only its own levels; the per-step collectives are one
    # all-gather of the [M, L*F] features and the table-grad psum over
    # 'data' — the table itself is never gathered. No-op without a mesh.
    # Supported by the 'xla' backend (GSPMD-sharded batched gather) and the
    # 'halo' backend (shard_map over the level axis; each chip expands +
    # encodes only its own levels — ops/pallas/halo_encode.halo_encode_sharded).
    shard_levels: bool = False

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
            # level to the full table so levels stack uniformly (one kernel
            # loop region — Mosaic does not share stack slots across unrolled
            # regions, so mixed-size level unrolling blows scoped VMEM).
            if self.backend in ("pallas", "halo") or self.shard_levels:
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


def wrap_period(params_in_level: int) -> int:
    """The per-dim wrap period P for a 'wrap' level, or 0 when the level
    size is not a usable cube (P^3 == T, P a power of two >= 4)."""
    period = round(params_in_level ** (1 / 3))
    if period**3 == params_in_level and period >= 4 and (
            period & (period - 1)) == 0:
        return period
    return 0


def _corner_indices(pos0: jnp.ndarray, resolution: int, use_hash: bool,
                    params_in_level: int, dim: int, gridtype: str = "hash",
                    level: int = 0) -> jnp.ndarray:
    """[M, 2^dim, dim] int corner coords -> [M, 2^dim] table-local indices."""
    if gridtype == "wrap" and dim == 3:
        period = wrap_period(params_in_level)
        if period and (resolution**dim > params_in_level
                       or resolution <= period):
            # Spatial layout over the wrapped coords: injective, and a
            # unit coord step moves to a statically-known neighbor entry —
            # what the halo kernel's one-row-per-sample fetch relies on.
            # (A sheared/permuted row layout cannot change the aliasing
            # relation — alias iff coords match mod P — so plain spatial
            # order is used.) For resolution <= period the wrap is the
            # identity and the level is an exact dense grid.
            wc = pos0.astype(jnp.int32) & (period - 1)
            return (wc[..., 0] * period + wc[..., 1]) * period + wc[..., 2]
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


def corner_indices_weights(xf: jnp.ndarray, cfg: HashGridConfig):
    """All levels' corner indices and interpolation weights.

    Args:
      xf: [M, dim] positions in [0, 1].
    Returns:
      idx: [M, L, 2^dim] int32 GLOBAL table indices (level offsets applied).
      w:   [M, L, 2^dim] f32 interpolation weights.
    """
    dim = cfg.input_dim
    corners = jnp.asarray(_corner_offsets(dim), dtype=jnp.int32)
    all_idx, all_w = [], []
    for level, (resolution, offset, params_in_level, use_hash,
                scale) in enumerate(cfg.level_params):
        # Fractional interp scale (base*g^l - 1), NOT resolution-1 — matches
        # the reference kernel exactly (gridencoder.cu:138,148).
        pos = xf * scale + (0.0 if cfg.align_corners else 0.5)
        # Guard inputs slightly outside [0,1]; at the top edge frac becomes 0
        # so the (clipped) +1 corner gets zero weight.
        pos = jnp.clip(pos, 0.0, float(resolution - 1))
        pos0 = jnp.floor(pos)
        frac = pos - pos0
        if cfg.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        cpos = pos0[:, None, :] + corners[None, :, :]  # [M, 2^dim, dim]
        cpos = jnp.clip(cpos, 0, resolution - 1)
        idx = _corner_indices(cpos, resolution, use_hash, params_in_level,
                              dim, cfg.gridtype, level) + offset
        w = jnp.where(corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :])
        w = w.prod(-1)  # [M, 2^dim]
        all_idx.append(idx)
        all_w.append(w)
    return jnp.stack(all_idx, axis=1), jnp.stack(all_w, axis=1)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bucket_encode(table, xf, cfg: HashGridConfig):
    """Reference-capacity encode: XLA row-gather forward + sorted-bucket
    Pallas scatter backward (ops/pallas/bucket_grad.py). Any table size —
    the backward cost is linear in requests, independent of T (the XLA
    autodiff scatter-add it replaces measured 2.05 s/step at T=2^19)."""
    out, _ = _bucket_encode_fwd(table, xf, cfg)
    return out


def _bucket_encode_fwd(table, xf, cfg):
    m = xf.shape[0]
    f_dim = table.shape[-1]
    idx, w = corner_indices_weights(xf, cfg)
    feats = jnp.take(table, idx.reshape(m, -1), axis=0).reshape(
        m, cfg.num_levels, 2**cfg.input_dim, f_dim)
    out = (feats * w[..., None]).sum(axis=2)  # [M, L, F]
    return out, (xf, idx, feats)


def _bucket_encode_bwd(cfg, res, g):
    from seal3d_tpu.ops.pallas.bucket_grad import bucket_scatter_add

    xf, idx, feats = res
    m = xf.shape[0]
    f_dim = feats.shape[-1]
    g3 = g.reshape(m, cfg.num_levels, f_dim)
    # dL/dtable: each corner request contributes g * w
    _, w = corner_indices_weights(xf, cfg)
    greq = (g3[:, :, None, :] * w[..., None]).reshape(-1, f_dim)
    dtable = bucket_scatter_add(idx.reshape(-1), greq, cfg.total_params)
    # dL/dx through the interpolation weights (the reference's optional
    # dy_dx path, gridencoder.cu:198-241): w depends on x elementwise.
    gw = jnp.einsum("mlf,mlcf->mlc", g3, feats)  # [M, L, 2^dim]

    def w_dot(xx):
        _, ww = corner_indices_weights(xx, cfg)
        return (ww * gw).sum()

    dx = jax.grad(w_dot)(xf)
    return dtable, dx


_bucket_encode.defvjp(_bucket_encode_fwd, _bucket_encode_bwd)


def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig,
                    valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Encode positions.

    Args:
      table: [total_params, F] feature table.
      x: [..., input_dim] positions in [0, 1] (callers normalize by scene
        bound, like the reference does at nerf/network.py:100).
      cfg: static config.
      valid: optional [...] bool mask; invalid (packed-tail) samples yield
        zero features/grads and let the halo kernel skip table chunks
        (other backends ignore it — their cost doesn't depend on it).

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
        # fully-fused kernel: index math + interpolation + lookup in VMEM.
        # Stack layout [L, rows, F*128]: feature f of entry (row, lane) at
        # column f*128+lane (cast to bf16 inside — halves the VMEM-resident
        # bytes, which is what lets T=2^15 fit).
        from seal3d_tpu.ops.pallas.hash_encode import hash_encode_fused

        t = 2**cfg.log2_hashmap_size
        rows = max(t // 128, 1)
        stack = table.reshape(cfg.num_levels, rows, 128, f_dim)
        stack = stack.transpose(0, 1, 3, 2).reshape(cfg.num_levels, rows,
                                                    f_dim * 128)
        out = hash_encode_fused(stack, xf, cfg)
        return out.reshape(*batch_shape, cfg.num_levels * f_dim)

    if cfg.backend == "halo" and dim == 3 and not cfg.align_corners:
        # One-row-per-sample kernel over the wrap gridtype: the halo-stored
        # stack is rebuilt from the spatial master each call (static slices;
        # autodiff folds duplicate-copy gradients back onto master entries).
        from seal3d_tpu.ops.pallas.halo_encode import (halo_encode_fused,
                                                       halo_encode_sharded,
                                                       halo_expand)

        assert cfg.gridtype == "wrap", "halo backend requires gridtype='wrap'"
        vf = None if valid is None else valid.reshape(-1)
        amesh = jax.sharding.get_abstract_mesh()
        if cfg.shard_levels and amesh is not None and \
                "model" in getattr(amesh, "axis_names", ()):
            # level-sharded tensor parallelism over the ambient 2-D mesh
            out = halo_encode_sharded(table, xf, vf, cfg)
        else:
            stored = halo_expand(table, cfg)
            out = halo_encode_fused(stored, xf, vf, cfg)
        return out.reshape(*batch_shape, cfg.num_levels * f_dim)

    if cfg.backend == "bucket":
        out = _bucket_encode(table, xf, cfg)
        return out.reshape(*batch_shape, cfg.num_levels * f_dim)

    if cfg.shard_levels and cfg.backend == "xla":
        # Level-stacked tensor-parallel gather: every level is padded to the
        # full table so the stack is uniform [L, T, F] and the LEVEL axis can
        # shard over the mesh's 'model' axis. The vmapped take is a batched
        # gather whose operand/index batch dims carry matching shardings, so
        # GSPMD keeps it fully local per chip; the [M, L, F] -> [M, L*F]
        # re-layout is the one point XLA inserts the small feature
        # all-gather. (TPU-native replacement for the reference's replicated
        # gridencoder under DDP, SURVEY.md §2.3.)
        from seal3d_tpu.parallel.mesh import constrain

        t = 2**cfg.log2_hashmap_size
        idx, w = corner_indices_weights(xf, cfg)  # [M, L, 2^dim] global
        offsets = jnp.asarray([off for _, off, _, _, _ in cfg.level_params],
                              jnp.int32)
        idx_local = (idx - offsets[None, :, None]).transpose(1, 0, 2)
        idx_local = constrain(idx_local, "model", "data", None)
        table3 = constrain(table.reshape(cfg.num_levels, t, f_dim),
                           "model", None, None)
        feats = jax.vmap(lambda tab, ix: jnp.take(tab, ix, axis=0))(
            table3, idx_local)  # [L, M, 2^dim, F]
        feats = constrain(feats, "model", "data", None, None)
        out = (feats * w.transpose(1, 0, 2)[..., None]).sum(axis=2)
        out = constrain(out.transpose(1, 0, 2), "data", None, None)  # [M,L,F]
        return out.reshape(*batch_shape, cfg.num_levels * f_dim)

    idx, w = corner_indices_weights(xf, cfg)
    n_corners = 2**dim
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


def hashgrid_encode_stacked(tables, x: jnp.ndarray, cfg: HashGridConfig,
                            valid: jnp.ndarray | None = None):
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
    out = hashgrid_encode(fused, x, cfg, valid=valid)  # [..., L * sum(F)]
    f_total = sum(widths)
    out = out.reshape(*out.shape[:-1], cfg.num_levels, f_total)
    parts = []
    start = 0
    for f in widths:
        part = out[..., start:start + f]
        parts.append(part.reshape(*part.shape[:-2], cfg.num_levels * f))
        start += f
    return parts


def convert_table_layout(table: jnp.ndarray, cfg_src: HashGridConfig,
                         cfg_dst: HashGridConfig) -> jnp.ndarray:
    """Re-pack a flat table between backend layouts (per-level offsets differ:
    xla rounds levels to 8 entries, the fused pallas kernel to 1024).

    Only valid at equal hashmap size/level geometry — hashed levels must have
    identical index masks or entries would be meaningless. Extra destination
    padding is zero-filled; truncated source padding was never addressed.
    Used by checkpoint import to load reference-layout (.pth) tables into
    pallas configs (train/checkpoint.py).
    """
    if cfg_src.log2_hashmap_size != cfg_dst.log2_hashmap_size:
        raise ValueError("cannot convert between different hashmap sizes: "
                         f"{cfg_src.log2_hashmap_size} vs {cfg_dst.log2_hashmap_size}")
    parts = []
    for (r1, off1, n1, uh1, _s1), (r2, off2, n2, uh2, _s2) in zip(
            cfg_src.level_params, cfg_dst.level_params):
        if r1 != r2 or uh1 != uh2:
            raise ValueError("level geometry mismatch")
        blk = table[off1:off1 + min(n1, n2)]
        if n2 > blk.shape[0]:
            blk = jnp.concatenate(
                [blk, jnp.zeros((n2 - blk.shape[0], table.shape[-1]),
                                table.dtype)])
        parts.append(blk)
    return jnp.concatenate(parts)


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
