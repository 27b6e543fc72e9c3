"""Fully-fused multiresolution hash-grid encode kernel.

Equivalent of the reference gridencoder CUDA kernels
(gridencoder/src/gridencoder.cu:87-366) but built around the blocked one-hot
MXU lookup (see ops/pallas/lookup.py for the why): for every level and cell
corner, the kernel computes the grid/hash index from the raw position,
routes the lookup through `onehot(hi) @ table_chunk` on the MXU, masks the
lane with onehot(lo), and accumulates the trilinear-weighted feature — all in
VMEM. The XLA-side per-level index/weight materialization (which cost more
than the lookups themselves) disappears.

The level loop is a fori_loop with per-level constants (scale/resolution/
hash-vs-tiled) streamed from SMEM so the compiled program stays one loop
region (Mosaic does not share stack slots across unrolled regions — a
native-per-level-size variant OOM'd scoped VMEM); the 8-corner loop is
unrolled. The level stack is **bf16** in [L, rows, F*128] layout (feature f
of entry (row, lane) at column f*128+lane): the forward matmuls ran bf16
anyway, and halving the resident table bytes is what lets the fast path run
T=2^15 VMEM-resident (the quality cliff on the hard scene sits at
2^14 -> 2^15: +18.8 dB, see PERFORMANCE.md). Backward recomputes
indices/weights and accumulates an f32 gradient stack with transposed
matmuls across the sequential grid (atomic-free; the reference needs
__half2 atomics, gridencoder.cu:322-328).

Constraints: all levels share one table size T = rows*128 (backend='pallas'
pads levels); the bf16 stack + f32 gradient stack must fit VMEM — T <= 2^15
at F=4 (4.2 MB fwd / 8.4 MB bwd); input grads (dL/dx) are not propagated
(positions are not trainable — matches the reference default, dy_dx off,
gridencoder/grid.py:27).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_PRIMES = (1, 2654435761, 805459861)
_CORNERS = tuple((i & 1, (i >> 1) & 1, (i >> 2) & 1) for i in range(8))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _level_const_arrays(cfg):
    scales, resolutions, use_hash = [], [], []
    for resolution, _off, _n, uh, scale in cfg.level_params:
        # Fractional interp scale base*g^l - 1 (gridencoder.cu:138), not the
        # integer entries-per-axis count.
        scales.append(float(scale))
        resolutions.append(resolution)
        use_hash.append(1 if uh else 0)
    return (np.asarray(scales, np.float32), np.asarray(resolutions, np.int32),
            np.asarray(use_hash, np.int32))


def _corner_setup(xs, scale, resolution, smoothstep):
    """xs: 3 x [ps,128] in [0,1]; traced scale/resolution scalars."""
    res_m1 = (resolution - 1).astype(jnp.float32)
    pos = [jnp.clip(x * scale + 0.5, 0.0, res_m1) for x in xs]
    pos0 = [jnp.floor(p) for p in pos]
    frac = [p - q for p, q in zip(pos, pos0)]
    if smoothstep:
        frac = [f * f * (3.0 - 2.0 * f) for f in frac]
    return [p.astype(jnp.int32) for p in pos0], frac


def _corner_idx_w(pos0, frac, corner, resolution, use_hash, t_size):
    """One corner's (idx [ps,128] int32, weight [ps,128] f32); `use_hash`
    is a traced per-level scalar, `t_size` static."""
    res_m1 = resolution - 1
    cpos = [jnp.minimum(pos0[d] + corner[d], res_m1) for d in range(3)]
    h = cpos[0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
    h = h ^ (cpos[1].astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
    h = h ^ (cpos[2].astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    idx_hash = (h & jnp.uint32(t_size - 1)).astype(jnp.int32)
    idx_tiled = jnp.minimum(
        cpos[0] + cpos[1] * resolution + cpos[2] * resolution * resolution,
        t_size - 1)
    idx = jnp.where(use_hash > 0, idx_hash, idx_tiled)
    w = jnp.ones_like(frac[0])
    for d in range(3):
        w = w * jnp.where(corner[d] == 1, frac[d], 1.0 - frac[d])
    return idx, w


def _make_fwd_kernel(levels, f_dim, rows, smoothstep):
    t_size = rows * LANES
    ck = min(rows, LANES)
    n_chunks = rows // ck

    def kernel(scale_ref, res_ref, hash_ref, x_ref, tab_ref, out_ref):
        ps = x_ref.shape[2]
        xs = [x_ref[0, d] for d in range(3)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (ps, LANES, LANES), 2)
        lane_ck = jax.lax.broadcasted_iota(jnp.int32, (ps, LANES, ck), 2)

        def level_body(l, _):
            scale = scale_ref[l]
            resolution = res_ref[l]
            use_hash = hash_ref[l]
            pos0, frac = _corner_setup(xs, scale, resolution, smoothstep)
            accs = [jnp.zeros((ps, LANES), jnp.float32) for _ in range(f_dim)]
            for corner in _CORNERS:
                idx, w = _corner_idx_w(pos0, frac, corner, resolution,
                                       use_hash, t_size)
                hi = idx >> 7
                lo = idx & 127
                b3 = lo[:, :, None] == lane
                rowsum = None
                for k in range(n_chunks):
                    a3 = (hi[:, :, None] == lane_ck + k * ck
                          ).astype(jnp.bfloat16)
                    # [ck, F*128] — the whole feature-wide chunk in one slice
                    wide = tab_ref[l, pl.ds(k * ck, ck), :]
                    rs = jax.lax.dot_general(
                        a3, wide, (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    rowsum = rs if rowsum is None else rowsum + rs
                for f in range(f_dim):
                    val = jnp.where(
                        b3, rowsum[:, :, f * LANES:(f + 1) * LANES], 0.0
                    ).sum(-1)
                    accs[f] = accs[f] + w * val
            for f in range(f_dim):
                out_ref[0, l * f_dim + f] = accs[f]
            return 0

        jax.lax.fori_loop(0, levels, level_body, 0)

    return kernel


def _make_bwd_kernel(levels, f_dim, rows, smoothstep):
    t_size = rows * LANES
    ck = min(rows, LANES)
    n_chunks = rows // ck

    def kernel(scale_ref, res_ref, hash_ref, x_ref, g_ref, gtab_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            gtab_ref[:] = jnp.zeros_like(gtab_ref)

        ps = x_ref.shape[2]
        xs = [x_ref[0, d] for d in range(3)]
        lane = jax.lax.broadcasted_iota(jnp.int32, (ps, LANES, LANES), 2)
        lane_ck = jax.lax.broadcasted_iota(jnp.int32, (ps, LANES, ck), 2)

        def level_body(l, _):
            scale = scale_ref[l]
            resolution = res_ref[l]
            use_hash = hash_ref[l]
            pos0, frac = _corner_setup(xs, scale, resolution, smoothstep)
            for corner in _CORNERS:
                idx, w = _corner_idx_w(pos0, frac, corner, resolution,
                                       use_hash, t_size)
                hi = idx >> 7
                lo = idx & 127
                b3 = lo[:, :, None] == lane
                # [P, F*128]: column f*128+lane holds onehot(lo)*g_f*w
                gb_wide = jnp.concatenate(
                    [jnp.where(b3, (g_ref[0, l * f_dim + f] * w)[:, :, None],
                               0.0) for f in range(f_dim)],
                    axis=2).astype(jnp.bfloat16).reshape(
                        ps * LANES, f_dim * LANES)
                for k in range(n_chunks):
                    a3 = (hi[:, :, None] == lane_ck + k * ck
                          ).astype(jnp.bfloat16).reshape(ps * LANES, ck)
                    upd = jax.lax.dot_general(
                        a3, gb_wide, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    cur = gtab_ref[l, pl.ds(k * ck, ck), :]
                    gtab_ref[l, pl.ds(k * ck, ck), :] = cur + upd
            return 0

        jax.lax.fori_loop(0, levels, level_body, 0)

    return kernel


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hash_encode_fused(stack, x, cfg, tile: int = 1024):
    """Fused hash-grid encode.

    Args:
      stack: [L, rows, F*128] f32 level stack (feature f of entry
        (row, lane) at column f*128+lane); cast to bf16 on entry.
      x: [M, 3] positions in [0, 1].
      cfg: HashGridConfig with backend='pallas'.
      tile: points per grid step.
    Returns:
      [M, L*F] f32 features (level-major).
    """
    return _fused_fwd_impl(stack, x, cfg, tile)


def _prep_x(x, tile):
    m = x.shape[0]
    pad = (-m) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    n_tiles = (m + pad) // tile
    ps = tile // LANES
    x4 = xp.reshape(n_tiles, ps, LANES, 3).transpose(0, 3, 1, 2)  # [NT,3,ps,128]
    return x4, n_tiles, ps, pad


def _const_specs():
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]


def _fused_fwd_impl(stack, x, cfg, tile):
    levels, rows, fw = stack.shape
    f_dim = fw // LANES
    m = x.shape[0]
    x4, n_tiles, ps, pad = _prep_x(x, tile)
    scales, resolutions, use_hash = _level_const_arrays(cfg)
    kernel = _make_fwd_kernel(levels, f_dim, rows,
                              cfg.interpolation == "smoothstep")
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_const_specs() + [
            pl.BlockSpec((1, 3, ps, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, rows, fw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, levels * f_dim, ps, LANES),
                               lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, levels * f_dim, ps, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(jnp.asarray(scales), jnp.asarray(resolutions), jnp.asarray(use_hash),
      x4, stack.astype(jnp.bfloat16))
    out = out.transpose(0, 2, 3, 1).reshape(n_tiles * tile, levels * f_dim)
    return out[:m]


def _fused_fwd(stack, x, cfg, tile):
    return _fused_fwd_impl(stack, x, cfg, tile), (stack, x)


def _fused_bwd(cfg, tile, res, g):
    stack, x = res
    levels, rows, fw = stack.shape
    f_dim = fw // LANES
    m = x.shape[0]
    x4, n_tiles, ps, pad = _prep_x(x, tile)
    g_p = jnp.pad(g, ((0, pad), (0, 0)))
    g4 = g_p.reshape(n_tiles, ps, LANES, levels * f_dim).transpose(0, 3, 1, 2)
    scales, resolutions, use_hash = _level_const_arrays(cfg)
    kernel = _make_bwd_kernel(levels, f_dim, rows,
                              cfg.interpolation == "smoothstep")
    gtab = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_const_specs() + [
            pl.BlockSpec((1, 3, ps, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, levels * f_dim, ps, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((levels, rows, fw), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((levels, rows, fw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(jnp.asarray(scales), jnp.asarray(resolutions), jnp.asarray(use_hash),
      x4, g4)
    return gtab, None


hash_encode_fused.defvjp(_fused_fwd, _fused_bwd)
