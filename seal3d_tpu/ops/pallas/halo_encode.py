"""One-row-per-sample hash-grid encode kernel ('halo' backend).

The fused one-hot kernel (ops/pallas/hash_encode.py) pays 8 corner-row
fetches per sample-level: each trilinear corner hashes to an arbitrary row,
and a one-hot row fetch costs rows * (F*128) MACs regardless of how many
corners share a row. This kernel removes the 8x by changing the INDEXING,
not the fetch: with the 'wrap' gridtype (per-dim coordinate wrap modulo a
period P, P^3 = T — see HashGridConfig), space tiles into 4^3 entry blocks,
and a stored row holds a block's 5x5x5 HALO (125 entries <= 128 lanes, the
+1 faces duplicated from wrap-neighbor blocks). Every cell whose base lies
in a block has all 8 interpolation corners inside that block's halo row, so
the kernel fetches ONE row per sample-level — 4x fewer MACs than 8 fetches
at 2x entry duplication — and does the trilinear corner selection on the
VPU with a per-lane multi-hot (weights folded in, one reduce per feature).

The duplicated halo entries are NOT independent parameters: `halo_expand`
builds the [L, B, F*128] stored stack from the flat spatial master table
with static wrap-pad + 125 strided slices, and its autodiff transpose
(slice-adds + wrap-fold) routes gradients of all copies back to the master
entry. The kernel itself is custom-vjp'd over the stored stack only.

Equivalent of the reference gridencoder (gridencoder/src/gridencoder.cu:
87-366) at reference hyperparameters except for the collision structure:
the reference hashes entries independently (fast_hash, :50-63); here points
collide only at exact per-level period translations (axis-aligned, but the
world-space period P*cell_l diverges across levels, so joint multi-level
features remain unique — quality-validated on the hard scene, see
PERFORMANCE.md).

Constraints: gridtype='wrap', T = P^3 with P a power of two (T=2^15 -> P=32
is the -O operating point), input_dim=3, align_corners=False, no input
gradients (positions are not trainable — matches the reference default,
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
# One-hot chunk (rows per matmul slice). Separate fwd/bwd knobs so the
# restructure probe (scripts/probe_halo_kernel.py) can A/B them on the real
# chip; semantics are identical for any divisor of n_rows.
_CK_FWD = 128
_CK_BWD = 128
# Statically unroll the level loop (Python range) instead of fori_loop —
# lets Mosaic disambiguate the per-level gtab slices (the bwd RMW chain is
# serialized when `l` is dynamic) at the cost of 16x kernel body size.
_UNROLL_LEVELS = False
# VMEM budget for the backward's f32 gradient-table window. The full table
# is [L, n_rows, F*128] f32 — 16 MB at T=2^15 but 128 MB at T=2^18, over
# the chip's VMEM (the round-3 bench crash). The backward grid therefore
# blocks the LEVEL axis: grid=(L/lb, n_tiles) with i fastest, so each
# lb-level window is zero-initialized at its first tile and accumulated
# across all tiles before write-back (the Pallas revisited-output reduction
# pattern). lb is the largest divisor of L whose window fits this budget;
# at the -O point (T=2^15) lb = L and behavior is identical to round 3.
_BWD_TABLE_BYTES = 48 * 1024 * 1024


def _bwd_level_block(levels: int, n_rows: int, fw: int) -> int:
    per_level = n_rows * fw * 4
    lb = levels
    while lb > 1 and lb * per_level > _BWD_TABLE_BYTES:
        lb = next(d for d in range(lb - 1, 0, -1) if levels % d == 0)
    return lb


def check_halo_vmem_feasible(levels: int, n_rows: int, fw: int):
    """Fail fast (clear message, not a Mosaic OOM) when a (T, F, L) combo
    cannot fit the kernels' VMEM windows: the forward holds the full bf16
    stored stack resident; the backward needs at least one level's f32
    gradient window within budget. T=2^18 at dual-grid F=4 is the largest
    feasible cubic size; 2^21 is not — use the 'bucket' backend there
    (reference-capacity path, any T)."""
    fwd_bytes = levels * n_rows * fw * 2
    bwd_level_bytes = n_rows * fw * 4
    limit = 80 * 1024 * 1024  # headroom under the 100 MB vmem_limit_bytes
    if fwd_bytes > limit or bwd_level_bytes > _BWD_TABLE_BYTES:
        raise ValueError(
            f"halo backend VMEM-infeasible at T=P^3 with {n_rows} halo rows"
            f" x {fw} feature lanes x {levels} levels: forward table window"
            f" {fwd_bytes / 2**20:.0f} MB (limit {limit / 2**20:.0f}) /"
            f" per-level backward window {bwd_level_bytes / 2**20:.0f} MB"
            f" (limit {_BWD_TABLE_BYTES / 2**20:.0f}). Use"
            f" log2_hashmap_size <= 18 or grid_backend='bucket' (exact"
            f" reference-capacity path, any T).")


def _level_loop(levels, body):
    if _UNROLL_LEVELS:
        for l in range(levels):
            body(l, 0)
    else:
        jax.lax.fori_loop(0, levels, body, 0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _expand_geometry(master, cfg):
    t = 2**cfg.log2_hashmap_size
    # levels from the master's SHAPE, not cfg: under level-sharded tensor
    # parallelism each shard expands only its own L/n_model levels.
    levels = master.shape[0] // t
    period = round(t ** (1 / 3))
    assert period**3 == t, "halo backend needs T = P^3"
    assert period % 4 == 0 and period >= 8
    return levels, period, period // 4, master.shape[-1]


def _wrap_pad(master, levels, period, f_dim):
    s = master.reshape(levels, period, period, period, f_dim)
    p = jnp.concatenate([s, s[:, :1]], axis=1)
    p = jnp.concatenate([p, p[:, :, :1]], axis=2)
    return jnp.concatenate([p, p[:, :, :, :1]], axis=3)  # [L,P+1,P+1,P+1,F]


def _expand_joint(master: jnp.ndarray, cfg) -> jnp.ndarray:
    """Joint 125-window expansion — the fastest FORWARD form (XLA fuses the
    strided windows into the consumer at ~zero overhead), but its autodiff
    transpose is 125 zero-pad scatter-adds (5.6 ms/step measured)."""
    levels, period, nb, f_dim = _expand_geometry(master, cfg)
    p = _wrap_pad(master, levels, period, f_dim)
    hi = 4 * (nb - 1)
    parts = [
        p[:, qx:qx + hi + 1:4, qy:qy + hi + 1:4, qz:qz + hi + 1:4]
        for qx in range(5) for qy in range(5) for qz in range(5)
    ]  # each [L, nb, nb, nb, F]
    st = jnp.stack(parts, axis=-2)  # [L, nb, nb, nb, 125, F]
    st = st.reshape(levels, nb**3, 125, f_dim).transpose(0, 1, 3, 2)
    st = jnp.pad(st, ((0, 0), (0, 0), (0, 0), (0, LANES - 125)))
    return st.reshape(levels, nb**3, f_dim * LANES)


def _expand_separable(master: jnp.ndarray, cfg) -> jnp.ndarray:
    """Axis-separable 5-tap form of the SAME linear map (bit-identical
    output): three stacked stride-4 windowings whose transpose is 3x5
    strided slice-adds (~1.5 ms) instead of the joint form's 125
    scatter-adds. Used only to derive the backward (see halo_expand);
    as a forward it fuses worse (+1.6 ms, probe_halo_expand.py)."""
    levels, period, nb, f_dim = _expand_geometry(master, cfg)
    p = _wrap_pad(master, levels, period, f_dim)
    hi = 4 * (nb - 1)
    px = jnp.stack([p[:, q:q + hi + 1:4] for q in range(5)], axis=2)
    # [L, nb, 5, P+1, P+1, F]
    pxy = jnp.stack([px[:, :, :, q:q + hi + 1:4] for q in range(5)], axis=4)
    # [L, nb, 5, nb, 5, P+1, F]
    pxyz = jnp.stack([pxy[..., q:q + hi + 1:4, :] for q in range(5)], axis=6)
    # [L, nb, 5, nb, 5, nb, 5, F]: dims (L, bx, qx, by, qy, bz, qz, F)
    st = pxyz.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # [L, bx,by,bz, F, qx,qy,qz]
    st = st.reshape(levels, nb**3, f_dim, 125)   # lane = qx*25 + qy*5 + qz
    st = jnp.pad(st, ((0, 0), (0, 0), (0, 0), (0, LANES - 125)))
    return st.reshape(levels, nb**3, f_dim * LANES)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def halo_expand(master: jnp.ndarray, cfg) -> jnp.ndarray:
    """[L*T, F] spatial master -> [L, B, F*128] halo-stored stack (f32).

    Stored row b=(bx,by,bz) holds entries S[4b+q] for q in [0,5)^3 at lane
    qx*25+qy*5+qz (S wrap-padded by one: the +1 faces come from the
    wrap-neighbor block). Differentiable: forward is the joint windowing
    (fuses best), backward is the linear_transpose of the separable form —
    the exact same linear map, 3x5 slice-adds instead of 125 scatter-adds
    (train step -3.4 ms; scripts/probe_halo_expand.py)."""
    return _expand_joint(master, cfg)


def _expand_fwd(master, cfg):
    # Residuals must be JAX types (no shapes/dtypes); the master's geometry
    # is fully determined by cfg + the cotangent, so store nothing.
    return _expand_joint(master, cfg), ()


def _expand_bwd(cfg, res, ct):
    del res
    levels = ct.shape[0]  # may be a level SHARD, not cfg.num_levels
    t = 2**cfg.log2_hashmap_size
    f_dim = ct.shape[-1] // LANES
    transpose = jax.linear_transpose(
        lambda m: _expand_separable(m, cfg),
        jax.ShapeDtypeStruct((levels * t, f_dim), ct.dtype))
    return (transpose(ct)[0],)


halo_expand.defvjp(_expand_fwd, _expand_bwd)


def _level_consts(cfg):
    scales, resolutions = [], []
    for resolution, _off, _n, _uh, scale in cfg.level_params:
        scales.append(float(scale))
        resolutions.append(resolution)
    return np.asarray(scales, np.float32), np.asarray(resolutions, np.int32)


def _sample_setup(xs, scale, resolution, period):
    """Per-level sample decomposition: block row, intra-block offset, frac."""
    res_m1 = (resolution - 1).astype(jnp.float32)
    pos = [jnp.clip(x * scale + 0.5, 0.0, res_m1) for x in xs]
    pos0 = [jnp.floor(p) for p in pos]
    frac = [p - q for p, q in zip(pos, pos0)]
    pw = [p.astype(jnp.int32) & (period - 1) for p in pos0]
    b = [p >> 2 for p in pw]
    o = [p & 3 for p in pw]
    nb = period // 4
    row = (b[0] * nb + b[1]) * nb + b[2]
    return row, o, frac


def _trilinear_multihot(lane128, o, frac):
    """Weighted 8-corner multi-hot over halo lanes, built separably.

    One one-hot compare at the base corner's lane plus three interpolation
    stages — lane strides 1 (z), 5 (y), 25 (x) via static circular rolls —
    instead of eight compare/select builds. Support never wraps: the max
    base lane is 3*25+3*5+3 = 93 and 93+31 = 124 < 128. The kernels are
    VPU-bound on these mask builds (PERFORMANCE.md), so this is the hot
    spot, not the MXU fetch."""
    base = o[0] * 25 + o[1] * 5 + o[2]
    m = (lane128 == base[:, :, None]).astype(jnp.float32)
    for shift, f in ((1, frac[2]), (5, frac[1]), (25, frac[0])):
        fm = f[:, :, None]
        m = m * (1.0 - fm) + pltpu.roll(m, shift=shift, axis=2) * fm
    return m


def _make_fwd_kernel(levels, f_dim, n_rows, period, smoothstep):
    ck = min(_CK_FWD, n_rows)
    n_chunks = n_rows // ck
    fw = f_dim * LANES

    def kernel(scale_ref, res_ref, x_ref, tab_ref, out_ref):
        ps = x_ref.shape[2]
        xs = [x_ref[0, d] for d in range(3)]
        vmask = x_ref[0, 3] > 0.0
        lane_ck = jax.lax.broadcasted_iota(jnp.int32, (ps, LANES, ck), 2)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (ps, LANES, LANES), 2)
        # Feature-block sum mask: contracts the halo-lane axis per 128-lane
        # feature block on the MXU (one [.,fw]@[fw,LANES] matmul) instead of
        # a per-feature VPU tree-reduce over lanes.
        fsum = (jax.lax.broadcasted_iota(jnp.int32, (fw, LANES), 0) // LANES
                == jax.lax.broadcasted_iota(jnp.int32, (fw, LANES), 1)
                ).astype(jnp.bfloat16)

        def level_body(l, _):
            row, o, frac = _sample_setup(xs, scale_ref[l], res_ref[l], period)
            if smoothstep:
                frac = [f * f * (3.0 - 2.0 * f) for f in frac]
            # NOTE: valid-range chunk-skipping was measured SLOWER here (a
            # dynamic fori_loop carrying the 2 MB rowsum defeats Mosaic's
            # matmul pipelining: +7 ms) — keep the static unroll.
            rowsum = None
            for k in range(n_chunks):
                a3 = (row[:, :, None] == lane_ck + k * ck
                      ).astype(jnp.bfloat16)
                wide = tab_ref[l, pl.ds(k * ck, ck), :]
                rs = jax.lax.dot_general(
                    a3, wide, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                rowsum = rs if rowsum is None else rowsum + rs
            ml = _trilinear_multihot(lane128, o, frac)
            ml = ml * vmask.astype(jnp.float32)[:, :, None]
            prod = (jnp.concatenate([ml] * f_dim, axis=2) * rowsum
                    ).astype(jnp.bfloat16)
            red = jax.lax.dot_general(
                prod, fsum, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for f in range(f_dim):
                out_ref[0, l * f_dim + f] = red[:, :, f]
            return 0

        _level_loop(levels, level_body)

    return kernel


def _make_bwd_kernel(lb, f_dim, n_rows, period, smoothstep):
    """Backward kernel over a 2-D grid (level blocks, tiles). The gtab
    window holds `lb` levels; the g window holds the matching feature
    slice. Level indices into the SMEM scale/res tables are global
    (j*lb + l); everything else is block-local."""
    ck = min(_CK_BWD, n_rows)
    n_chunks = n_rows // ck

    def kernel(scale_ref, res_ref, x_ref, g_ref, gtab_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            gtab_ref[:] = jnp.zeros_like(gtab_ref)

        ps = x_ref.shape[2]
        xs = [x_ref[0, d] for d in range(3)]
        vmask = x_ref[0, 3] > 0.0
        lane_ck = jax.lax.broadcasted_iota(jnp.int32, (ps, LANES, ck), 2)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (ps, LANES, LANES), 2)

        def level_body(l, _):
            gl = j * lb + l
            row, o, frac = _sample_setup(xs, scale_ref[gl], res_ref[gl],
                                         period)
            if smoothstep:
                frac = [f * f * (3.0 - 2.0 * f) for f in frac]
            # Chunk-skipping was tried TWICE here (dynamic [kmin,kmax)
            # fori_loop and per-chunk pl.when predication): both cost +3.3 ms
            # over the unconditional unroll — Mosaic's software pipelining of
            # the chunk matmul + gtab read-modify-write chain is worth more
            # than the skipped MACs at these shapes. Keep the static unroll.
            ml = _trilinear_multihot(lane128, o, frac)
            ml = ml * vmask.astype(jnp.float32)[:, :, None]
            # gb[s, f*128+lane] = ml[s, lane] * g_f[s]. (A two-contraction
            # dot_general over (ps, LANE) would avoid the reshape, but
            # Mosaic rejects multi-dim contractions — keep the flat view.)
            gb = jnp.concatenate(
                [ml * g_ref[0, l * f_dim + f][:, :, None]
                 for f in range(f_dim)],
                axis=2).astype(jnp.bfloat16).reshape(ps * LANES,
                                                     f_dim * LANES)
            for k in range(n_chunks):
                a3 = (row[:, :, None] == lane_ck + k * ck
                      ).astype(jnp.bfloat16).reshape(ps * LANES, ck)
                upd = jax.lax.dot_general(
                    a3, gb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cur = gtab_ref[l, pl.ds(k * ck, ck), :]
                gtab_ref[l, pl.ds(k * ck, ck), :] = cur + upd
            return 0

        _level_loop(lb, level_body)

    return kernel


def _prep_x(x, valid, tile):
    """Pack positions + a validity channel into the kernel input layout.

    Channel 3 carries valid/invalid (1/0); the kernels use it to (a) skip
    table chunks no valid sample touches and (b) zero the trilinear
    multi-hot of padded/packed-tail slots. valid=None means all-valid
    (pad rows still become 0)."""
    m = x.shape[0]
    pad = (-m) % tile
    v = (jnp.ones((m,), jnp.float32) if valid is None
         else valid.astype(jnp.float32))
    xv = jnp.concatenate([x, v[:, None]], axis=-1)
    xp = jnp.pad(xv, ((0, pad), (0, 0)))
    n_tiles = (m + pad) // tile
    ps = tile // LANES
    x4 = xp.reshape(n_tiles, ps, LANES, 4).transpose(0, 3, 1, 2)
    return x4, n_tiles, ps, pad


def _smem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.SMEM) for _ in range(n)]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def halo_encode_fused(stored, x, valid, cfg, tile: int = 1024):
    """Fused halo encode.

    Args:
      stored: [L, B, F*128] f32 halo-stored stack from `halo_expand`
        (cast to bf16 on entry).
      x: [M, 3] positions in [0, 1].
      valid: [M] bool or None — invalid (packed-tail) samples produce zero
        features/gradients and don't widen the per-tile chunk range.
      cfg: HashGridConfig with backend='halo', gridtype='wrap'.
      tile: points per grid step.
    Returns:
      [M, L*F] f32 features (level-major).
    """
    return _fwd_impl(stored, x, valid, cfg, tile)


def _fwd_impl(stored, x, valid, cfg, tile):
    scales, resolutions = _level_consts(cfg)
    return _fwd_impl_arrs(stored, x, valid, jnp.asarray(scales),
                          jnp.asarray(resolutions), cfg, tile)


def _bwd_impl(shape, x, valid, scales, resolutions, g, cfg, tile):
    """Shared backward: scatter output-feature cotangents into the stored
    stack's gradient. Blocks the gradient table over level groups (see
    _BWD_TABLE_BYTES) so the VMEM output window never exceeds budget at
    reference-scale tables (T=2^18; gridencoder.cu:245-337 supports any T)."""
    levels, n_rows, fw = shape
    f_dim = fw // LANES
    t = 2**cfg.log2_hashmap_size
    period = round(t ** (1 / 3))
    x4, n_tiles, ps, pad = _prep_x(x, valid, tile)
    g_p = jnp.pad(g, ((0, pad), (0, 0)))
    g4 = g_p.reshape(n_tiles, ps, LANES, levels * f_dim).transpose(0, 3, 1, 2)
    lb = _bwd_level_block(levels, n_rows, fw)
    kernel = _make_bwd_kernel(lb, f_dim, n_rows, period,
                              cfg.interpolation == "smoothstep")
    gtab = pl.pallas_call(
        kernel,
        grid=(levels // lb, n_tiles),
        in_specs=_smem_specs(2) + [
            pl.BlockSpec((1, 4, ps, LANES), lambda j, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lb * f_dim, ps, LANES),
                         lambda j, i: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lb, n_rows, fw), lambda j, i: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((levels, n_rows, fw), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(scales, resolutions, x4, g4)
    return gtab


def _fwd(stored, x, valid, cfg, tile):
    return _fwd_impl(stored, x, valid, cfg, tile), (stored.shape, x, valid)


def _bwd(cfg, tile, res, g):
    shape, x, valid = res
    scales, resolutions = _level_consts(cfg)
    gtab = _bwd_impl(shape, x, valid, jnp.asarray(scales),
                     jnp.asarray(resolutions), g, cfg, tile)
    return gtab, None, None


halo_encode_fused.defvjp(_fwd, _bwd)


# --------------------------------------------------- level-sharded TP wrapper

@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _halo_encode_arrs(stored, x, valid, scales, resolutions, cfg, tile=1024):
    """halo_encode_fused with the per-level scale/resolution tables as
    TRACED array arguments instead of cfg-derived constants — what lets a
    shard_map give each model-parallel shard its own level subset while
    every shard runs the identical program."""
    return _fwd_impl_arrs(stored, x, valid, scales, resolutions, cfg, tile)


def _fwd_impl_arrs(stored, x, valid, scales, resolutions, cfg, tile):
    levels, n_rows, fw = stored.shape
    check_halo_vmem_feasible(levels, n_rows, fw)
    f_dim = fw // LANES
    t = 2**cfg.log2_hashmap_size
    period = round(t ** (1 / 3))
    m = x.shape[0]
    x4, n_tiles, ps, _ = _prep_x(x, valid, tile)
    kernel = _make_fwd_kernel(levels, f_dim, n_rows, period,
                              cfg.interpolation == "smoothstep")
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_smem_specs(2) + [
            pl.BlockSpec((1, 4, ps, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((levels, n_rows, fw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, levels * f_dim, ps, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, levels * f_dim, ps, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(scales, resolutions, x4, stored.astype(jnp.bfloat16))
    out = out.transpose(0, 2, 3, 1).reshape(n_tiles * tile, levels * f_dim)
    return out[:m]


def _fwd_arrs(stored, x, valid, scales, resolutions, cfg, tile):
    out = _fwd_impl_arrs(stored, x, valid, scales, resolutions, cfg, tile)
    return out, (stored.shape, x, valid, scales, resolutions)


def _bwd_arrs(cfg, tile, res, g):
    shape, x, valid, scales, resolutions = res
    gtab = _bwd_impl(shape, x, valid, scales, resolutions, g, cfg, tile)
    return gtab, None, None, None, None


_halo_encode_arrs.defvjp(_fwd_arrs, _bwd_arrs)


def halo_encode_sharded(master: jnp.ndarray, x: jnp.ndarray, valid, cfg,
                        tile: int = 1024) -> jnp.ndarray:
    """Level-sharded tensor-parallel halo encode over the ambient 2-D mesh.

    The [L*T, F] spatial master reshapes to [L, T, F] and shards its LEVEL
    axis over the mesh's 'model' axis; samples shard over 'data'. Each chip
    expands + encodes only its own levels (halo_expand and both kernels are
    level-local), producing [M_local, L_local*F] — concatenated over 'model'
    that is exactly the level-major [M, L*F] output. The per-step
    collectives this layout induces are ONE feature all-gather over 'model'
    (a few hundred KB) and the master-grad psum over 'data'; the table
    itself is never gathered (tests/test_parallel.py pins the HLO).
    TPU-native replacement for the reference's replicated gridencoder
    under DDP (SURVEY.md §2.3), on the -O halo operating point.
    """
    mesh = jax.sharding.get_abstract_mesh()
    from jax.sharding import PartitionSpec as P

    t = 2**cfg.log2_hashmap_size
    f_dim = master.shape[-1]
    levels = master.shape[0] // t
    # Fail here with a readable message — a mismatched mesh otherwise dies
    # deep inside shard_map/pallas (check_vma=False) with an opaque error.
    n_model, n_data = mesh.shape["model"], mesh.shape["data"]
    if levels % n_model != 0:
        raise ValueError(
            f"halo_encode_sharded: num_levels={levels} must divide the "
            f"mesh 'model' axis (size {n_model}) for level sharding.")
    if x.shape[0] % n_data != 0:
        raise ValueError(
            f"halo_encode_sharded: batch {x.shape[0]} must divide the "
            f"mesh 'data' axis (size {n_data}).")
    scales, resolutions = _level_consts(cfg)
    vf = (jnp.ones((x.shape[0],), jnp.bool_) if valid is None else valid)

    def local(m3, sc, rs, xl, vl):
        stored = halo_expand(m3.reshape(-1, f_dim), cfg)
        return _halo_encode_arrs(stored, xl, vl, sc, rs, cfg, tile)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("model"), P("model"), P("model"), P("data"), P("data")),
        out_specs=P("data", "model"),
        # pallas_call's out_shape carries no varying-mesh-axes info; the
        # specs above are the full contract
        check_vma=False,
    )(master.reshape(levels, t, f_dim), jnp.asarray(scales),
      jnp.asarray(resolutions), x, vf)
