"""Fused ladder-plan kernel: slab test + coarse tighten + dilated-pooled
group test + fine demand count in ONE VMEM-resident pass over a ray block.

Why: the two-level eval path pays a per-chunk FLOOR of ~85-130 ms at 32k
rays regardless of content (round-5 attribution, scripts/probe_march_cost):
near_far 4 ms + 32-step coarse tighten 12 ms + group_plan 31 ms — all
XLA gathers into small occupancy tables (16^3 coarse view, dilated 64^3
pooled view, 128^3 bitfield) at ~200M rows/s, materializing [N, C] ladders
three separate times (once in the demand probe, once in the march). TPUs
have no hardware gather; this kernel keeps all three tables VMEM-resident
and does every lookup as a blocked one-hot MXU matmul (the trick of
ops/pallas/lookup.py), walking the whole plan per ray in one pass:

  slab      near/far vs the (occ-tightened) AABB          (VPU arithmetic)
  coarse    n_coarse samples vs the 16^3 view             ([p,32]@[32,128])
  groups    CG midpoints vs the byte-packed dilated 64^3  ([p,256] one-hot)
  fine      CG candidate reps vs the byte-packed bitfield ([p,2048] one-hot,
            Morton bit-twiddled in-kernel)

Outputs per ray: tightened t0/far, the kept-group mask (== group_plan's
keep for kg=-1), and an upper-bound fine-sample demand (occupied group reps
x members-in-interval >= the fine repack's kept members, so demand-derived
budgets stay lossless). The eval demand probe becomes two reductions of
this kernel's outputs, and march_rays_flat_2level can consume the plan
directly — one fused pass instead of three ladder materializations.

Equivalent reference structures: the per-ray DDA mip walk + empty-space
skipping of march_rays_train (raymarching/src/raymarching.cu:312-490).
Single-cascade, dt_gamma == 0, kg == -1 (the -O eval point); callers gate.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SQRT3 = math.sqrt(3.0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_M2 = 0xC30C30C3 - (1 << 32)  # 0xC30C30C3 as a signed-int32 Python int


def _expand7(v):
    """Spread the low 7 bits of int32 lanes to every 3rd bit (Morton prep;
    int32-safe for v < 128 — every value intermediate stays positive, the
    masks are bitwise so their sign is irrelevant)."""
    # 7-bit inputs: the 10-bit algorithm's first stage (x 0x00010001,
    # & 0xFF0000FF) is a value no-op below 256, so start at stage two
    v = (v * 257) & 0x0F00F00F        # 0x00000101
    v = (v * 17) & _M2                # 0x00000011 then & 0xC30C30C3
    v = (v * 5) & 0x49249249          # 0x00000005
    return v


def _morton7(cx, cy, cz):
    return _expand7(cx) | (_expand7(cy) << 1) | (_expand7(cz) << 2)


def _lut(idx, tab_ref, rows, p):
    """Value of tab_ref (rows x 128, f32) at flat index idx [p] in
    [0, rows*128): blocked one-hot MXU lookup (ops/pallas/lookup.py)."""
    hi = idx >> 7
    lo = idx & 127
    ck = min(rows, LANES)
    n_chunks = rows // ck
    lane = jax.lax.broadcasted_iota(jnp.int32, (p, ck), 1)
    acc = jnp.zeros((p, LANES), jnp.float32)
    for k in range(n_chunks):
        a = (hi[:, None] == lane + k * ck).astype(jnp.bfloat16)
        acc = acc + jnp.dot(a, tab_ref[k * ck:(k + 1) * ck, :]
                            .astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    b = lo[:, None] == jax.lax.broadcasted_iota(jnp.int32, (p, LANES), 1)
    return jnp.where(b, acc, 0.0).sum(-1)


def _bit_of(byte_val, bit):
    """bit `bit` of a float-encoded byte value (0..255)."""
    shifted = jnp.floor(byte_val * jnp.exp2(-bit.astype(jnp.float32)))
    return shifted - 2.0 * jnp.floor(shifted * 0.5)  # mod 2


def _kernel(aabb_ref, rays_ref, coarse_ref, pooled_ref, fine_ref,
            t0_ref, far_ref, keep_ref, cnt_ref, *, bound, min_near,
            dt_min, cg, g, n_coarse, pool):
    ps = rays_ref.shape[2]
    p = ps * LANES
    ox = rays_ref[0, 0].reshape(p)
    oy = rays_ref[0, 1].reshape(p)
    oz = rays_ref[0, 2].reshape(p)
    dx = rays_ref[0, 3].reshape(p)
    dy = rays_ref[0, 4].reshape(p)
    dz = rays_ref[0, 5].reshape(p)

    # ---- slab test (ops/raymarch.near_far_from_aabb) ----------------------
    def axis(o, d, lo, hi):
        inv = 1.0 / jnp.where(jnp.abs(d) > 1e-15, d, 1e-15)
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    l0, u0 = axis(ox, dx, aabb_ref[0, 0], aabb_ref[0, 3])
    l1, u1 = axis(oy, dy, aabb_ref[0, 1], aabb_ref[0, 4])
    l2, u2 = axis(oz, dz, aabb_ref[0, 2], aabb_ref[0, 5])
    tmin = jnp.maximum(jnp.maximum(l0, l1), l2)
    tmax = jnp.minimum(jnp.minimum(u0, u1), u2)
    near = jnp.maximum(tmin, min_near)
    far = jnp.maximum(tmax, near + 1e-6)
    miss = tmax < tmin
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)

    # ---- coarse tighten (ops/raymarch.coarse_tighten, cascades == 1) ------
    dt_c = (far - near) / n_coarse
    first = jnp.full((p,), float(n_coarse), jnp.float32)
    last = jnp.full((p,), -1.0, jnp.float32)

    def coarse_body(i, carry):
        first, last = carry
        fi = i.astype(jnp.float32)
        tc = near + (fi + 0.5) * dt_c
        px = ox + tc * dx
        py = oy + tc * dy
        pz = oz + tc * dz
        # EXACT op order of coarse_tighten's cell formula (parity)
        cxf = jnp.clip((px / bound * 0.5 + 0.5) * 16.0, 0.0, 15.0)
        cyf = jnp.clip((py / bound * 0.5 + 0.5) * 16.0, 0.0, 15.0)
        czf = jnp.clip((pz / bound * 0.5 + 0.5) * 16.0, 0.0, 15.0)
        code = _morton7(cxf.astype(jnp.int32), cyf.astype(jnp.int32),
                        czf.astype(jnp.int32))
        occ = (_lut(code, coarse_ref[0, 0], coarse_ref.shape[2], p) > 0.5) \
            & (tc < far)
        first = jnp.where(occ & (fi < first), fi, first)
        last = jnp.where(occ & (fi > last), fi, last)
        return first, last

    first, last = jax.lax.fori_loop(0, n_coarse, coarse_body, (first, last))
    any_hit = last >= 0.0
    near2 = jnp.maximum(near + (first - 1.0) * dt_c, near)
    far2 = jnp.minimum(near + (last + 2.0) * dt_c, far)
    near2 = jnp.where(any_hit, near2, far)
    far2 = jnp.where(any_hit, far2, far)

    t0_ref[0, 0] = near2.reshape(ps, LANES)
    far_ref[0, 0] = far2.reshape(ps, LANES)

    # ---- group test + fine demand -----------------------------------------
    # ladder length in candidates: i valid iff t0 + i*dt < far2
    n_cand = jnp.maximum((far2 - near2) / dt_min, 0.0)  # float count bound

    def group_body(j, cnt):
        fj = j.astype(jnp.float32)
        # dilated-pooled midpoint test (ops/raymarch.group_plan)
        tm = near2 + (fj * g + (g - 1) * 0.5) * dt_min
        px = ox + tm * dx
        py = oy + tm * dy
        pz = oz + tm * dz
        # EXACT op order of group_plan's cell formula (parity)
        fp = float(pool)
        cx = jnp.clip((px / bound * 0.5 + 0.5) * fp, 0.0, fp - 1.0) \
            .astype(jnp.int32)
        cy = jnp.clip((py / bound * 0.5 + 0.5) * fp, 0.0, fp - 1.0) \
            .astype(jnp.int32)
        cz = jnp.clip((pz / bound * 0.5 + 0.5) * fp, 0.0, fp - 1.0) \
            .astype(jnp.int32)
        lin = (cx * pool + cy) * pool + cz
        byte = _lut(lin >> 3, pooled_ref[0, 0], pooled_ref.shape[2], p)
        occ_g = _bit_of(byte, lin & 7) > 0.5
        t_first = near2 + fj * g * dt_min
        keep = occ_g & (t_first < far2)
        keep_ref[0, j] = keep.astype(jnp.float32).reshape(ps, LANES)

        # fine demand: occupancy at the group's candidate rep (index g*j —
        # the position pack_groups_expand_fine tests at occ_stride == g),
        # times the group's members inside the ladder (upper bound of the
        # fine repack's kept members; bounds-trim only shrinks it)
        tr = near2 + fj * g * dt_min
        qx = ox + tr * dx
        qy = oy + tr * dy
        qz = oz + tr * dz
        # occupancy_at formula at cascades == 1 (mip_bound = min(1, bound))
        mb = min(1.0, bound)
        fx = jnp.clip((qx / mb * 0.5 + 0.5) * 128.0, 0.0, 127.0) \
            .astype(jnp.int32)
        fy = jnp.clip((qy / mb * 0.5 + 0.5) * 128.0, 0.0, 127.0) \
            .astype(jnp.int32)
        fz = jnp.clip((qz / mb * 0.5 + 0.5) * 128.0, 0.0, 127.0) \
            .astype(jnp.int32)
        code = _morton7(fx, fy, fz)
        fbyte = _lut(code >> 3, fine_ref[0, 0], fine_ref.shape[2], p)
        occ_f = _bit_of(fbyte, code & 7)
        members = jnp.clip(n_cand - fj * g, 0.0, float(g))
        return cnt + jnp.where(keep, occ_f * jnp.ceil(members), 0.0)

    cnt = jax.lax.fori_loop(0, cg, group_body, jnp.zeros((p,), jnp.float32))
    cnt_ref[0, 0] = cnt.reshape(ps, LANES)


def pack_tables(bitfield: jnp.ndarray, pool: int = 64):
    """Byte-packed VMEM tables from the occupancy bitfield (single cascade).

    Returns (coarse16 [1,1,32,128], pooled_dil [1,1,256,128],
    fine [1,1,2048,128]) f32 — built ONCE per bitfield and shared by every
    chunk's kernel call (the XLA path rebuilt its views per chunk)."""
    from seal3d_tpu.ops.raymarch import pooled_dilated

    coarse = (bitfield.reshape(4096, 64).max(-1) > 0)  # Morton 16^3
    coarse16 = coarse.astype(jnp.float32).reshape(1, 1, 32, 128)
    pooled = pooled_dilated(bitfield, 1, pool)         # [pool^3] linear bool
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.float32)
    pooled_b = (pooled.reshape(-1, 8).astype(jnp.float32) @ weights)
    pooled_dil = pooled_b.reshape(1, 1, -1, 128)
    fine = bitfield.astype(jnp.float32).reshape(1, 1, 2048, 128)
    return coarse16, pooled_dil, fine


@partial(jax.jit, static_argnames=("bound", "min_near", "max_steps",
                                   "num_candidates", "group", "n_coarse",
                                   "pool", "tile_ps"))
def ladder_plan(rays_o, rays_d, coarse16, pooled_dil, fine, aabb,
                bound: float, min_near: float, max_steps: int,
                num_candidates: int, group: int, n_coarse: int = 32,
                pool: int = 64, tile_ps: int = 8):
    """-> (t0 [N], fars [N], keep [N, CG] bool, fine_cnt [N] f32).

    keep == group_plan(...).keep at kg=-1 (parity-tested); fine_cnt is a
    per-ray upper bound of the fine repack demand. Pad rays (host-side)
    should MISS the aabb so their outputs are inert."""
    n = rays_o.shape[0]
    g = group
    cg = num_candidates // g
    dt_min = 2.0 * SQRT3 / max_steps
    tile = tile_ps * LANES
    pad = (-n) % tile
    n_tiles = (n + pad) // tile

    rays = jnp.concatenate([rays_o, rays_d], axis=1)  # [N, 6]
    if pad:
        # pad rays sit far outside any scene box, pointing away
        pr = jnp.tile(jnp.asarray([[9e3, 0, 0, 1, 0, 0]], jnp.float32),
                      (pad, 1))
        rays = jnp.concatenate([rays, pr], axis=0)
    rays6 = rays.reshape(n_tiles, tile, 6).transpose(0, 2, 1) \
        .reshape(n_tiles, 6, tile_ps, LANES)
    aabb2 = aabb.reshape(1, 6).astype(jnp.float32)

    kern = partial(_kernel, bound=bound, min_near=min_near, dt_min=dt_min,
                   cg=cg, g=g, n_coarse=n_coarse, pool=pool)
    crows = coarse16.shape[2]
    prows = pooled_dil.shape[2]
    frows = fine.shape[2]
    t0, far, keep, cnt = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 6, tile_ps, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, crows, LANES), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, prows, LANES), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, frows, LANES), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_ps, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_ps, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cg, tile_ps, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_ps, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, tile_ps, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, tile_ps, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, cg, tile_ps, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, tile_ps, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(aabb2, rays6, coarse16, pooled_dil, fine)

    t0 = t0.reshape(n_tiles * tile)[:n]
    far = far.reshape(n_tiles * tile)[:n]
    keep = keep.reshape(n_tiles, cg, tile).transpose(0, 2, 1) \
        .reshape(n_tiles * tile, cg)[:n] > 0.5
    cnt = cnt.reshape(n_tiles * tile)[:n]
    return t0, far, keep, cnt
