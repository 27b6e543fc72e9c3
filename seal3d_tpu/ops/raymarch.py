"""Occupancy-grid ray marching, recast for TPU/XLA static shapes.

The reference implements marching as irregular CUDA kernels
(raymarching/src/raymarching.cu):
- `march_rays_train` (:312-490): per-ray DDA over a cascaded Morton bitfield,
  two passes with an atomicAdd slot counter producing variable-length sample
  lists.
- `march_rays` / `composite_rays` (:700-914): persistent alive-ray list for
  inference.

TPU recast (SURVEY.md §7): every ray gets a *fixed* ladder of T candidate
steps (the same cone-stepped `dt = clamp(t * dt_gamma, dt_min, dt_max)`
schedule, :365); occupancy of all candidates is tested in one vectorized
bitfield gather (cheap — the expensive part is the field MLP, not the bit
test); surviving samples are then *compacted* into one flat, ray-contiguous
sample buffer of static budget M via cumsum arithmetic, so the field network
runs on a dense [M, 3] batch. Compositing over the flat buffer is a global
cumsum trick (see composite.py) — no alive lists, no atomics, one fused XLA
program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.ops.bitfield import GRID_SIZE, bitfield_lookup
from seal3d_tpu.ops.morton import morton3d

SQRT3 = 1.7320508075688772

# Static Morton->linear permutation for the pooled occupancy views
# (march_rays_flat_2level): MORT_OF_LIN[x*res^2 + y*res + z] = morton(x,y,z).
# Built once with numpy so it constant-folds into the compiled program.
def _mort_of_lin(res: int) -> np.ndarray:
    def expand(v):
        v = v.astype(np.uint32)
        v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
        v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
        v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
        v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
        return v

    x, y, z = np.meshgrid(np.arange(res), np.arange(res), np.arange(res),
                          indexing="ij")
    return (expand(x) | (expand(y) << 1) | (expand(z) << 2)).reshape(-1) \
        .astype(np.int32)


_MORT_OF_LIN = {32: _mort_of_lin(32), 64: _mort_of_lin(64)}


def near_far_from_aabb(rays_o: jnp.ndarray, rays_d: jnp.ndarray, aabb: jnp.ndarray,
                       min_near: float = 0.05):
    """Slab test of rays vs an axis-aligned box.

    Equivalent of reference `near_far_from_aabb` (raymarching.cu:92-156).

    Args:
      rays_o, rays_d: [..., 3].
      aabb: [6] (xmin, ymin, zmin, xmax, ymax, zmax).
    Returns:
      nears, fars: [...]; rays that miss get near = far = 1e9 (far < near
      never happens; miss is encoded as both huge, like the reference).
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-15, rays_d, 1e-15)
    t0 = (aabb[:3] - rays_o) * inv_d
    t1 = (aabb[3:] - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    near = jnp.maximum(tmin, min_near)
    far = jnp.maximum(tmax, near + 1e-6)
    miss = tmax < tmin
    near = jnp.where(miss, 1e9, near)
    far = jnp.where(miss, 1e9, far)
    return near, far


def sph_from_ray(rays_o: jnp.ndarray, rays_d: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Ray ∩ background sphere -> (theta/pi, phi/pi) in [-1, 1].

    Equivalent of reference `sph_from_ray` (raymarching.cu:163-209), used by
    the background model.
    """
    # Solve |o + t d|^2 = r^2 for the far root (d need not be unit).
    dd = (rays_d * rays_d).sum(-1)
    od = (rays_o * rays_d).sum(-1)
    oo = (rays_o * rays_o).sum(-1)
    disc = jnp.maximum(od * od - dd * (oo - radius * radius), 0.0)
    t = (-od + jnp.sqrt(disc)) / jnp.maximum(dd, 1e-15)
    p = rays_o + t[..., None] * rays_d
    theta = jnp.arctan2(p[..., 1], jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2)) / (jnp.pi / 2)
    phi = jnp.arctan2(p[..., 0], p[..., 2]) / jnp.pi
    return jnp.stack([theta, phi], axis=-1)


def mip_from_pos(x: jnp.ndarray, max_cascade: int) -> jnp.ndarray:
    """Smallest cascade whose [-2^c, 2^c] box contains x (reference
    raymarching.cu:42-48)."""
    mx = jnp.abs(x).max(axis=-1)
    # exponent of mx: mip = ceil(log2(mx)) for mx > 1, else 0.
    mip = jnp.ceil(jnp.log2(jnp.maximum(mx, 1e-8)))
    return jnp.clip(mip, 0, max_cascade - 1).astype(jnp.int32)


def mip_from_dt(dt: jnp.ndarray, max_cascade: int) -> jnp.ndarray:
    """Smallest cascade whose cell size exceeds dt (reference
    raymarching.cu:50-54)."""
    # Cell size at cascade c is 2 * 2^c / GRID_SIZE.
    mip = jnp.ceil(jnp.log2(jnp.maximum(dt * GRID_SIZE * 0.5, 1e-8)))
    return jnp.clip(mip, 0, max_cascade - 1).astype(jnp.int32)


def occupancy_at(x: jnp.ndarray, dt: jnp.ndarray, bitfield: jnp.ndarray,
                 cascades: int, bound: float = None) -> jnp.ndarray:
    """Occupancy bit for world positions x given step size dt."""
    mip = jnp.maximum(mip_from_pos(x, cascades), mip_from_dt(dt, cascades))
    mip_bound = jnp.exp2(mip.astype(jnp.float32))
    if bound is not None:
        # Last cascade covers [-bound, bound] (reference fminf(scalbnf(1,c), bound)).
        mip_bound = jnp.minimum(mip_bound, bound)
    # [-bound, bound] -> [0, GRID_SIZE)
    cell = ((x / mip_bound[..., None] * 0.5 + 0.5) * GRID_SIZE).astype(jnp.int32)
    cell = jnp.clip(cell, 0, GRID_SIZE - 1)
    code = morton3d(cell)
    return bitfield_lookup(bitfield, mip, code)


def candidate_ts(nears: jnp.ndarray, fars: jnp.ndarray, num_steps: int,
                 dt_gamma: float, bound: float, max_steps: int,
                 perturb: jnp.ndarray | None = None,
                 span_adaptive: bool = False):
    """Cone-stepped candidate distances along each ray.

    Returns (ts [N, T], dts [N, T], valid [N, T]) with the reference step
    schedule dt = clamp(t * dt_gamma, dt_min, dt_max) (raymarching.cu:365).
    `perturb` is an optional [N] uniform jitter of the start offset.

    span_adaptive (dt_gamma == 0 only): per-ray step max(dt_min, span/T)
    instead of the global dt_min, so T candidates always cover the whole
    (coarse-tightened) [near, far] interval — rays with short occupied spans
    keep dt_min density while long-span rays coarsen instead of losing their
    far end. This halves the ladder length the march needs (the analog of
    the reference's per-ray cone widening, raymarching.cu:365, driven by
    interval length instead of distance).
    """
    n = nears.shape[0]
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * bound / GRID_SIZE
    t0 = nears
    if perturb is not None:
        t0 = t0 + perturb * dt_min

    if dt_gamma <= 0.0:
        k = jnp.arange(num_steps, dtype=jnp.float32)
        if span_adaptive:
            dt_ray = jnp.clip((fars - nears) / num_steps, dt_min, dt_max)
            ts = t0[:, None] + k[None, :] * dt_ray[:, None]
            dts = jnp.broadcast_to(dt_ray[:, None], ts.shape)
        else:
            ts = t0[:, None] + k[None, :] * dt_min
            dts = jnp.full_like(ts, dt_min)
    else:
        def step(t, _):
            dt = jnp.clip(t * dt_gamma, dt_min, dt_max)
            return t + dt, (t, dt)

        _, (ts, dts) = jax.lax.scan(step, t0, None, length=num_steps)
        ts = jnp.moveaxis(ts, 0, 1)
        dts = jnp.moveaxis(dts, 0, 1)
    valid = ts < fars[:, None]
    return ts, dts, valid


class MarchedRays(NamedTuple):
    """Flat, ray-contiguous compacted sample buffer (static budget M)."""

    xyzs: jnp.ndarray      # [M, 3] sample positions
    dirs: jnp.ndarray      # [M, 3] ray directions per sample
    deltas: jnp.ndarray    # [M] marching step length at each sample
    ts: jnp.ndarray        # [M] distance along ray
    ray_id: jnp.ndarray    # [M] owning ray index (int32; dump slot rows keep N-1 clipped ids but valid=False)
    valid: jnp.ndarray     # [M] bool
    offsets: jnp.ndarray   # [N] start index of each ray's segment in the flat buffer
    counts: jnp.ndarray    # [N] number of (kept) samples per ray


def compact_samples(ts, dts, valid, rays_o, rays_d, budget: int) -> MarchedRays:
    """Compact per-ray masked candidates [N, T] into a flat [M] buffer.

    This replaces the reference's atomicAdd slot reservation
    (raymarching.cu:405-406) with deterministic cumsum arithmetic: samples stay
    ordered by (ray, t) and each ray's segment is contiguous. Samples beyond
    the budget are dropped (the reference similarly drops rays when the
    `mean_count` pre-allocation is exceeded, raymarching/raymarching.py:198-204).
    """
    n, t = ts.shape
    v = valid.astype(jnp.int32)
    rank = jnp.cumsum(v, axis=1)  # 1-based within-ray rank
    counts = rank[:, -1]
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    g = offsets[:, None] + rank - 1  # [N, T] flat slot
    in_budget = valid & (g < budget) & (g >= 0)
    # Dropped/invalid samples go to the dump slot `budget`.
    gi = jnp.where(in_budget, g, budget).reshape(-1)

    xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)

    def scatter(src, width=None):
        flat = src.reshape(n * t, -1)
        out = jnp.zeros((budget + 1, flat.shape[-1]), flat.dtype)
        out = out.at[gi].set(flat, mode="drop")
        return out[:budget]

    xyzs = scatter(xyz)
    dirs_f = scatter(dirs)
    deltas = scatter(dts)[:, 0]
    ts_f = scatter(ts)[:, 0]
    ray_ids_full = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, t))
    ray_id = scatter(ray_ids_full)[:, 0]
    valid_f = scatter(in_budget.astype(jnp.int32))[:, 0].astype(jnp.bool_)
    # counts clipped to what actually landed in budget
    kept = jnp.clip(jnp.minimum(offsets + counts, budget) - jnp.minimum(offsets, budget), 0)
    return MarchedRays(
        xyzs=xyzs, dirs=dirs_f, deltas=deltas, ts=ts_f,
        ray_id=jnp.clip(ray_id, 0, n - 1), valid=valid_f,
        offsets=jnp.minimum(offsets, budget), counts=kept,
    )


class MarchedGrid(NamedTuple):
    """Per-ray fixed-K compacted samples (TPU fast path): [N, K] layout."""

    xyzs: jnp.ndarray    # [N, K, 3]
    dirs: jnp.ndarray    # [N, K, 3]
    deltas: jnp.ndarray  # [N, K]
    ts: jnp.ndarray      # [N, K]
    valid: jnp.ndarray   # [N, K] bool


def compact_topk(ts, dts, valid, rays_o, rays_d, k: int) -> MarchedGrid:
    """Select <= K valid candidates per ray via top_k (sort-based, ~15x
    faster on TPU than the scatter-based global compaction).

    Rays with more than K valid candidates are SUBSAMPLED with a per-ray
    stride rather than truncated at the near end: taking the first K would
    systematically drop the far scene and train camera fog (the reference
    instead drops whole rays when over budget, raymarching.py:198-204 —
    stride subsampling preserves full depth coverage at coarser dt, with
    deltas scaled by the stride to keep opacity consistent)."""
    n, t = ts.shape
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1)  # 1-based among valid
    count = rank[:, -1:]
    stride = jnp.ceil(count / k).astype(jnp.int32)      # [N,1] >= 1
    stride = jnp.maximum(stride, 1)
    keep = valid & (((rank - 1) % stride) == 0)
    dts = dts * stride.astype(dts.dtype)                # coarser step length
    # score: kept first, ascending t
    score = jnp.where(keep, -jnp.arange(t, dtype=jnp.float32)[None, :], -1e9)
    _, sel = jax.lax.top_k(score, k)          # [N, K] candidate indices
    sel_sorted = jnp.sort(sel, axis=-1)       # ascending t order
    take = lambda a: jnp.take_along_axis(a, sel_sorted, axis=1)
    ts_k = take(ts)
    dts_k = take(dts)
    valid_k = take(keep.astype(jnp.int32)).astype(jnp.bool_)
    xyz = rays_o[:, None, :] + ts_k[..., None] * rays_d[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)
    return MarchedGrid(xyzs=xyz, dirs=dirs, deltas=dts_k, ts=ts_k, valid=valid_k)


def coarse_tighten(rays_o, rays_d, bitfield, nears, fars, cascades: int,
                   bound: float, n_steps: int = 64,
                   dt_gamma: float = 0.0, max_steps: int = 1024):
    """Per-ray [near, far] tightening from 16^3 coarse occupancy views.

    Morton order is hierarchical: 64 consecutive bitfield bytes = one 8^3
    block of fine cells = one coarse cell, so the coarse grid is a single
    reshape+max over the (possibly Seal-hacked) bitfield — always consistent
    with whatever the fine march will see. Each ray walks `n_steps` coarse
    samples; its candidate ladder then starts at the first occupied coarse
    cell and ends after the last (+-1 step of slack), so empty leading/
    trailing space costs no fine candidates and rays that hit nothing get
    near == far (zero valid candidates). This recovers most of the empty-
    space skipping of the reference's per-ray DDA while staying one dense
    [N, n_steps] gather (raymarching.cu:390-399 analog).

    Multi-cascade scenes (bound > 1) get one coarse view per mip — the same
    reshape-max, batched over the cascade axis — and each coarse sample is
    tested at the mip the fine march would use at that position/step size
    (max of mip_from_pos and mip_from_dt with the fine ladder's dt schedule,
    raymarching.cu:42-54), so unbounded scenes keep empty-space skipping.
    """
    n = n_steps
    frac = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    tc = nears[:, None] + frac[None, :] * (fars - nears)[:, None]  # [N, n]
    xyz = rays_o[:, None, :] + tc[..., None] * rays_d[:, None, :]
    if cascades == 1:
        coarse = (bitfield.reshape(4096, 64).max(-1) > 0)  # [16^3] bool, Morton
        cell = jnp.clip(((xyz / bound) * 0.5 + 0.5) * 16.0, 0.0, 15.0).astype(jnp.int32)
        occ = jnp.take(coarse, morton3d(cell).astype(jnp.int32), axis=0)
    else:
        coarse = (bitfield.reshape(cascades, 4096, 64).max(-1) > 0)  # [C, 16^3]
        dt_min = 2.0 * SQRT3 / max_steps
        dt_max = 2.0 * SQRT3 * bound / GRID_SIZE
        if dt_gamma > 0.0:
            dt = jnp.clip(tc * dt_gamma, dt_min, dt_max)
        else:
            dt = jnp.full_like(tc, dt_min)
        mip = jnp.maximum(mip_from_pos(xyz, cascades), mip_from_dt(dt, cascades))
        mip_bound = jnp.minimum(jnp.exp2(mip.astype(jnp.float32)), bound)
        cell = jnp.clip((xyz / mip_bound[..., None] * 0.5 + 0.5) * 16.0,
                        0.0, 15.0).astype(jnp.int32)
        code = mip * 4096 + morton3d(cell).astype(jnp.int32)
        occ = jnp.take(coarse.reshape(-1), code, axis=0)
    occ = occ & (tc < fars[:, None])
    any_hit = occ.any(axis=1)
    first = jnp.argmax(occ, axis=1).astype(jnp.float32)
    last = (n - 1 - jnp.argmax(occ[:, ::-1], axis=1)).astype(jnp.float32)
    dt_c = (fars - nears) / n
    near2 = jnp.maximum(nears + (first - 1.0) * dt_c, nears)
    far2 = jnp.minimum(nears + (last + 2.0) * dt_c, fars)
    near2 = jnp.where(any_hit, near2, fars)
    far2 = jnp.where(any_hit, far2, fars)
    return near2, far2


def compact_grid_to_flat(m: MarchedGrid, budget: int) -> MarchedRays:
    """Pack the valid samples of a [N, K] march into a flat [budget] buffer.

    The field network then runs only on REAL samples instead of the full
    N*K grid (at the recipe operating point ~36% of grid slots are invalid
    and still paid for). One argsort moves all valid samples to the front in
    (ray, t) order — ray-contiguous, so `composite_flat` applies directly.
    This is the static-shape analog of the reference's `mean_count`
    pre-allocation, which sizes the sample pool below N*max_steps and drops
    overflow (raymarching/raymarching.py:198-204); here overflow drops the
    trailing rays' samples (valid=False in the dump tail).
    """
    n, k = m.deltas.shape
    nk = n * k
    flat_valid = m.valid.reshape(-1)
    idx = jnp.arange(nk, dtype=jnp.int32)
    # valid samples keep their (ray-major, t-ascending) order; invalid sink
    order = jnp.argsort(jnp.where(flat_valid, idx, idx + nk))
    sel = order[:budget]
    take = lambda a: jnp.take(a.reshape(nk, -1), sel, axis=0)
    xyzs = take(m.xyzs)
    dirs = take(m.dirs)
    deltas = take(m.deltas)[:, 0]
    ts = take(m.ts)[:, 0]
    valid_f = jnp.take(flat_valid, sel)
    ray_id = (sel // k).astype(jnp.int32)
    counts = m.valid.sum(1).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    kept = (jnp.minimum(starts + counts, budget)
            - jnp.minimum(starts, budget))
    return MarchedRays(
        xyzs=xyzs, dirs=dirs, deltas=deltas, ts=ts,
        ray_id=jnp.clip(ray_id, 0, n - 1), valid=valid_f,
        offsets=jnp.minimum(starts, budget), counts=jnp.maximum(kept, 0),
    )


def compact_flat_direct(ts, dts, valid, rays_o, rays_d, k: int,
                        budget: int) -> MarchedRays:
    """Candidates [N, C] -> flat [budget] buffer in ONE argsort.

    Fuses compact_topk + compact_grid_to_flat for the packed train path:
    instead of top_k to [N, K] (a per-row sort) followed by a global
    argsort over N*K, apply the per-ray stride subsample (same semantics
    as compact_topk: over-K rays keep every stride-th valid candidate with
    deltas rescaled) and argsort the [N*C] keep mask directly. Positions
    are recomputed from (ray_id, t) for the kept samples only, so the
    [N, C, 3] candidate xyz tensor is never re-gathered."""
    n, c = ts.shape
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1)
    count = rank[:, -1:]
    stride = jnp.maximum(jnp.ceil(count / k).astype(jnp.int32), 1)
    keep = valid & (((rank - 1) % stride) == 0)
    dts = dts * stride.astype(dts.dtype)
    nc = n * c
    flat_keep = keep.reshape(-1)
    # GRACEFUL global-budget overflow (round 4, ported from
    # pack_groups_expand_fine): when total kept demand exceeds the static
    # budget, keep evenly-spaced samples over the global kept rank
    # (Bresenham) and rescale each ray's deltas by its dropped fraction —
    # every ray degrades a little instead of trailing rays losing ALL
    # samples (the catastrophic mode documented in PERFORMANCE.md round 2
    # 'teacher proxy renders'). Under budget the spacing clamps to 1 and
    # the selection is bit-exact to the old behavior.
    rg = jnp.cumsum(flat_keep.astype(jnp.int32))
    sg = jnp.maximum(rg[-1].astype(jnp.float32) / budget, 1.0)
    flat_keep = flat_keep & (
        (rg.astype(jnp.float32) / sg).astype(jnp.int32)
        != ((rg - 1).astype(jnp.float32) / sg).astype(jnp.int32))
    keep2 = flat_keep.reshape(n, c)
    counts_all = keep.sum(1).astype(jnp.int32)
    counts_kept = keep2.sum(1).astype(jnp.int32)
    oscale = counts_all.astype(jnp.float32) / jnp.maximum(counts_kept, 1)
    keep = keep2
    idx = jnp.arange(nc, dtype=jnp.int32)
    # Single-array sort: the key IS the flat index (offset by nc when
    # dropped), so sorting keys alone recovers the selection order —
    # `key mod nc` is the source index and `key < nc` the validity. Half
    # the sort traffic of argsort's (key, index) pair sort.
    skeys = jax.lax.sort(jnp.where(flat_keep, idx, idx + nc))
    selk = skeys[:budget]
    valid_f = selk < nc
    sel = jnp.where(valid_f, selk, selk - nc)
    ts_f = jnp.take(ts.reshape(-1), sel)
    dts_f = jnp.take(dts.reshape(-1), sel)
    ray_id = (sel // c).astype(jnp.int32)
    dts_f = dts_f * jnp.take(oscale, jnp.clip(ray_id, 0, n - 1))
    ro = jnp.take(rays_o, ray_id, axis=0)
    rd = jnp.take(rays_d, ray_id, axis=0)
    xyzs = ro + ts_f[:, None] * rd
    counts = keep.sum(1).astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    kept = (jnp.minimum(starts + counts, budget)
            - jnp.minimum(starts, budget))
    return MarchedRays(
        xyzs=xyzs, dirs=rd, deltas=dts_f, ts=ts_f,
        ray_id=jnp.clip(ray_id, 0, n - 1), valid=valid_f,
        offsets=jnp.minimum(starts, budget), counts=jnp.maximum(kept, 0))


def compact_flat_gather(ts, dts, valid, rays_o, rays_d, k: int,
                        budget: int) -> MarchedRays:
    """compact_flat_direct without the global sort.

    The packed layout is a STABLE PARTITION of the [N*C] candidates (kept
    first, (ray, t) order preserved) — a full 1M-key `lax.sort` (4.0 ms at
    the recipe point, the largest march piece) computes strictly more than
    needed. Instead, invert the packing directly: per-ray kept ranks are a
    cumsum, per-ray segment starts a cumsum of counts, and each output slot
    m finds its (ray, within-ray rank) via searchsorted + its candidate
    column via ONE row-gather of the rank matrix and a lane compare/argmax.
    Cost is ~budget*C compare-lanes + one [budget, C] row gather — both an
    order of magnitude below the sort at budget << N*C. Semantics are
    bit-identical to compact_flat_direct (same stride subsample, same
    graceful global-overflow thinning over the same global kept rank, same
    packing; parity-tested)."""
    n, c = ts.shape
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1)
    count = rank[:, -1:]
    stride = jnp.maximum(jnp.ceil(count / k).astype(jnp.int32), 1)
    keep = valid & (((rank - 1) % stride) == 0)
    dts = dts * stride.astype(dts.dtype)
    # graceful global-budget overflow — the row-major global kept rank
    # equals compact_flat_direct's flat cumsum, so the Bresenham selection
    # is identical
    krank0 = jnp.cumsum(keep.astype(jnp.int32), axis=1)
    counts_all = krank0[:, -1]
    starts0 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts_all)[:-1].astype(jnp.int32)])
    gr = starts0[:, None] + krank0                          # 1-indexed global
    total = (starts0[-1] + counts_all[-1]).astype(jnp.float32)
    sg = jnp.maximum(total / budget, 1.0)
    keep = keep & ((gr.astype(jnp.float32) / sg).astype(jnp.int32)
                   != ((gr - 1).astype(jnp.float32) / sg).astype(jnp.int32))
    krank = jnp.cumsum(keep.astype(jnp.int32), axis=1)      # [N, C]
    counts = krank[:, -1]
    oscale = counts_all.astype(jnp.float32) / jnp.maximum(counts, 1)
    dts = dts * oscale[:, None]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    m = jnp.arange(budget, dtype=jnp.int32)
    ray_id = (jnp.searchsorted(starts, m, side="right") - 1).astype(jnp.int32)
    ray_id = jnp.clip(ray_id, 0, n - 1)
    r = m - jnp.take(starts, ray_id)                        # within-ray rank
    valid_f = r < jnp.take(counts, ray_id)
    # ONE uint8 row gather: within a row, rank == r+1 FIRST occurs exactly at
    # the kept candidate (rank increments there), so argmax-first needs no
    # keep mask. (krank-1) fits uint8 collision-free: the 0-1 wrap to 255
    # can only be queried when r == 255, i.e. count == 256 == C, i.e. ALL
    # kept — and then no krank == 0 positions exist. (C <= 256 contract,
    # asserted below.)
    assert c <= 256, "compact_flat_gather packs ranks into uint8 (C <= 256)"
    rank8 = (krank - 1).astype(jnp.uint8)                   # [N, C]
    rankrow = jnp.take(rank8, ray_id, axis=0)               # [B, C] row gather
    col = jnp.argmax(rankrow == r.astype(jnp.uint8)[:, None],
                     axis=1).astype(jnp.int32)
    sel = ray_id * c + col
    ts_f = jnp.take(ts.reshape(-1), sel)
    dts_f = jnp.take(dts.reshape(-1), sel)
    ro = jnp.take(rays_o, ray_id, axis=0)
    rd = jnp.take(rays_d, ray_id, axis=0)
    xyzs = ro + ts_f[:, None] * rd
    kept = (jnp.minimum(starts + counts, budget)
            - jnp.minimum(starts, budget))
    return MarchedRays(
        xyzs=xyzs, dirs=rd, deltas=dts_f, ts=ts_f,
        ray_id=ray_id, valid=valid_f,
        offsets=jnp.minimum(starts, budget), counts=jnp.maximum(kept, 0))


def pooled_dilated(bitfield: jnp.ndarray, cascades: int,
                   pool: int = 32) -> jnp.ndarray:
    """pool^3 pooled + 3^3-dilated occupancy view, LINEAR (x-major) order.

    Morton order is hierarchical: 8 consecutive bitfield bytes = 64 fine
    cells = one 4^3 block = one 32^3 cell (pool=32: reshape-max over 8
    bytes), and ONE byte = 8 fine cells = one 2^3 block = one 64^3 cell
    (pool=64: just byte != 0). The 3^3 max-dilation makes the view
    CONSERVATIVE for group-midpoint testing: any point within one pooled
    cell size (2*bound/pool) of a query point whose fine cell is occupied
    also lights the query's dilated bit (see march_rays_flat_2level for the
    span arithmetic). pool=64 halves the dilated slab thickness around
    surfaces (3 cells = 0.094*bound vs 0.1875), which is what keeps the
    level-1 group demand near the FINE-valid demand instead of ~2x it —
    the round-3 val-view eval regression was group-level thinning of the
    too-fat 32^3 view (PERFORMANCE.md round 4).

    Returns [cascades * pool^3] bool, linear cell order per cascade.
    """
    assert pool in (32, 64), "pooled views exist at 32^3 and 64^3"
    if pool == 64:
        pooled = bitfield.reshape(cascades, 64 * 64 * 64) > 0  # Morton 64^3
    else:
        pooled = bitfield.reshape(cascades, 32768, 8).max(-1) > 0
    dense = jnp.take(pooled, jnp.asarray(_MORT_OF_LIN[pool]), axis=1)
    dense = dense.reshape(cascades, pool, pool, pool)
    d = jnp.pad(dense, ((0, 0), (1, 1), (1, 1), (1, 1)))
    d = jnp.maximum(jnp.maximum(d[:, :-2], d[:, 1:-1]), d[:, 2:])
    d = jnp.maximum(jnp.maximum(d[:, :, :-2], d[:, :, 1:-1]), d[:, :, 2:])
    d = jnp.maximum(jnp.maximum(d[..., :-2], d[..., 1:-1]), d[..., 2:])
    return d.reshape(-1)


def pooled_dilated32(bitfield: jnp.ndarray, cascades: int) -> jnp.ndarray:
    return pooled_dilated(bitfield, cascades, 32)


def march_rays_flat_2level(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                           bitfield: jnp.ndarray, bound: float, cascades: int,
                           max_steps: int, k: int, budget: int,
                           num_candidates: int,
                           perturb: jnp.ndarray | None = None,
                           min_near: float = 0.05,
                           aabb: jnp.ndarray | None = None,
                           occ_stride: int = 4,
                           coarse_steps: int = 0,
                           group: int = 8,
                           over: float = 1.5,
                           kg: int = 0,
                           pool: int = 32) -> MarchedRays:
    """Two-level hierarchical flat march (uniform ladder, cascades == 1).

    The single-level march pays its cost on the FULL candidate ladder: an
    [N, C] bitfield gather, [N, C] rank cumsums, and an N*C-key packing sort
    — at the render point (N=32k, C=256) that is 8.4M candidates of which
    <10% survive. Here the ladder is tested and packed at GROUP granularity
    first, and the fine bitfield only ever sees candidates whose group
    survived:

      level 1  C/`group` group midpoints per ray, tested against a pooled +
               3^3-dilated 32^3 occupancy view (one [N, C/g] gather from a
               32KB table, pooled_dilated32). Dilation makes the test
               conservative: every member lies within (g-1)*dt_min <
               2*bound/32 of its group midpoint (asserted below), so a group
               containing ANY fine-occupied member always tests positive
               (false positives possible, misses impossible — boundary
               clamping included, since the clamp displacement is bounded by
               the same span).
      pack     kept groups -> `over`-provisioned static group budget via the
               single-key sort of compact_flat_direct, at C/g the keys.
      level 2  each packed group expands to its g members arithmetically
               (ts = t0 + idx*dt); per-GROUP ray data is gathered once and
               broadcast over members; the fine bitfield tests only these
               budget_g*g candidates (strided like the single-level path).
      repack   fine-valid members -> `budget` via a second single-key sort
               (budget*over keys), so false-positive groups never reach the
               field network and no pad slots eat budget (the failure mode
               of march_rays_flat_grouped, PERFORMANCE.md round 2).

    Semantics vs march_rays_flat: identical candidate ladder and fine
    occupancy; over-budget rays subsample every stride-th valid GROUP
    (deltas scaled by the stride) instead of every stride-th candidate —
    the same whole-depth-coverage policy at group granularity. Same role as
    the reference's mean_count pool (raymarching/raymarching.py:198-204);
    the hierarchy plays the part of the reference's per-ray DDA mip walk
    (raymarching.cu:390-399) within static shapes.

    Constraints (caller gates): dt_gamma == 0, cascades == 1,
    num_candidates % group == 0, and (group-1)*dt_min < 2*bound/32.
    """
    plan = group_plan(rays_o, rays_d, bitfield, bound=bound,
                      cascades=cascades, max_steps=max_steps, k=k,
                      num_candidates=num_candidates, group=group,
                      perturb=perturb, min_near=min_near, aabb=aabb,
                      coarse_steps=coarse_steps, kg=kg, pool=pool)
    budget_g = max(-(-int(round(budget * over)) // (group * 16)) * 16, 16)
    out = pack_groups_expand_fine(plan, plan.keep, 0, rays_o, rays_d,
                                  bitfield, bound, cascades, group,
                                  budget, budget_g, occ_stride)
    return jax.tree.map(jax.lax.stop_gradient, out)


class GroupPlan(NamedTuple):
    """Level-1 result of the two-level march (see march_rays_flat_2level)."""

    t0: jnp.ndarray      # [N] ladder start (near, perturbed)
    fars: jnp.ndarray    # [N]
    stride: jnp.ndarray  # [N] int32 per-ray group subsample stride
    keep: jnp.ndarray    # [N, CG] bool kept-group mask
    dt_min: float


def ladder_plan_kernel(rays_o, rays_d, bitfield, bound: float,
                       max_steps: int, num_candidates: int, group: int,
                       min_near: float, aabb, coarse_steps: int,
                       pool: int = 64):
    """GroupPlan + fine-demand bound via the fused Pallas ladder kernel
    (ops/pallas/ladder.py) — one VMEM-resident pass instead of the three
    XLA ladder materializations (near_far + coarse_tighten + group_plan,
    ~47 ms/32k-ray chunk -> kernel). kg=-1 / no-perturb / single-cascade /
    occ_stride == group only (callers gate; see RenderOptions.tl_kernel).

    Returns (plan: GroupPlan, fine_cnt [N] f32 upper bound)."""
    from seal3d_tpu.ops.pallas.ladder import ladder_plan, pack_tables

    if aabb is None:
        aabb = jnp.array([-bound, -bound, -bound, bound, bound, bound],
                         jnp.float32)
    tabs = pack_tables(bitfield, pool=pool)
    t0, fars, keep, cnt = ladder_plan(
        rays_o, rays_d, *tabs, aabb, bound=bound, max_steps=max_steps,
        num_candidates=num_candidates, group=group, min_near=min_near,
        n_coarse=coarse_steps, pool=pool)
    plan = GroupPlan(t0=t0, fars=fars,
                     stride=jnp.ones((rays_o.shape[0],), jnp.int32),
                     keep=keep, dt_min=2.0 * SQRT3 / max_steps)
    return plan, cnt


def march_rays_flat_2level_kernel(rays_o, rays_d, bitfield, bound: float,
                                  cascades: int, max_steps: int, k: int,
                                  budget: int, num_candidates: int,
                                  min_near: float = 0.05, aabb=None,
                                  occ_stride: int = 4, coarse_steps: int = 32,
                                  group: int = 4, over: float = 1.5,
                                  pool: int = 64) -> MarchedRays:
    """march_rays_flat_2level with level 0/1 fused into the Pallas ladder
    kernel; pack/expand/repack unchanged (pack_groups_expand_fine)."""
    assert cascades == 1
    plan, _ = ladder_plan_kernel(rays_o, rays_d, bitfield, bound, max_steps,
                                 num_candidates, group, min_near, aabb,
                                 coarse_steps, pool)
    budget_g = max(-(-int(round(budget * over)) // (group * 16)) * 16, 16)
    out = pack_groups_expand_fine(plan, plan.keep, 0, rays_o, rays_d,
                                  bitfield, bound, cascades, group,
                                  budget, budget_g, occ_stride)
    return jax.tree.map(jax.lax.stop_gradient, out)


def group_plan(rays_o, rays_d, bitfield, bound: float, cascades: int,
               max_steps: int, k: int, num_candidates: int, group: int = 8,
               perturb: jnp.ndarray | None = None, min_near: float = 0.05,
               aabb: jnp.ndarray | None = None,
               coarse_steps: int = 0, kg: int = 0,
               pool: int = 32) -> GroupPlan:
    """Level 1 of the two-level march: AABB clip + coarse tighten + group
    midpoint test against the dilated pooled pool^3 view + per-ray group
    stride subsample. Factored out so the transmittance-terminated renderer
    can slice the kept-group mask into rounds (render.renderer).

    kg: per-ray kept-group cap — 0 derives k // group (per-ray budget
    policy at group granularity), -1 disables the per-ray stride entirely
    (every valid group kept; the caller's global budgets thin instead),
    > 0 is an explicit cap. See RenderOptions.tl_kg."""
    g = group
    n = rays_o.shape[0]
    c = num_candidates
    assert c % g == 0, "num_candidates must divide into groups"
    cg = c // g
    kg = cg if kg < 0 else (kg if kg > 0 else max(k // g, 1))
    dt_min = 2.0 * SQRT3 / max_steps
    assert (g - 1) * dt_min < 2.0 * bound / pool, \
        "group span exceeds the pooled cell; midpoint test not conservative"
    assert cascades == 1, "two-level march is single-cascade (caller gates)"

    if aabb is None:
        aabb = jnp.array([-bound, -bound, -bound, bound, bound, bound],
                         jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    if coarse_steps > 0:
        nears, fars = coarse_tighten(rays_o, rays_d, bitfield, nears, fars,
                                     cascades, bound, n_steps=coarse_steps,
                                     max_steps=max_steps)
    t0 = nears
    if perturb is not None:
        t0 = t0 + perturb * dt_min

    gi = jnp.arange(cg, dtype=jnp.float32)
    tm = t0[:, None] + (gi * g + (g - 1) * 0.5)[None, :] * dt_min  # midpoints
    xyz_m = rays_o[:, None, :] + tm[..., None] * rays_d[:, None, :]
    cell = jnp.clip((xyz_m / bound * 0.5 + 0.5) * pool, 0.0, pool - 1.0) \
        .astype(jnp.int32)
    lin = (cell[..., 0] * pool + cell[..., 1]) * pool + cell[..., 2]
    pooled = pooled_dilated(bitfield, cascades, pool)
    occ_g = jnp.take(pooled, lin)
    t_first = t0[:, None] + (gi * g)[None, :] * dt_min
    valid_g = occ_g & (t_first < fars[:, None])

    # Per-ray group budget: over-kg rays keep every stride-th valid group.
    rank = jnp.cumsum(valid_g.astype(jnp.int32), axis=1)
    count = rank[:, -1:]
    stride = jnp.maximum(jnp.ceil(count / kg).astype(jnp.int32), 1)[:, 0]
    keep = valid_g & (((rank - 1) % stride[:, None]) == 0)
    return GroupPlan(t0=t0, fars=fars, stride=stride, keep=keep,
                     dt_min=dt_min)


def pack_groups_expand_fine(plan: GroupPlan, keep: jnp.ndarray, col0: int,
                            rays_o, rays_d, bitfield, bound: float,
                            cascades: int, g: int, budget: int,
                            budget_g: int, occ_stride: int) -> MarchedRays:
    """Levels pack/2/repack of the two-level march for the group COLUMNS
    [col0, col0 + keep.shape[1]) of the plan's ladder (the full ladder when
    col0=0 and keep=plan.keep; a round slice in the terminated renderer).

    keep may be further masked (e.g. by per-ray aliveness) but must be a
    subset of plan.keep's columns.

    GRACEFUL OVERFLOW: both static budgets (budget_g groups, budget fine
    samples) historically truncated in slot order when demand exceeded
    them, silently dropping ALL of the trailing rays' samples — the
    catastrophic failure mode documented for flat packing (PERFORMANCE.md
    round 2 'teacher proxy renders'; round 3 found it again when the -O
    eval point moved the sample budget to real demand and a dense 256^2
    val chunk overflowed it, 41.3 -> 26.2 dB). Here overflow instead keeps
    evenly-spaced valid members (Bresenham subsample over the global valid
    rank) and rescales each ray's deltas by its kept fraction, conserving
    per-ray optical depth to first order — every ray degrades a little
    instead of trailing rays losing everything. Under budget the spacing
    clamps to 1 and the selection is bit-exact to the old behavior (the
    parity tests pin this)."""
    n, csg = keep.shape
    budget_g = min(budget_g, n * csg)  # can't pack more groups than exist
    mf = budget_g * g  # fine expansion length

    # --- graceful group-budget overflow: evenly thin kept groups ---
    keepf = keep.reshape(-1)
    rg = jnp.cumsum(keepf.astype(jnp.int32))        # 1-indexed at kept slots
    sg = jnp.maximum(rg[-1].astype(jnp.float32) / budget_g, 1.0)
    keepf = keepf & ((rg.astype(jnp.float32) / sg).astype(jnp.int32)
                     != ((rg - 1).astype(jnp.float32) / sg).astype(jnp.int32))
    counts_g_all = keep.sum(1).astype(jnp.int32)
    counts_g = keepf.reshape(n, csg).sum(1).astype(jnp.int32)
    # per-ray optical-depth compensation for dropped groups
    gscale = counts_g_all.astype(jnp.float32) / jnp.maximum(counts_g, 1)

    # --- pack groups (single-key sort, see compact_flat_direct) ---
    ncg = n * csg
    idx = jnp.arange(ncg, dtype=jnp.int32)
    skeys = jax.lax.sort(jnp.where(keepf, idx, idx + ncg))
    selg = skeys[:budget_g]
    kept_g = selg < ncg
    selg = jnp.where(kept_g, selg, selg - ncg)
    ray_g = (selg // csg).astype(jnp.int32)          # [BG]
    gidx = (selg % csg).astype(jnp.int32) + col0     # global group index

    # --- level 2: expand; ray data gathered per GROUP, broadcast over g ---
    t0_g = jnp.take(plan.t0, ray_g)                  # [BG]
    far_g = jnp.take(plan.fars, ray_g)
    str_g = jnp.take(plan.stride, ray_g).astype(jnp.float32)
    ro_g = jnp.take(rays_o, ray_g, axis=0)           # [BG, 3]
    rd_g = jnp.take(rays_d, ray_g, axis=0)
    j = jnp.arange(g, dtype=jnp.float32)
    cand = gidx.astype(jnp.float32)[:, None] * g + j[None, :]   # [BG, g]
    ts_2 = t0_g[:, None] + cand * plan.dt_min
    xyz_2 = ro_g[:, None, :] + ts_2[..., None] * rd_g[:, None, :]
    dts_2 = jnp.broadcast_to((plan.dt_min * str_g)[:, None], ts_2.shape)
    if occ_stride > 1 and g % occ_stride == 0:
        occ_f = occupancy_at(xyz_2[:, ::occ_stride], dts_2[:, ::occ_stride],
                             bitfield, cascades, bound)
        occ_f = jnp.repeat(occ_f, occ_stride, axis=1)
    else:
        occ_f = occupancy_at(xyz_2, dts_2, bitfield, cascades, bound)
    valid_2 = (kept_g[:, None] & occ_f & (ts_2 < far_g[:, None])
               & (jnp.abs(xyz_2).max(-1) <= bound))               # [BG, g]

    # --- repack fine-valid members to the final budget ---
    # graceful fine-budget overflow: evenly thin the valid fine members
    # (same Bresenham scheme as the group budget above); slot-order
    # truncation at sel2 remains only as a +-1 rounding backstop.
    v2_all = valid_2.reshape(-1)
    r2 = jnp.cumsum(v2_all.astype(jnp.int32))
    s2 = jnp.maximum(r2[-1].astype(jnp.float32) / budget, 1.0)
    v2 = v2_all & ((r2.astype(jnp.float32) / s2).astype(jnp.int32)
                   != ((r2 - 1).astype(jnp.float32) / s2).astype(jnp.int32))
    idx2 = jnp.arange(mf, dtype=jnp.int32)
    skeys2 = jax.lax.sort(jnp.where(v2, idx2, idx2 + mf))
    sel2 = skeys2[:budget]
    valid_f = sel2 < mf
    sel2 = jnp.where(valid_f, sel2, sel2 - mf)
    ray_id = jnp.take(ray_g, sel2 // g)
    ts_f = jnp.take(ts_2.reshape(-1), sel2)
    dts_f = jnp.take(dts_2.reshape(-1), sel2)
    rd = jnp.take(rays_d, ray_id, axis=0)
    xyzs = jnp.take(rays_o, ray_id, axis=0) + ts_f[:, None] * rd

    # Per-ray fine counts via the cumsum-boundary trick: ray r's members
    # occupy fine slots [gstart_r*g, gend_r*g) (group pack is ray-contiguous).
    gstarts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts_g)[:-1].astype(jnp.int32)])
    fs = jnp.minimum(gstarts, budget_g) * g
    fe = jnp.minimum(gstarts + counts_g, budget_g) * g
    cum0 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(v2.astype(jnp.int32)).astype(jnp.int32)])
    counts = jnp.take(cum0, fe) - jnp.take(cum0, fs)              # [N]
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    kept = (jnp.minimum(offsets + counts, budget)
            - jnp.minimum(offsets, budget))

    # per-ray optical-depth compensation: scale deltas by the dropped
    # fraction of each ray's (group thinning x fine thinning) members
    cum_all = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(v2_all.astype(jnp.int32)).astype(jnp.int32)])
    counts_all_f = jnp.take(cum_all, fe) - jnp.take(cum_all, fs)  # [N]
    fscale = counts_all_f.astype(jnp.float32) / jnp.maximum(counts, 1)
    dscale = gscale * fscale
    dts_f = dts_f * jnp.take(dscale, jnp.clip(ray_id, 0, n - 1))

    return MarchedRays(
        xyzs=xyzs, dirs=rd, deltas=dts_f, ts=ts_f,
        ray_id=jnp.clip(ray_id, 0, n - 1), valid=valid_f,
        offsets=jnp.minimum(offsets, budget), counts=jnp.maximum(kept, 0))


def compact_flat_sharded(compact, ts, dts, valid, rays_o, rays_d,
                         k: int, budget: int, shards: int) -> MarchedRays:
    """Run a flat pack per contiguous ray slice so DP stays sharded.

    The global pack couples the whole batch through one [N*C]-key sort and
    one [N*C] cumsum; under a data-sharded ray batch XLA implements those as
    all-gather + replicated compute — measured in the partitioned train-step
    HLO as a batch-scale `all-gather f32[N,C]`, after which the FIELD (86%
    of the step) runs replicated too, i.e. DP would not scale
    (scripts/probe_dp_hlo.py). Here the batch is split into `shards`
    contiguous ray slices, each packed independently (vmapped `compact`)
    into its own budget/shards sub-buffer; sorts and cumsums become batched
    over the slice axis, which the SPMD partitioner keeps sharded. This is
    the static-shape analog of giving each GPU its own `mean_count`
    pre-allocation in the reference's (never-enabled) DDP mode
    (raymarching/raymarching.py:198-204, nerf/utils.py:330-332).

    Semantics vs the global pack: the per-ray stride subsample is unchanged
    (per-ray); only the graceful-overflow Bresenham thinning becomes
    per-slice instead of global. Under budget the selection is bit-identical
    (slices are contiguous ray ranges, so slice-major == ray-major order);
    pad slots between slice sub-buffers carry valid=False like the global
    tail pad. N % shards == 0 and budget % shards == 0 required (the
    renderer rounds the budget to a multiple of 128 * shards).
    """
    n, c = ts.shape
    assert n % shards == 0 and budget % shards == 0, (n, budget, shards)
    ns, bs = n // shards, budget // shards
    part = lambda a: a.reshape(shards, ns, *a.shape[1:])
    out = jax.vmap(lambda t, d, v, o, dd: compact(t, d, v, o, dd, k, bs))(
        part(ts), part(dts), part(valid), part(rays_o), part(rays_d))
    ray_off = (jnp.arange(shards, dtype=jnp.int32) * ns)[:, None]
    slot_off = (jnp.arange(shards, dtype=jnp.int32) * bs)[:, None]
    flat = lambda a: a.reshape(shards * a.shape[1], *a.shape[2:])
    return MarchedRays(
        xyzs=flat(out.xyzs), dirs=flat(out.dirs), deltas=flat(out.deltas),
        ts=flat(out.ts), ray_id=flat(out.ray_id + ray_off),
        valid=flat(out.valid), offsets=flat(out.offsets + slot_off),
        counts=flat(out.counts))


def march_rays_flat(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    bitfield: jnp.ndarray, bound: float, cascades: int,
                    dt_gamma: float, max_steps: int, k: int, budget: int,
                    num_candidates: int | None = None,
                    perturb: jnp.ndarray | None = None,
                    min_near: float = 0.05,
                    aabb: jnp.ndarray | None = None,
                    occ_stride: int = 2,
                    coarse_steps: int = 0,
                    span_adaptive: bool = False,
                    select: str = "sort",
                    shards: int = 1) -> MarchedRays:
    """Occupancy march straight to the flat packed layout (train fast path).

    Same candidate ladder / occupancy semantics as march_rays_grid, but the
    [N, K] intermediate and its top_k never exist (see compact_flat_direct /
    compact_flat_gather — `select` picks 'sort' or 'gather'; both produce
    the identical packing, gather replaces the global sort with rank
    inversion and measures faster at budget << N*C).
    """
    ts, dts, valid = march_candidates(
        rays_o, rays_d, bitfield, bound, cascades, dt_gamma, max_steps,
        num_candidates, perturb=perturb, min_near=min_near, aabb=aabb,
        occ_stride=occ_stride, coarse_steps=coarse_steps,
        span_adaptive=span_adaptive)
    compact = compact_flat_gather if select == "gather" else compact_flat_direct
    if shards > 1:
        out = compact_flat_sharded(compact, ts, dts, valid, rays_o, rays_d,
                                   k, budget, shards)
    else:
        out = compact(ts, dts, valid, rays_o, rays_d, k, budget)
    return jax.tree.map(jax.lax.stop_gradient, out)


def march_candidates(rays_o, rays_d, bitfield, bound: float, cascades: int,
                     dt_gamma: float, max_steps: int,
                     num_candidates: int | None = None,
                     perturb: jnp.ndarray | None = None,
                     min_near: float = 0.05,
                     aabb: jnp.ndarray | None = None,
                     occ_stride: int = 2, coarse_steps: int = 0,
                     span_adaptive: bool = False):
    """Occupancy-tested candidate ladder (the march minus the packing).

    Returns (ts, dts, valid) [N, C]: the candidate schedule of
    march_rays_flat with validity = in-interval AND occupied AND in-bounds.
    Factored out so the transmittance-termination renderer can slice the
    ladder into rounds and pack each round separately (render.renderer)."""
    if aabb is None:
        aabb = jnp.array([-bound, -bound, -bound, bound, bound, bound],
                         jnp.float32)
    if num_candidates is None:
        num_candidates = max_steps
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    if coarse_steps > 0:
        nears, fars = coarse_tighten(rays_o, rays_d, bitfield, nears, fars,
                                     cascades, bound, n_steps=coarse_steps,
                                     dt_gamma=dt_gamma, max_steps=max_steps)
    ts, dts, valid = candidate_ts(nears, fars, num_candidates, dt_gamma,
                                  bound, max_steps, perturb,
                                  span_adaptive=span_adaptive)
    xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    if occ_stride > 1 and num_candidates % occ_stride == 0:
        occ = occupancy_at(xyz[:, ::occ_stride], dts[:, ::occ_stride],
                           bitfield, cascades, bound)
        occ = jnp.repeat(occ, occ_stride, axis=1)
    else:
        occ = occupancy_at(xyz, dts, bitfield, cascades, bound)
    valid = valid & occ & (jnp.abs(xyz).max(-1) <= bound)
    return ts, dts, valid


def march_rays_flat_grouped(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                            bitfield: jnp.ndarray, bound: float,
                            cascades: int, max_steps: int, k: int,
                            budget: int, num_candidates: int,
                            perturb: jnp.ndarray | None = None,
                            min_near: float = 0.05,
                            aabb: jnp.ndarray | None = None,
                            occ_stride: int = 4,
                            coarse_steps: int = 0) -> MarchedRays:
    """Group-granular flat march: the compaction sort runs over candidate
    GROUPS of `occ_stride`, not candidates (uniform-ladder / dt_gamma==0
    fast path).

    Key fact the candidate-level path leaves on the table: with occ_stride s
    the occupancy bit is constant across each run of s consecutive candidates
    (march_rays_flat tests every s-th candidate and repeats the bit), and the
    remaining validity terms (ts < far, |xyz| <= bound) only trim the ends of
    a ray's interval. So group validity == first-member validity, and the
    whole select-and-pack can run on [N, C/s] group representatives: the
    candidate ladder, the bitfield gather, AND the packing sort all shrink by
    s (the sort was the largest march piece, PERFORMANCE.md). Kept groups
    expand to their s candidates arithmetically (ts = t0 + idx*dt); members
    that individually fail ts/bound at the far boundary are carried as
    valid=False slots inside the segment — composite_flat masks them, at a
    cost of <~2 groups' padding per ray.

    Semantics deltas vs march_rays_flat: over-budget rays subsample every
    stride-th GROUP (deltas scaled by the stride, as before) instead of
    every stride-th candidate, and the budget is consumed in whole groups.
    Same role as the reference's mean_count pool + random ray dropping
    (raymarching/raymarching.py:198-204).

    OPTIONAL (RenderOptions.group_compact, default off): the sustained-point
    A/B measured only +2% step rate — the single-sort flat march already
    made the sort cheap — while the group-boundary pad slots consume budget
    and cost ~0.6 dB at equal steps (see PERFORMANCE.md).

    Equivalent of reference `march_rays_train` (raymarching.cu:312-490).
    """
    g = occ_stride
    n = rays_o.shape[0]
    cg = num_candidates // g
    kg = max(k // g, 1)
    budget_g = budget // g
    if aabb is None:
        aabb = jnp.array([-bound, -bound, -bound, bound, bound, bound],
                         jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    if coarse_steps > 0:
        nears, fars = coarse_tighten(rays_o, rays_d, bitfield, nears, fars,
                                     cascades, bound, n_steps=coarse_steps,
                                     max_steps=max_steps)
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 * bound / GRID_SIZE
    del dt_max  # uniform ladder: dt == dt_min (dt_gamma == 0 contract)
    t0 = nears
    if perturb is not None:
        t0 = t0 + perturb * dt_min
    # Group-representative ladder: first member of each group of g.
    gk = jnp.arange(cg, dtype=jnp.float32) * (g * dt_min)
    ts_g = t0[:, None] + gk[None, :]                      # [N, CG]
    xyz_g = rays_o[:, None, :] + ts_g[..., None] * rays_d[:, None, :]
    dts_g = jnp.full_like(ts_g, dt_min)
    occ = occupancy_at(xyz_g, dts_g, bitfield, cascades, bound)
    valid_g = (ts_g < fars[:, None]) & occ & (jnp.abs(xyz_g).max(-1) <= bound)
    # Per-ray group budget: over-kg rays keep every stride-th valid group.
    rank = jnp.cumsum(valid_g.astype(jnp.int32), axis=1)
    count = rank[:, -1:]
    stride = jnp.maximum(jnp.ceil(count / kg).astype(jnp.int32), 1)
    keep = valid_g & (((rank - 1) % stride) == 0)
    # Single-array sort over N*CG group keys (see compact_flat_direct).
    ncg = n * cg
    idx = jnp.arange(ncg, dtype=jnp.int32)
    skeys = jax.lax.sort(jnp.where(keep.reshape(-1), idx, idx + ncg))
    selg = skeys[:budget_g]
    kept_g = selg < ncg
    selg = jnp.where(kept_g, selg, selg - ncg)
    ray_g = selg // cg                                    # [BG]
    gidx = selg % cg
    # Expand each kept group to its g member candidates.
    j = jnp.arange(g, dtype=jnp.int32)
    cand = (gidx[:, None] * g + j[None, :]).reshape(-1)   # [BG*g]
    ray_id = jnp.repeat(ray_g, g).astype(jnp.int32)
    ts_f = jnp.take(t0, ray_id) + cand.astype(jnp.float32) * dt_min
    dts_f = dt_min * jnp.take(stride[:, 0], ray_id).astype(jnp.float32)
    rd = jnp.take(rays_d, ray_id, axis=0)
    xyzs = jnp.take(rays_o, ray_id, axis=0) + ts_f[:, None] * rd
    valid_f = (jnp.repeat(kept_g, g)
               & (ts_f < jnp.take(fars, ray_id))
               & (jnp.abs(xyzs).max(-1) <= bound))
    counts = keep.sum(1).astype(jnp.int32) * g            # incl. pad slots
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    kept = (jnp.minimum(starts + counts, budget)
            - jnp.minimum(starts, budget))
    out = MarchedRays(
        xyzs=xyzs, dirs=rd, deltas=dts_f, ts=ts_f,
        ray_id=jnp.clip(ray_id, 0, n - 1), valid=valid_f,
        offsets=jnp.minimum(starts, budget), counts=jnp.maximum(kept, 0))
    return jax.tree.map(jax.lax.stop_gradient, out)


def march_rays_grid(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    bitfield: jnp.ndarray, bound: float, cascades: int,
                    dt_gamma: float, max_steps: int, k: int,
                    num_candidates: int | None = None,
                    perturb: jnp.ndarray | None = None,
                    min_near: float = 0.05,
                    aabb: jnp.ndarray | None = None,
                    occ_stride: int = 2,
                    coarse_steps: int = 0,
                    span_adaptive: bool = False) -> MarchedGrid:
    """Occupancy march producing the per-ray [N, K] layout (see compact_topk).

    occ_stride > 1 tests the bitfield at every s-th candidate and broadcasts
    the bit to its neighbors — at the default dt (2*sqrt(3)/max_steps) a
    128^3 cell spans ~2.3 candidates, so stride 2 is near-exact and halves
    the dominant gather cost. Marching is a non-differentiable selection, so
    everything here is stop-gradient (keeps take_along_axis transposes —
    XLA scatters at ~24M/s — out of the backward graph)."""
    if aabb is None:
        aabb = jnp.array([-bound, -bound, -bound, bound, bound, bound], jnp.float32)
    if num_candidates is None:
        num_candidates = max_steps
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    if coarse_steps > 0:
        nears, fars = coarse_tighten(rays_o, rays_d, bitfield, nears, fars,
                                     cascades, bound, n_steps=coarse_steps,
                                     dt_gamma=dt_gamma, max_steps=max_steps)
    ts, dts, valid = candidate_ts(nears, fars, num_candidates, dt_gamma, bound,
                                  max_steps, perturb,
                                  span_adaptive=span_adaptive)
    xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    if occ_stride > 1 and num_candidates % occ_stride == 0:
        occ = occupancy_at(xyz[:, ::occ_stride], dts[:, ::occ_stride],
                           bitfield, cascades, bound)
        occ = jnp.repeat(occ, occ_stride, axis=1)
    else:
        occ = occupancy_at(xyz, dts, bitfield, cascades, bound)
    valid = valid & occ & (jnp.abs(xyz).max(-1) <= bound)
    out = compact_topk(ts, dts, valid, rays_o, rays_d, k)
    return jax.tree.map(jax.lax.stop_gradient, out)


def march_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray, bitfield: jnp.ndarray,
               bound: float, cascades: int, dt_gamma: float, max_steps: int,
               budget: int, num_candidates: int | None = None,
               perturb: jnp.ndarray | None = None,
               min_near: float = 0.05,
               aabb: jnp.ndarray | None = None) -> MarchedRays:
    """Full occupancy march: AABB clip -> candidate ladder -> bit test -> compact.

    Equivalent of reference `march_rays_train` (raymarching.cu:312-490) for a
    whole ray batch; also serves inference (reference march_rays :700-797) —
    there is no separate alive-list path on TPU, the budget plays that role.
    """
    if aabb is None:
        aabb = jnp.array([-bound, -bound, -bound, bound, bound, bound], jnp.float32)
    if num_candidates is None:
        num_candidates = max_steps
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    ts, dts, valid = candidate_ts(nears, fars, num_candidates, dt_gamma, bound,
                                  max_steps, perturb)
    xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    occ = occupancy_at(xyz, dts, bitfield, cascades, bound)
    valid = valid & occ & (jnp.abs(xyz).max(-1) <= bound)
    return compact_samples(ts, dts, valid, rays_o, rays_d, budget)
