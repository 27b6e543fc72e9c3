"""Multi-cascade occupancy grid maintenance.

Equivalent of the reference's density-grid state and `update_extra_state` /
`mark_untrained_grid` (nerf/renderer.py:87-101, 379-442, 444-538), redesigned
as a pure functional state transition that stays inside jit:

- full updates re-query the field at every cell (first 16 updates),
- partial updates re-query a fixed-size random subset: half uniform cells,
  half drawn from currently-occupied cells (static-shape analog of the
  reference's nonzero+randint resampling, renderer.py:488-514),
- EMA max decay 0.95, threshold min(mean_density, density_thresh), then
  repack the Morton-ordered bitfield.

Cells marked untrained (-1 by `mark_untrained`) never become occupied.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from seal3d_tpu.ops.bitfield import GRID_CELLS, GRID_SIZE, packbits
from seal3d_tpu.ops.morton import morton3d_invert


class OccupancyState(NamedTuple):
    density_grid: jnp.ndarray   # [C, H^3] f32, Morton order; -1 = untrained
    bitfield: jnp.ndarray       # [C * H^3 / 8] uint8
    mean_density: jnp.ndarray   # scalar f32
    iter_density: jnp.ndarray   # scalar int32 — number of updates so far
    mean_count: jnp.ndarray     # scalar f32 — EMA of samples/batch (march budget diagnostics)
    occ_aabb: jnp.ndarray = None  # [6] world AABB of occupied cells (march tightening)


def occupancy_init(cascades: int, bound: float = 1.0) -> OccupancyState:
    b = float(max(2 ** (cascades - 1), 1))
    return OccupancyState(
        density_grid=jnp.zeros((cascades, GRID_CELLS), jnp.float32),
        bitfield=jnp.zeros((cascades * GRID_CELLS // 8,), jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
        mean_count=jnp.full((), -1.0, jnp.float32),
        occ_aabb=jnp.array([-b, -b, -b, b, b, b], jnp.float32),
    )


def cell_world_positions(key: jax.Array, codes: jnp.ndarray, cascade: int,
                         bound: float) -> jnp.ndarray:
    """Morton codes -> jittered world positions inside each cell of cascade c.

    Cascade c covers [-b_c, b_c]^3 with b_c = min(2^c, bound).
    """
    coords = morton3d_invert(codes).astype(jnp.float32)  # [M, 3] in [0,128)
    jitter = jax.random.uniform(key, coords.shape)
    unit = (coords + jitter) / GRID_SIZE  # [0, 1)
    b = min(float(2**cascade), float(bound))  # reference: fminf(scalbnf(1,c), bound)
    return (unit * 2.0 - 1.0) * b


def _sample_occupied(key, occ_mask: jnp.ndarray, n: int) -> jnp.ndarray:
    """Sample n cell indices ~ uniform over occupied cells via inverse-CDF
    (cumsum + searchsorted — O(cells), unlike jax.random.categorical which
    materializes [n, cells] Gumbel noise)."""
    w = occ_mask.astype(jnp.float32)
    cdf = jnp.cumsum(w)
    total = jnp.maximum(cdf[-1], 1.0)
    u = jax.random.uniform(key, (n,)) * total
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="left"), 0, occ_mask.shape[0] - 1)
    return idx.astype(jnp.uint32)


def occupancy_update(
    state: OccupancyState,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    bound: float,
    density_thresh: float = 0.01,
    decay: float = 0.95,
    full: bool = True,
    partial_cells: int = GRID_CELLS // 8,
    occ_cells: int = 2**16,
    query_chunk: int = 2**17,
) -> OccupancyState:
    """One maintenance step.

    Args:
      density_fn: [M, 3] world positions -> [M] sigma (already density-scaled).
      full: python-static switch; callers use full for the first 16 updates
        (reference renderer.py:456-514).
      query_chunk: field queries run through lax.map in chunks of this size to
        bound peak memory (the hash-encode intermediates of all 2M cells at
        once would need tens of GB; the reference similarly chunks at S^3,
        renderer.py:469).
    """
    cascades = state.density_grid.shape[0]
    grid = state.density_grid

    def query(xs):
        n = xs.shape[0]
        if n <= query_chunk:
            return density_fn(xs)
        pad = (-n) % query_chunk
        if pad:
            xs = jnp.concatenate([xs, xs[:pad]])
        chunks = xs.reshape(-1, query_chunk, 3)
        return jax.lax.map(density_fn, chunks).reshape(-1)[:n]

    if full:
        new_vals = jnp.zeros_like(grid)
        written = jnp.ones_like(grid, dtype=bool)
        codes = jnp.arange(GRID_CELLS, dtype=jnp.uint32)
        for cas in range(cascades):
            key, sub = jax.random.split(key)
            xs = cell_world_positions(sub, codes, cas, bound)
            new_vals = new_vals.at[cas].set(query(xs))
    else:
        # Static-size partial refresh per cascade: a ROTATING strided slice
        # of `partial_cells` cells (phase = iter_density, so 8 updates cover
        # every cell deterministically — no coupon-collector gaps, and the
        # Morton layout makes each slice spatially well distributed) plus
        # `occ_cells` occupied-biased resamples (the reference's
        # nonzero+randint resampling, renderer.py:488-514 — kept smaller
        # here because its inverse-CDF searchsorted costs ~0.1us/sample).
        stride = GRID_CELLS // partial_cells
        new_vals = jnp.zeros_like(grid)
        written = jnp.zeros_like(grid, dtype=bool)
        phase = (state.iter_density % stride).astype(jnp.uint32)
        for cas in range(cascades):
            key, k2, k3 = jax.random.split(key, 3)
            uni = (jnp.arange(partial_cells, dtype=jnp.uint32) * stride + phase)
            occ = _sample_occupied(k2, grid[cas] > 0.0, occ_cells)
            codes = jnp.concatenate([uni, occ])
            xs = cell_world_positions(k3, codes, cas, bound)
            vals = query(xs)
            new_vals = new_vals.at[cas, codes].max(vals)
            written = written.at[cas, codes].set(True)

    trained = grid >= 0.0
    decayed = jnp.where(written, jnp.maximum(grid * decay, new_vals), grid)
    grid = jnp.where(trained, decayed, grid)

    # clamp(grid,0).mean() over ALL cells (reference nerf/renderer.py:527) —
    # averaging over trained cells only would raise the mean and over-cull.
    mean_density = jnp.maximum(grid, 0.0).mean()
    thresh = jnp.minimum(mean_density, density_thresh)
    bitfield = packbits(grid, thresh)
    # world AABB of occupied coarsest-cascade cells: tightens per-ray
    # near/far so candidate ladders skip guaranteed-empty margins.
    coords = morton3d_invert(jnp.arange(GRID_CELLS, dtype=jnp.uint32)).astype(jnp.float32)
    occ_any = (grid > thresh).any(0)
    b_last = min(float(2 ** (cascades - 1)), float(bound))
    world = (coords / GRID_SIZE * 2.0 - 1.0) * b_last
    cell = 2.0 * b_last / GRID_SIZE
    big = jnp.full((3,), 1e9, jnp.float32)
    lo = jnp.where(occ_any[:, None], world, big).min(0) - cell
    hi = jnp.where(occ_any[:, None], world, -big).max(0) + 2 * cell
    has_occ = occ_any.any()
    occ_aabb = jnp.where(has_occ, jnp.concatenate([lo, hi]),
                         jnp.array([-b_last] * 3 + [b_last] * 3, jnp.float32))
    return OccupancyState(
        density_grid=grid,
        bitfield=bitfield,
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
        mean_count=state.mean_count,
        occ_aabb=occ_aabb,
    )


from functools import partial


@partial(jax.jit, static_argnames=("bound", "chunk"))
def mark_untrained(state: OccupancyState, poses: jnp.ndarray,
                   intrinsics: jnp.ndarray, bound: float,
                   chunk: int = GRID_CELLS // 8) -> OccupancyState:
    """Mark cells invisible from every training camera with density -1.

    Equivalent of reference mark_untrained_grid (nerf/renderer.py:379-442):
    a cell survives if its center projects inside the image frustum of at
    least one camera. Pose convention matches data/rays.py: camera-to-world
    with +z forward (the ngp convention produced by nerf_matrix_to_ngp).

    Args:
      poses: [B, 4, 4] camera-to-world.
      intrinsics: [4] (fx, fy, cx, cy).
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    cam_pos = poses[:, :3, 3]  # [B, 3]
    rot = poses[:, :3, :3]  # [B, 3, 3] camera-to-world

    cascades = state.density_grid.shape[0]
    codes = jnp.arange(GRID_CELLS, dtype=jnp.uint32)
    coords = morton3d_invert(codes).astype(jnp.float32)
    unit = (coords + 0.5) / GRID_SIZE

    grid = state.density_grid
    for cas in range(cascades):
        b = min(float(2**cas), float(bound))
        world = (unit * 2.0 - 1.0) * b  # [N, 3]

        def visible_any(cells):
            rel = cells[:, None, :] - cam_pos[None, :, :]  # [n, B, 3]
            # world->camera: R^T @ rel
            cam = jnp.einsum("bij,nbi->nbj", rot, rel)  # [n, B, 3]
            z = cam[..., 2]
            eps = 1e-6
            in_front = z > eps
            # Frustum half-extents with a small slack so cells straddling the
            # image border stay trained (reference uses half-voxel tolerance).
            half_w = 1.05 * cx / fx
            half_h = 1.05 * cy / fy
            ok_x = jnp.abs(cam[..., 0] / jnp.maximum(z, eps)) < half_w
            ok_y = jnp.abs(cam[..., 1] / jnp.maximum(z, eps)) < half_h
            return (in_front & ok_x & ok_y).any(axis=1)

        vis = jax.lax.map(visible_any,
                          world.reshape(GRID_CELLS // chunk, chunk, 3)).reshape(-1)
        grid = grid.at[cas].set(jnp.where(vis, grid[cas], -1.0))

    return state._replace(density_grid=grid)


# ----------------------------------------------------- time-sliced (D-NeRF)

class OccupancyStateT(NamedTuple):
    """Time-axis occupancy for dynamic scenes (reference dnerf/renderer.py:92-105:
    density_grid [T, CAS, H^3], per-time bitfields)."""

    density_grid: jnp.ndarray   # [T, C, H^3]
    bitfield: jnp.ndarray       # [T, C * H^3 / 8]
    mean_density: jnp.ndarray
    iter_density: jnp.ndarray


def occupancy_t_init(time_size: int, cascades: int) -> OccupancyStateT:
    return OccupancyStateT(
        density_grid=jnp.zeros((time_size, cascades, GRID_CELLS), jnp.float32),
        bitfield=jnp.zeros((time_size, cascades * GRID_CELLS // 8), jnp.uint8),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
    )


def occupancy_t_update(state: OccupancyStateT, density_fn, key: jax.Array,
                       bound: float, t_indices: jnp.ndarray,
                       density_thresh: float = 0.01, decay: float = 0.95,
                       cells_per_slice: int = GRID_CELLS // 8,
                       query_chunk: int = 2**17) -> OccupancyStateT:
    """Refresh `t_indices` time slices (uniform + occupied-biased cells, time
    jittered within the slice — reference dnerf/renderer.py:454-541).

    density_fn: (x [M,3], t [M]) -> sigma [M].
    """
    time_size, cascades, _ = state.density_grid.shape
    grid = state.density_grid
    n_t = t_indices.shape[0]

    def refresh_slice(carry, ti):
        grid, key = carry
        for cas in range(cascades):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            uni = jax.random.randint(k1, (cells_per_slice,), 0, GRID_CELLS).astype(jnp.uint32)
            occ = _sample_occupied(k2, grid[ti, cas] > 0.0, cells_per_slice)
            codes = jnp.concatenate([uni, occ])
            xs = cell_world_positions(k3, codes, cas, bound)
            tval = (ti.astype(jnp.float32) + 0.5) / time_size
            tj = tval + (jax.random.uniform(k4, (codes.shape[0],)) - 0.5) / time_size
            m = xs.shape[0]
            if m > query_chunk:
                chunks = (xs.reshape(m // query_chunk, query_chunk, 3),
                          tj.reshape(m // query_chunk, query_chunk))
                vals = jax.lax.map(lambda a: density_fn(a[0], a[1]), chunks).reshape(m)
            else:
                vals = density_fn(xs, tj)
            cur = grid[ti, cas]
            new = jnp.zeros_like(cur).at[codes].max(vals)
            written = jnp.zeros_like(cur, dtype=bool).at[codes].set(True)
            trained = cur >= 0.0
            upd = jnp.where(written & trained, jnp.maximum(cur * decay, new), cur)
            grid = grid.at[ti, cas].set(upd)
        return (grid, key), None

    (grid, key), _ = jax.lax.scan(refresh_slice, (grid, key), t_indices)
    mean_density = jnp.maximum(grid, 0.0).mean()
    thresh = jnp.minimum(mean_density, density_thresh)
    bitfield = jax.vmap(lambda g: packbits(g, thresh))(grid)
    return OccupancyStateT(density_grid=grid, bitfield=bitfield,
                           mean_density=mean_density,
                           iter_density=state.iter_density + 1)
