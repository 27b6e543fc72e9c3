"""Teacher-side rendering: proxy remapping + occupancy bitfield hacking.

Equivalent of reference SealNeRF/renderer.py:
- `make_teacher_field` wraps any backbone module so every field query is
  remapped through the mapper before evaluation and recolored after
  (reference SealNeRFTeacherRenderer.run_cuda:291-316); supports a secondary
  teacher model for cross-scene editing (:306-309). Because our renderer is
  functional, "teacher" is just another field module + params — no dynamic
  class grafting (reference SealNeRF/network.py:18-46) needed.
- `force_fill_cells` / `hack_bitfield` precompute the Morton cells covering
  the edit region and force their occupancy bits on, so marching samples the
  (initially empty) edit target space (reference init_mapper:26-48,
  hack_bitfield:62-69). `occupancy_update`-produced bitfields must be
  re-hacked after each refresh (reference update_extra_state hook :50-60).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from seal3d_tpu.ops.bitfield import GRID_CELLS, GRID_SIZE
from seal3d_tpu.ops.morton import morton3d
from seal3d_tpu.seal.mappers import SealMapper, map_color, map_to_origin


def make_teacher_field(base_field, mapper: SealMapper, base_cfg,
                       secondary_field=None, secondary_cfg=None,
                       secondary_params=None):
    """Return a field-module-compatible namespace whose queries run through
    the mapper. `params` stays the base (frozen teacher) params; if a
    secondary teacher is given, mapped-region queries are answered by it."""

    class TeacherField:
        @staticmethod
        def apply(params, cfg, x, d, valid=None):
            xm, dm, mask = map_to_origin(mapper, x, d)
            if dm is None:
                dm = d
            try:
                sigma, rgb = base_field.apply(params, cfg, xm, dm, valid=valid)
            except TypeError:
                sigma, rgb = base_field.apply(params, cfg, xm, dm)
            if secondary_field is not None:
                s2, r2 = secondary_field.apply(secondary_params, secondary_cfg, xm, dm)
                sigma = jnp.where(mask, s2, sigma)
                rgb = jnp.where(mask[:, None], r2, rgb)
            rgb_mod = map_color(mapper, xm, dm, rgb, mask=mask)
            rgb = jnp.where(mask[:, None], rgb_mod, rgb)
            return sigma, rgb

        @staticmethod
        def density(params, cfg, x):
            xm, _, mask = map_to_origin(mapper, x, None)
            out = base_field.density(params, cfg, xm)
            if secondary_field is not None:
                out2 = secondary_field.density(secondary_params, secondary_cfg, xm)
                out = {
                    "sigma": jnp.where(mask, out2["sigma"], out["sigma"]),
                    "geo_feat": out["geo_feat"],
                }
            return out

        @staticmethod
        def color(params, cfg, x, d, geo_feat):
            xm, dm, mask = map_to_origin(mapper, x, d)
            if dm is None:
                dm = d
            rgb = base_field.color(params, cfg, xm, dm, geo_feat)
            rgb_mod = map_color(mapper, xm, dm, rgb, mask=mask)
            return jnp.where(mask[:, None], rgb_mod, rgb)

        background = getattr(base_field, "background", None)

    return TeacherField


def force_fill_cells(bounds: np.ndarray, cascades: int, bound: float) -> np.ndarray:
    """Host-side precompute: all (cascade, morton) flat cell ids whose cell
    intersects any edit AABB (reference init_mapper precompute, renderer.py:26-48).

    Args:
      bounds: [B, 2, 3] world-space AABBs.
    Returns:
      [K] int64 flat cell indices into the [C * H^3] grid.
    """
    bounds = np.asarray(bounds, np.float32).reshape(-1, 2, 3)
    cells = []
    for cas in range(cascades):
        b = min(float(2**cas), float(bound))
        for lo, hi in bounds:
            g_lo = np.floor((lo / b * 0.5 + 0.5) * GRID_SIZE).astype(np.int64)
            g_hi = np.ceil((hi / b * 0.5 + 0.5) * GRID_SIZE).astype(np.int64)
            g_lo = np.clip(g_lo, 0, GRID_SIZE - 1)
            g_hi = np.clip(g_hi, 1, GRID_SIZE)
            xs = np.arange(g_lo[0], g_hi[0])
            ys = np.arange(g_lo[1], g_hi[1])
            zs = np.arange(g_lo[2], g_hi[2])
            if len(xs) == 0 or len(ys) == 0 or len(zs) == 0:
                continue
            gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
            coords = np.stack([gx, gy, gz], -1).reshape(-1, 3)
            codes = np.asarray(morton3d(jnp.asarray(coords, jnp.uint32)))
            cells.append(cas * GRID_CELLS + codes.astype(np.int64))
    if not cells:
        return np.zeros((0,), np.int64)
    return np.unique(np.concatenate(cells))


def cells_to_byte_masks(cells: np.ndarray):
    """Host-side: aggregate flat cell ids into unique (byte index, OR-mask)
    pairs so the device-side hack is a duplicate-free scatter."""
    cells = np.asarray(cells, np.int64)
    byte_idx = cells >> 3
    bit = (1 << (cells & 7)).astype(np.uint8)
    uniq, inv = np.unique(byte_idx, return_inverse=True)
    masks = np.zeros(len(uniq), np.uint8)
    np.bitwise_or.at(masks, inv, bit)
    return uniq.astype(np.int32), masks


def hack_bitfield(bitfield: jnp.ndarray, byte_idx: jnp.ndarray,
                  masks: jnp.ndarray) -> jnp.ndarray:
    """OR the edit-region cells into the occupancy bitfield
    (reference hack_bitfield:62-69: writes 255 to covered bytes).
    `byte_idx`/`masks` come from cells_to_byte_masks (duplicate-free)."""
    if byte_idx.shape[0] == 0:
        return bitfield
    return bitfield.at[byte_idx].set(bitfield[byte_idx] | masks)


def hack_grid(density_grid: jnp.ndarray, cells: jnp.ndarray,
              value: float = 64.0) -> jnp.ndarray:
    """Force density values in the edit region (reference hack_grids:57-60)."""
    if cells.shape[0] == 0:
        return density_grid
    flat = density_grid.reshape(-1)
    flat = flat.at[cells].max(value)
    return flat.reshape(density_grid.shape)
