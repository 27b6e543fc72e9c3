"""Device-side ray generation.

Equivalent of reference `get_rays` (nerf/utils.py:54-139). Runs jitted on
device: the trainer samples pixel indices (uniform, error-map-weighted, or
patch-aligned) and builds world rays from the pose table — no host round trip
per step (the reference similarly generates rays on-GPU inside collate,
nerf/provider.py:277-323).

Pose convention: camera-to-world, +z forward (ngp convention, see
data/provider.py nerf_matrix_to_ngp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dirs_from_pixels(i, j, intrinsics):
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    xs = (i + 0.5 - cx) / fx
    ys = (j + 0.5 - cy) / fy
    zs = jnp.ones_like(xs)
    return jnp.stack([xs, ys, zs], axis=-1)


def rays_from_pixels(pose, intrinsics, i, j):
    """pose [4,4]; i,j [...] pixel coords -> (rays_o, rays_d) [..., 3]."""
    dirs = _dirs_from_pixels(i.astype(jnp.float32), j.astype(jnp.float32), intrinsics)
    rays_d = jnp.einsum("ij,...j->...i", pose[:3, :3], dirs)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays(key, pose, intrinsics, h: int, w: int, num_rays: int,
             error_map=None, patch_size: int = 1):
    """Sample `num_rays` pixels from one image and build rays.

    Args:
      error_map: optional [eh*ew] sampling weights (reference error_map is
        128x128, nerf/utils.py:106-124); pixels are drawn proportional to it.
      patch_size: >1 samples aligned square patches (for patch-based losses).

    Returns:
      dict(rays_o [N,3], rays_d [N,3], inds [N] flat pixel indices).
    """
    if patch_size > 1:
        num_patches = num_rays // (patch_size * patch_size)
        k1, _ = jax.random.split(key)
        pi = jax.random.randint(k1, (num_patches,), 0, h - patch_size)
        pj = jax.random.randint(jax.random.fold_in(k1, 1), (num_patches,), 0, w - patch_size)
        di = jnp.arange(patch_size)
        ii = (pi[:, None, None] + di[None, :, None])
        jj = (pj[:, None, None] + di[None, None, :])
        row = jnp.broadcast_to(ii, (num_patches, patch_size, patch_size)).reshape(-1)
        col = jnp.broadcast_to(jj, (num_patches, patch_size, patch_size)).reshape(-1)
        inds = row * w + col
    elif error_map is None:
        inds = jax.random.randint(key, (num_rays,), 0, h * w)
        row, col = inds // w, inds % w
    else:
        # Coarse cell draw proportional to error, then uniform within cell
        # (reference nerf/utils.py:106-124).
        eh = ew = 128
        k1, k2 = jax.random.split(key)
        cell = jax.random.categorical(k1, jnp.log(error_map + 1e-8), shape=(num_rays,))
        ci, cj = cell // ew, cell % ew
        u = jax.random.uniform(k2, (num_rays, 2))
        row = jnp.clip(((ci + u[:, 0]) * (h / eh)).astype(jnp.int32), 0, h - 1)
        col = jnp.clip(((cj + u[:, 1]) * (w / ew)).astype(jnp.int32), 0, w - 1)
        inds = row * w + col
    rays_o, rays_d = rays_from_pixels(pose, intrinsics, col, row)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}


def get_full_rays(pose, intrinsics, h: int, w: int):
    """All H*W rays of one view (row-major)."""
    row, col = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    rays_o, rays_d = rays_from_pixels(pose, intrinsics, col, row)
    return {"rays_o": rays_o.reshape(-1, 3), "rays_d": rays_d.reshape(-1, 3)}
