"""Seal datasets: whole-dataset teacher proxying + edit-centered random poses.

Equivalent of reference SealNeRF/provider.py: `proxy_dataset` replaces every
gt image/depth with a (bitfield-hacked) teacher render once up front
(:19-70, amortizing the distillation target); `seal_random_dataset` generates
orbit poses around the mapper's pose_center/pose_radius (:145-178 — including
the look_at behavior the reference's rand_poses never implemented,
SURVEY.md §5.10).
"""

from __future__ import annotations

import numpy as np

from seal3d_tpu.data.provider import NeRFDataset, rand_poses
from seal3d_tpu.seal.mappers import SealMapper


def seal_random_dataset(mapper: SealMapper, n_views: int, h: int, w: int,
                        intrinsics: np.ndarray, seed: int = 0,
                        radius_scale: float = 0.1) -> NeRFDataset:
    """Poses orbiting the edit region (images filled by proxy_dataset)."""
    rng = np.random.default_rng(seed)
    radius = max(mapper.pose_radius * radius_scale, 0.3)
    poses = rand_poses(rng, n_views, radius=radius, theta_range=(45, 105),
                       look_at=mapper.pose_center)
    return NeRFDataset(poses=poses, images=None,
                       intrinsics=np.asarray(intrinsics, np.float32),
                       h=h, w=w, radius=radius)


def proxy_dataset(dataset: NeRFDataset, render_view_fn,
                  sync_at_end: bool = False) -> NeRFDataset:
    """Replace all gt images (and depths) with teacher renders.

    Args:
      render_view_fn: pose -> (image [H,W,3] float in [0,1], depth [H,W]).
      sync_at_end: render_view_fn returns DEVICE arrays; dispatch every view
        first and fetch the whole stack with one device_get (pipelines the
        renders instead of a host sync per view).
    Returns a new NeRFDataset with uint8 RGB + float32 depth.
    """
    images, depths = [], []
    for pose in dataset.poses:
        img, dep = render_view_fn(pose)
        if sync_at_end:
            images.append(img)
            depths.append(dep)
        else:
            images.append((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8))
            depths.append(np.asarray(dep, np.float32))
    if sync_at_end:
        import jax

        images, depths = jax.device_get((images, depths))
        images = [(np.clip(i, 0, 1) * 255).astype(np.uint8) for i in images]
        depths = [np.asarray(d, np.float32) for d in depths]
    out = NeRFDataset(
        poses=dataset.poses, images=np.stack(images),
        intrinsics=dataset.intrinsics, h=dataset.h, w=dataset.w,
        radius=dataset.radius, error_map=dataset.error_map,
        depths=np.stack(depths))
    return out
