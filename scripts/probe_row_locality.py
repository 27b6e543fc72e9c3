"""Predict the MAC saving of spatially-sorted encode + per-tile chunk skip.

For the halo backend, the fwd/bwd one-hot fetch costs M x rows x fw MACs per
level no matter which rows a tile's samples touch. If samples are sorted by
a spatial Morton key, each kernel tile (1024 samples) should touch few
distinct block rows per level. This script marches real rays on the bench
scene after a short training run, sorts the packed samples by Morton key,
and reports the fraction of (tile, level) row-chunks that would survive a
`pl.when(chunk_used)` skip — i.e. the predicted MXU MAC fraction vs today.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def morton3d_np(c):
    """[N,3] uint32 coords (<=10 bits) -> 30-bit Morton, numpy."""
    def part(x):
        x = x.astype(np.uint64)
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x
    return (part(c[:, 0]) << 2) | (part(c[:, 1]) << 1) | part(c[:, 2])


def main():
    from seal3d_tpu.data.rays import get_rays
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.ops import raymarch as rm
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

    n, k = 4096, 48
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=12, h=256, w=256, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15, grid_backend="halo",
                     gridtype="wrap")
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=k, num_candidates=256, min_near=0.05,
                         flat_frac=0.375, coarse_steps=64)
    tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=n, random_bg=False)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    tr.train(steps=256, silent=True, blocked=True)

    key = jax.random.PRNGKey(7)
    rays = get_rays(key, ds.poses[0], jnp.asarray(ds.intrinsics), ds.h, ds.w, n)
    budget = max(int(round(n * k * opts.flat_frac / 128)) * 128, 128)
    mf = rm.march_rays_flat(
        rays["rays_o"], rays["rays_d"], tr.state.occ.bitfield,
        bound=opts.bound, cascades=1, dt_gamma=0.0, max_steps=512, k=k,
        budget=budget, num_candidates=256, min_near=0.05,
        occ_stride=4, coarse_steps=64)
    x = np.asarray(mf.xyzs)
    valid = np.asarray(mf.valid)
    print(f"M={budget} valid={valid.mean():.3f}")
    # normalize to [0,1] like the encoder input
    u = np.clip((x / opts.bound) * 0.5 + 0.5, 0.0, 1.0 - 1e-6)

    period, nb = 32, 8
    cfg = fcfg.grid
    tile = 1024
    n_tiles = budget // tile

    for sort_bits, label in ((0, "ray order (today)"), (6, "sorted @64^3"),
                             (8, "sorted @256^3")):
        if sort_bits:
            c = np.minimum((u * (1 << sort_bits)).astype(np.uint32),
                           (1 << sort_bits) - 1)
            key_m = morton3d_np(c)
            # invalid samples sink to the end, like the packed tail
            key_m = np.where(valid, key_m, np.uint64(1) << 62)
            order = np.argsort(key_m, kind="stable")
        else:
            order = np.arange(budget)
        us = u[order]
        vs = valid[order]
        for chunk_rows in (128, 64, 32):
            n_chunks = 512 // chunk_rows
            used_frac = []
            for resolution, _off, _n, _uh, scale in cfg.level_params:
                pos = np.clip(us * scale + 0.5, 0, resolution - 1)
                pw = pos.astype(np.int32) & (period - 1)
                b = pw >> 2
                # morton row order within the block grid
                row = np.asarray(morton3d_np(b.astype(np.uint32)),
                                 np.int64)
                chunk = (row // chunk_rows).reshape(n_tiles, tile)
                v2 = vs.reshape(n_tiles, tile)
                used = 0
                for t in range(n_tiles):
                    ch = chunk[t][v2[t]]
                    used += len(np.unique(ch))
                used_frac.append(used / (n_tiles * n_chunks))
            print(f"  {label:18s} chunk={chunk_rows:3d}: "
                  f"mean used-chunk frac {np.mean(used_frac):.3f}  "
                  f"per-level {[f'{f:.2f}' for f in used_frac]}")


if __name__ == "__main__":
    main()
