"""A/B the packed-selection backend on the flat march path: 'sort' (single
lax.sort over N*C keys) vs 'gather' (rank inversion: cumsum + searchsorted +
one [budget, C] row gather + lane argmax). Identical packing (parity test in
test_render_paths.py); this measures wall time at the recipe point, both for
the march alone and inside the full train step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.data.synthetic import SyntheticScene
from seal3d_tpu.models import ngp
from seal3d_tpu.models.ngp import NGPConfig
from seal3d_tpu.ops.raymarch import march_rays_flat
from seal3d_tpu.render.renderer import RenderOptions
from seal3d_tpu.train.trainer import TrainConfig, Trainer


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.time() - t0) / iters * 1000


def main():
    n, c, k = 4096, 256, 48
    budget = int(n * k * 0.375 / 128) * 128

    # realistic occupancy: train a short NGP run and take its bitfield
    ds = SyntheticScene().make_dataset(n_views=8, h=128, w=128, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15, grid_backend="halo",
                     gridtype="wrap")
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=k, num_candidates=c, min_near=0.05,
                         coarse_steps=64)
    tcfg = TrainConfig(lr=1e-2, num_rays=n, random_bg=False,
                       adaptive_budget=False)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    tr.train(steps=128, silent=True, blocked=True, log_every=10**9)
    bitfield = tr.state.occ.bitfield
    occ_aabb = tr.state.occ.occ_aabb

    from seal3d_tpu.data.rays import get_rays

    rays = get_rays(jax.random.PRNGKey(1), jnp.asarray(ds.poses[0]),
                    jnp.asarray(ds.intrinsics), ds.h, ds.w, n)
    ro, rd = rays["rays_o"], rays["rays_d"]
    aabb = tr._march_aabb(occ_aabb)

    for sel in ("sort", "gather"):
        f = jax.jit(lambda ro, rd, bf: march_rays_flat(
            ro, rd, bf, bound=1.0, cascades=1, dt_gamma=0.0, max_steps=512,
            k=k, budget=budget, num_candidates=c, min_near=0.05, aabb=aabb,
            occ_stride=4, coarse_steps=64, select=sel))
        ms = timeit(f, ro, rd, bitfield)
        print(f"march[{sel}]: {ms:.2f} ms")

    # full train step at each selection
    import dataclasses

    for sel in ("sort", "gather"):
        tr.opts = dataclasses.replace(tr.opts, flat_frac=0.375,
                                      flat_select=sel)
        tr._build_steps()
        tr.state, _ = tr._train_step(tr.state, jax.random.PRNGKey(2))
        jax.device_get(tr.state.step)
        t0 = time.time()
        for i in range(30):
            tr.state, _ = tr._train_step(tr.state, jax.random.PRNGKey(3 + i))
        jax.device_get(tr.state.step)
        print(f"train_step[{sel}]: {(time.time() - t0) / 30 * 1000:.2f} ms")


if __name__ == "__main__":
    main()
