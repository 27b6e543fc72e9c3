"""Micro-probe: march_rays_flat cost vs occ_stride, and threefry-vs-rbg
sampling cost (profile follow-up: march 12.4 ms and sample 3.5 ms are the
two largest non-encoder pieces of the 39.7 ms step)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n * 1000.0


def main():
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.ops import raymarch as rm
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

    n, k = 4096, 48
    budget = max(int(round(n * k * 0.375 / 128)) * 128, 128)
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=12, h=256, w=256, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15, grid_backend="halo",
                     gridtype="wrap")
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=k, num_candidates=256,
                         min_near=0.05, coarse_steps=64)
    tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=n, random_bg=False)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    tr.train(steps=64, silent=True, blocked=True)
    bitfield = tr.state.occ.bitfield

    key = jax.random.PRNGKey(7)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * 0.25 + jnp.array([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    for stride in (1, 2, 4, 8):
        f = jax.jit(lambda bf, ro, rd, s=stride: rm.march_rays_flat(
            ro, rd, bf, bound=opts.bound, cascades=opts.cascades,
            dt_gamma=opts.dt_gamma, max_steps=opts.max_steps, k=k,
            budget=budget, num_candidates=opts.num_candidates,
            min_near=opts.min_near, occ_stride=s,
            coarse_steps=opts.coarse_steps))
        ms = timeit(f, bitfield, rays_o, rays_d)
        out = f(bitfield, rays_o, rays_d)
        print(f"march_flat occ_stride={stride}: {ms:6.2f} ms "
              f"valid={float(out.valid.mean()):.3f}")

    # candidate count sweep (coarse-tightened ranges may not need 256)
    for cand in (128, 192, 256):
        f = jax.jit(lambda bf, ro, rd, c=cand: rm.march_rays_flat(
            ro, rd, bf, bound=opts.bound, cascades=opts.cascades,
            dt_gamma=opts.dt_gamma, max_steps=opts.max_steps, k=k,
            budget=budget, num_candidates=c,
            min_near=opts.min_near, occ_stride=2,
            coarse_steps=opts.coarse_steps))
        ms = timeit(f, bitfield, rays_o, rays_d)
        print(f"march_flat candidates={cand}: {ms:6.2f} ms")

    # sampling: threefry vs rbg
    from seal3d_tpu.data.rays import get_rays

    def sample(kk):
        kimg, kray = jax.random.split(kk, 2)
        img_idx = jax.random.randint(kimg, (), 0, tr._poses.shape[0])
        pose = tr._poses[img_idx]
        rays = get_rays(kray, pose, tr._intrinsics, ds.h, ds.w, n)
        img = tr._images[img_idx].reshape(ds.h * ds.w, -1).astype(jnp.float32)
        g = jnp.take(img, rays["inds"], axis=0)
        return rays["rays_o"], rays["rays_d"], g

    ms = timeit(jax.jit(sample), jax.random.PRNGKey(3))
    print(f"sample threefry: {ms:6.2f} ms")
    rbg = jax.random.key(3, impl="rbg")
    ms = timeit(jax.jit(sample), rbg)
    print(f"sample rbg:      {ms:6.2f} ms")


if __name__ == "__main__":
    main()
