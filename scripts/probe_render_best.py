"""Assemble + measure the fastest correct 800x800 render config (r3).

Builds on the piecewise numbers (/tmp/profile_render_r3b.log): single-level
full chunk 151.7 ms (march 92.4 / field 51.0 / scatter-composite 37.6); the
two-level march keeps every ray's samples in 423k slots (the saturated
single-level budget truncates trailing rays at 589k), so the eval budget can
shrink to the real demand. Variants assembled here, all against the DENSE
ORACLE image of the same trained field (the honest quality pin):

  base32     single-level march, scatter composite (round-2 shipping config)
  scan32     + scan composite
  2l-r8      two-level march + terminated rounds R=8 + scan + right-sized
             flat_frac + 2L-tuned round fracs
  2l-r8-64k  same at chunk=65536 (half the per-frame dispatches)

Run:  timeout 2400 python -u scripts/probe_render_best.py > /tmp/probe_best.log 2>/dev/null
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.data.rays import get_full_rays
from seal3d_tpu.data.synthetic import SyntheticScene
from seal3d_tpu.models import ngp
from seal3d_tpu.models.ngp import NGPConfig
from seal3d_tpu.render.renderer import (RenderOptions, render_rays,
                                        render_rays_dense)
from seal3d_tpu.train.trainer import TrainConfig, Trainer


def _sync(x):
    jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timeit(fn, *args, iters=8):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters * 1e3


def main():
    ds = SyntheticScene().make_dataset(n_views=4, h=128, w=128, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15, grid_backend="halo",
                     gridtype="wrap")
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=48, num_candidates=256,
                         min_near=0.05, coarse_steps=64)
    tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=4096,
                       eval_chunk=2**15, eval_budget_per_ray=48,
                       eval_flat_frac=0.375, random_bg=False,
                       adaptive_budget=True)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    tr.train(steps=192, silent=True, blocked=True)
    _sync(tr.state.params)
    print("trained 192 warm steps", flush=True)

    h = w = 800
    fx = float(ds.intrinsics[0]) * (w / ds.w)
    intr = jnp.asarray(np.array([fx, fx, w / 2, h / 2], np.float32))
    rays = get_full_rays(jnp.asarray(ds.poses[0]), intr, h, w)
    mid = (h * w) // 2

    params = tr.state.ema_params
    bitfield = tr.state.occ.bitfield
    aabb = tr._march_aabb(tr.state.occ.occ_aabb)
    field, cfg = tr.field, tr.fcfg

    # Dense-oracle image on the 32k eval chunk: the quality reference.
    chunk0 = 2**15
    ro0 = rays["rays_o"][mid - chunk0 // 2: mid + chunk0 // 2]
    rd0 = rays["rays_d"][mid - chunk0 // 2: mid + chunk0 // 2]
    bg0 = jnp.ones((chunk0, 3), jnp.float32)
    dense_opts = dataclasses.replace(opts, num_steps=256, upsample_steps=128)
    oracle = jax.jit(lambda p, o, d: render_rays_dense(
        p, field, cfg, o, d, dense_opts, bg_color=bg0))(params, ro0, rd0)
    _sync(oracle["image"])
    print("oracle rendered", flush=True)

    k = tcfg.eval_budget_per_ray
    fr8 = (0.3, 0.18, 0.12, 0.09, 0.07, 0.06, 0.05, 0.04)  # 2L-tuned, sum .91
    # Matrix 3: the f28 quality drop was GROUP-budget starvation (budget_g
    # is derived from flat_frac x tl_over; f28 @ over 1.5 = 82k groups vs
    # the 110k demand). Decouple: shrink the sample budget to real demand
    # (f28) while holding budget_g at the known-good 110k via over=2.0.
    common = dict(composite_seg="scan", march_two_level=True, coarse_steps=32)
    fr4 = (0.45, 0.25, 0.18, 0.12)  # sum 1.0 of the f28 budget
    variants = (
        ("2l f37 o1.5", chunk0, dict(flat_frac=0.375, tl_over=1.5, **common)),
        ("2l f28 o2.0", chunk0, dict(flat_frac=0.28, tl_over=2.0, **common)),
        ("2l f30 o1.9", chunk0, dict(flat_frac=0.30, tl_over=1.875, **common)),
        ("2l f28 o2 r4", chunk0, dict(flat_frac=0.28, tl_over=2.0,
                                      term_rounds=4, term_budget_fracs=fr4,
                                      **common)),
    )
    oimg = oracle["image"]
    for name, chunk, kw in variants:
        ro = rays["rays_o"][mid - chunk // 2: mid + chunk // 2]
        rd = rays["rays_d"][mid - chunk // 2: mid + chunk // 2]
        bg = jnp.ones((chunk, 3), jnp.float32)
        vopts = dataclasses.replace(opts, budget_per_ray=k, **kw)
        f = jax.jit(lambda p, bf, o, d, _o=vopts: render_rays(
            p, field, cfg, bf, o, d, _o, bg_color=bg, aabb=aabb))
        out = f(params, bitfield, ro, rd)
        img = out["image"][: chunk0] if chunk > chunk0 else out["image"]
        derr = jnp.abs(img - oimg[: img.shape[0]])
        psnr = float(-10 * jnp.log10(jnp.mean((img - oimg[: img.shape[0]])
                                              ** 2) + 1e-12))
        t = timeit(f, params, bitfield, ro, rd)
        n_chunks = -(-h * w // chunk)
        print(f"{name} {t:8.2f} ms x{n_chunks} = {t*n_chunks/1e3:5.2f} s/frame"
              f" ({h*w/(t*n_chunks/1e3)/1e3:4.0f}k rays/s)"
              f"  vs-oracle psnr {psnr:5.2f} mean|d| {float(derr.mean()):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
