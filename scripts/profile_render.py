"""Per-piece attribution of the inference/render path at the bench eval point.

The 800x800 bench render runs eval_chunk=2^15 rays per dispatch with
budget_per_ray=48, flat_frac=0.375 (bench.py:122). This script times, on the
real TPU, each piece of that chunk in isolation (jitted, synced via
device_get — see scripts/profile_step.py for why block_until_ready is not
enough over the tunnel):

  march    march_rays_flat at [chunk] rays (ladder + occupancy + pack sort)
  field    field.apply at [budget] packed samples (encode + SH + MLPs)
  comp     composite_flat at [budget]
  full     the whole render_rays chunk fn (= what render_image dispatches)

Run:  timeout 590 python -u scripts/profile_render.py 2>/dev/null
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
from seal3d_tpu.render.renderer import RenderOptions, render_rays
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
    import dataclasses

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
    tr.train(steps=192, silent=True, blocked=True)  # grid realistically sparse
    _sync(tr.state.params)
    print("trained 192 warm steps", flush=True)

    chunk = tcfg.eval_chunk
    k = tcfg.eval_budget_per_ray
    frac = tcfg.eval_flat_frac
    budget = max(int(round(chunk * k * frac / 128)) * 128, 128)
    eval_opts = dataclasses.replace(opts, budget_per_ray=k, flat_frac=frac,
                                    composite_seg="scan")

    # A realistic eval chunk of rays from the first pose at 800x800 intrinsics
    from seal3d_tpu.data.rays import get_full_rays
    h = w = 800
    fx = float(ds.intrinsics[0]) * (w / ds.w)
    intr = jnp.asarray(np.array([fx, fx, w / 2, h / 2], np.float32))
    rays = get_full_rays(jnp.asarray(ds.poses[0]), intr, h, w)
    mid = (h * w) // 2
    ro = rays["rays_o"][mid - chunk // 2 : mid + chunk // 2]
    rd = rays["rays_d"][mid - chunk // 2 : mid + chunk // 2]

    params = tr.state.ema_params
    bitfield = tr.state.occ.bitfield
    aabb = tr._march_aabb(tr.state.occ.occ_aabb)
    field, cfg = tr.field, tr.fcfg

    from seal3d_tpu.ops.composite import composite_flat
    from seal3d_tpu.ops.raymarch import march_rays_flat

    march_j = jax.jit(lambda bf, o, d: march_rays_flat(
        o, d, bf, bound=eval_opts.bound, cascades=eval_opts.cascades,
        dt_gamma=0.0, max_steps=eval_opts.max_steps, k=k, budget=budget,
        num_candidates=eval_opts.num_candidates, min_near=eval_opts.min_near,
        aabb=aabb, occ_stride=eval_opts.occ_stride,
        coarse_steps=eval_opts.coarse_steps))
    mf = march_j(bitfield, ro, rd)
    _sync(mf.xyzs)
    n_valid = int(mf.valid.sum())
    print(f"chunk={chunk} budget={budget} valid={n_valid} "
          f"({n_valid/budget:.2f} of budget)", flush=True)

    t_march = timeit(march_j, bitfield, ro, rd)

    field_j = jax.jit(lambda p, x, d, v: field.apply(p, cfg, x, d, valid=v))
    t_field = timeit(field_j, params, mf.xyzs, mf.dirs, mf.valid)

    sigma, rgb = field_j(params, mf.xyzs, mf.dirs, mf.valid)
    comp_j = jax.jit(lambda s, r, m: composite_flat(
        s, r, m.deltas, m.ts, m.ray_id, m.offsets, m.valid, chunk))
    t_comp = timeit(comp_j, sigma, rgb, mf)

    bg = jnp.ones((chunk, 3), jnp.float32)
    full_j = jax.jit(lambda p, bf, o, d: render_rays(
        p, field, cfg, bf, o, d, eval_opts, bg_color=bg, aabb=aabb))
    t_full = timeit(full_j, params, bitfield, ro, rd)

    n_chunks = -(-h * w // chunk)
    print(f"march  {t_march:8.2f} ms", flush=True)
    print(f"field  {t_field:8.2f} ms", flush=True)
    print(f"comp   {t_comp:8.2f} ms", flush=True)
    print(f"full   {t_full:8.2f} ms  (x{n_chunks} chunks = "
          f"{t_full*n_chunks/1e3:.2f} s/frame, "
          f"{h*w/(t_full*n_chunks/1e3)/1e3:.0f}k rays/s)", flush=True)

    # Two-level march variants (march_rays_flat_2level / rounds-2level):
    # march in isolation + full chunk + terminated rounds.
    from seal3d_tpu.ops.raymarch import march_rays_flat_2level
    # Profile at the round-4 default machinery (g4/pool64/kg-1; the
    # regression-fixed point) AND split level 1 (group_plan) from the
    # repack+expand, so the g4 sort cost is attributable.
    from seal3d_tpu.ops.raymarch import group_plan
    tl_g, tl_kg, tl_pool, tl_over = 4, -1, 64, 2.0
    gp_j = jax.jit(lambda bf, o, d: group_plan(
        o, d, bf, bound=eval_opts.bound, cascades=eval_opts.cascades,
        max_steps=eval_opts.max_steps, k=k,
        num_candidates=eval_opts.num_candidates, group=tl_g,
        min_near=eval_opts.min_near, aabb=aabb,
        coarse_steps=eval_opts.coarse_steps, kg=tl_kg, pool=tl_pool))
    gp = gp_j(bitfield, ro, rd)
    _sync(gp.keep)
    print(f"group_plan g{tl_g}/p{tl_pool}  kept={int(gp.keep.sum())}  "
          f"{timeit(gp_j, bitfield, ro, rd):8.2f} ms", flush=True)

    tl_j = jax.jit(lambda bf, o, d: march_rays_flat_2level(
        o, d, bf, bound=eval_opts.bound, cascades=eval_opts.cascades,
        max_steps=eval_opts.max_steps, k=k, budget=budget,
        num_candidates=eval_opts.num_candidates, min_near=eval_opts.min_near,
        aabb=aabb, occ_stride=eval_opts.occ_stride,
        coarse_steps=eval_opts.coarse_steps, group=tl_g, over=tl_over,
        kg=tl_kg, pool=tl_pool))
    mf2 = tl_j(bitfield, ro, rd)
    _sync(mf2.xyzs)
    print(f"march 2level  valid={int(mf2.valid.sum())}  "
          f"{timeit(tl_j, bitfield, ro, rd):8.2f} ms", flush=True)
    tl_opts = dataclasses.replace(eval_opts, march_two_level=True,
                                  tl_group=tl_g, tl_kg=tl_kg,
                                  tl_pool=tl_pool, tl_over=tl_over)
    tl_full_j = jax.jit(lambda p, bf, o, d: render_rays(
        p, field, cfg, bf, o, d, tl_opts, bg_color=bg, aabb=aabb))
    out2 = tl_full_j(params, bitfield, ro, rd)
    ref = full_j(params, bitfield, ro, rd)
    d2 = float(jnp.abs(out2["image"] - ref["image"]).mean())
    t2 = timeit(tl_full_j, params, bitfield, ro, rd)
    print(f"full 2level   {t2:8.2f} ms  mean|dimg|={d2:.4f} "
          f"({t_full*n_chunks/1e3:.2f} -> {t2*n_chunks/1e3:.2f} s/frame)",
          flush=True)

    # Transmittance-terminated rounds variants: time the full chunk fn and
    # report real-sample counts so the budget schedule can be sized.
    for rounds, fracs, tl in (
            (8, (0.3, 0.15, 0.1, 0.07, 0.05, 0.04, 0.03, 0.02), False),
            (4, (0.45, 0.2, 0.1, 0.05), True),
            (8, (0.3, 0.15, 0.1, 0.07, 0.05, 0.04, 0.03, 0.02), True)):
        ropts = dataclasses.replace(eval_opts, term_rounds=rounds,
                                    term_budget_fracs=fracs,
                                    march_two_level=tl, tl_group=8)
        rj = jax.jit(lambda p, bf, o, d, _o=ropts: render_rays(
            p, field, cfg, bf, o, d, _o, bg_color=bg, aabb=aabb))
        out = rj(params, bitfield, ro, rd)
        ns = int(out["num_samples"])
        t_r = timeit(rj, params, bitfield, ro, rd)
        # image delta vs the single-round render at the same point
        ref = full_j(params, bitfield, ro, rd)
        d_img = float(jnp.abs(out["image"] - ref["image"]).mean())
        tag = ("2L" if tl else "1L") + " tight"
        print(f"rounds R={rounds} {tag:8s} {t_r:8.2f} ms  samples={ns} "
              f"({ns/n_valid:.2f}x single) mean|dimg|={d_img:.4f} "
              f"({t_full*n_chunks/1e3:.2f} -> {t_r*n_chunks/1e3:.2f} s/frame)",
              flush=True)


if __name__ == "__main__":
    main()
