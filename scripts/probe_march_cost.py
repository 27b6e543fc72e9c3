"""Attribution of the per-chunk eval-render FLOOR (round 5): at 800x800 a
zero-demand bucket-0.0625 chunk still costs ~85-130 ms — where? Times, on
one 32k-ray background chunk and one dense chunk at the default 2l point:
  nearfar      near_far_from_aabb
  coarse       + coarse_tighten (32 steps)
  plan         group_plan (pooled-dilated test + stride)
  pooled       pooled_dilated table build alone
  march        full march_rays_flat_2level at the bucket's budget
  field        field.apply at the bucket's budget
  render       the whole render_rays chunk
Run on the real TPU: python -u scripts/probe_march_cost.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def main():
    from seal3d_tpu.config import enable_compile_cache
    enable_compile_cache()
    import jax, jax.numpy as jnp
    import numpy as np
    from functools import partial
    from bench import _cached_dataset
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions, render_rays
    from seal3d_tpu.train.trainer import TrainConfig, Trainer
    from seal3d_tpu.data.rays import get_full_rays
    from seal3d_tpu.ops import raymarch as rm

    def sync(x):
        jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[0])

    def timeit(fn, *args, iters=10):
        out = fn(*args); sync(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.time() - t0) / iters * 1e3

    ds = _cached_dataset(SyntheticScene(), ".bench_dataset.npz")
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15, grid_backend="halo",
                     gridtype="wrap")
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=48, num_candidates=256,
                         min_near=0.05, coarse_steps=64)
    tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=4096,
                       eval_chunk=2**15, eval_budget_per_ray=48,
                       eval_flat_frac=0.5, random_bg=False,
                       adaptive_budget=True)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    tr.load_checkpoint("/tmp/probe2l_state.npz")
    bitfield = tr.state.occ.bitfield
    params = tr.state.ema_params

    h = w = 800
    fx = float(ds.intrinsics[0]) * (w / ds.w)
    tr._intrinsics = jnp.asarray(np.array([fx, fx, w/2, h/2], np.float32))
    chunk = 2**15
    sel, nv, inv = tr._chunk_layout(h, w, chunk)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), tr._intrinsics, h, w)
    selj = jnp.asarray(np.clip(sel, 0, None))
    ok = jnp.asarray(sel >= 0)[..., None]
    ro_c = jnp.where(ok, rays["rays_o"][selj], jnp.array([3.0,0,0], jnp.float32))
    rd_c = jnp.where(ok, rays["rays_d"][selj], jnp.array([1.0,0,0], jnp.float32))

    import dataclasses
    aabb = jnp.array(opts.aabb, jnp.float32)
    for tag, ci, frac in (("bg-chunk", 18, 0.0625), ("dense-chunk", 7, 0.5)):
        ro, rd = ro_c[ci], rd_c[ci]
        budget = max(int(round(chunk*48*frac/128))*128, 128)
        budget_g = max(-(-int(round(budget*2.5)) // (4*16))*16, 16)
        print(f"== {tag} (bucket {frac}, budget {budget}, budget_g {budget_g})",
              flush=True)
        t = timeit(jax.jit(lambda o,d: rm.near_far_from_aabb(o,d,aabb,0.05)), ro, rd)
        print(f"  nearfar          {t:7.2f} ms", flush=True)
        t = timeit(jax.jit(lambda o,d,b: rm.coarse_tighten(
            o, d, b, *rm.near_far_from_aabb(o,d,aabb,0.05), 1, 1.0,
            n_steps=32, max_steps=512)), ro, rd, bitfield)
        print(f"  +coarse32        {t:7.2f} ms", flush=True)
        t = timeit(jax.jit(lambda o,d,b: rm.group_plan(
            o, d, b, bound=1.0, cascades=1, max_steps=512, k=48,
            num_candidates=256, group=4, min_near=0.05, aabb=aabb,
            coarse_steps=32, kg=-1, pool=64).keep), ro, rd, bitfield)
        print(f"  group_plan       {t:7.2f} ms", flush=True)
        t = timeit(jax.jit(lambda b: rm.pooled_dilated(b, 1, 64)), bitfield)
        print(f"  pooled_dilated   {t:7.2f} ms", flush=True)
        march = jax.jit(lambda o,d,b: rm.march_rays_flat_2level(
            o, d, b, bound=1.0, cascades=1, max_steps=512, k=48,
            budget=budget, num_candidates=256, min_near=0.05, aabb=aabb,
            occ_stride=4, coarse_steps=32, group=4, over=2.5, kg=-1,
            pool=64).xyzs)
        t = timeit(march, ro, rd, bitfield)
        print(f"  march_2l         {t:7.2f} ms", flush=True)
        mf = jax.jit(lambda o,d,b: rm.march_rays_flat_2level(
            o, d, b, bound=1.0, cascades=1, max_steps=512, k=48,
            budget=budget, num_candidates=256, min_near=0.05, aabb=aabb,
            occ_stride=4, coarse_steps=32, group=4, over=2.5, kg=-1,
            pool=64))(ro, rd, bitfield)
        fld = jax.jit(lambda p, x, d, v: ngp.apply(p, fcfg, x, d, valid=v))
        t = timeit(fld, params, mf.xyzs, mf.dirs, mf.valid)
        print(f"  field@{budget:7d}  {t:7.2f} ms", flush=True)
        eopts = dataclasses.replace(opts, flat_frac=frac, march_two_level=True,
                                    tl_over=2.5, tl_kg=-1, tl_group=4,
                                    tl_pool=64, coarse_steps=32,
                                    composite_seg="scan",
                                    budget_per_ray=48)
        rfn = jax.jit(lambda p,b,o,d: render_rays(p, ngp, fcfg, b, o, d,
                                                  eopts, bg_color=1.0,
                                                  aabb=aabb)["image"])
        t = timeit(rfn, params, bitfield, ro, rd)
        print(f"  render           {t:7.2f} ms", flush=True)
        t = timeit(tr._eval_demand, bitfield, ro, rd)
        print(f"  demand_probe     {t:7.2f} ms", flush=True)

if __name__ == "__main__":
    main()
