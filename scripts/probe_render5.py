"""Round-5 800x800 render attack: layout/bucket attribution at the default
two-level demand-adaptive eval point.

Arms (same cached 600-step state as probe_2l_default):
  morton      default: Z-order chunks + demand buckets + zero-demand skip
  scanline    eval_tile_chunks=False (round-4 behavior + group coverage)
  morton64k   Z-order with eval_chunk=2^16 (halved per-chunk fixed costs;
              one-time extra bucket compiles)
  1l-fixed    single-level fixed f375 (no adaptivity) — timing context

For the default arm also prints the per-chunk chosen buckets/skips and a
per-chunk timing sweep (synced per chunk — attribution, not throughput).

Run on the real TPU:  python -u scripts/probe_render5.py [arms...]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

STATE = "/tmp/probe2l_state.npz"


def _sync(x):
    jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[0])


def main():
    from seal3d_tpu.config import enable_compile_cache

    enable_compile_cache()
    from bench import _cached_dataset
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

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
    if os.path.exists(STATE):
        tr.load_checkpoint(STATE)
        print(f"loaded cached state (step={int(tr.state.step)})", flush=True)
    else:
        tr.train(steps=600, silent=True, blocked=True, log_every=10**9)
        _sync(tr.state.params)
        tr.save_checkpoint(STATE)
        print("trained + cached 600-step state", flush=True)

    h = w = 800
    fx = float(ds.intrinsics[0]) * (w / ds.w)
    intr_800 = jnp.asarray(np.array([fx, fx, w / 2, h / 2], np.float32))
    intr_val = jnp.asarray(ds.intrinsics)
    pose = ds.poses[0]

    arms = sys.argv[1:] or ["morton", "scanline", "morton64k", "1l-fixed", "1l-adaptive"]
    base_cfg = tr.cfg

    def run_arm(tag, cfg_kw, chunk=None):
        tr.cfg = dataclasses.replace(base_cfg, **cfg_kw)
        tr._build_steps(tr._loss_override)
        tr._intrinsics = intr_800
        img, _ = tr.render_image(pose, h, w, chunk=chunk)   # compile
        _sync(img)
        t0 = time.time()
        for _ in range(3):
            img, _ = tr.render_image(pose, h, w, chunk=chunk)
            _sync(img)
        dt = (time.time() - t0) / 3
        tr._intrinsics = intr_val
        psnr = tr.evaluate(max_views=2)
        print(f"{tag:12s} {dt:6.3f} s/frame   val-psnr {psnr:6.2f}",
              flush=True)
        return img

    if "morton" in arms:
        img = run_arm("morton", dict(eval_tile_chunks=True))
        # bucket/skip report for the default arm
        tr._intrinsics = intr_800
        from seal3d_tpu.data.rays import get_full_rays

        chunk = tr.cfg.eval_chunk
        sel, nv, inv = tr._chunk_layout(h, w, chunk)
        rays = get_full_rays(jnp.asarray(pose), tr._intrinsics, h, w)
        selj = jnp.asarray(np.clip(sel, 0, None))
        ok = jnp.asarray(sel >= 0)[..., None]
        ro_c = jnp.where(ok, rays["rays_o"][selj],
                         jnp.array([3.0, 0, 0], jnp.float32))
        rd_c = jnp.where(ok, rays["rays_d"][selj],
                         jnp.array([1.0, 0, 0], jnp.float32))
        cnts = np.asarray(tr._eval_demand_all(
            tr.state.occ.bitfield, ro_c, rd_c, tr.state.occ.occ_aabb,
            jnp.asarray(nv)))
        print(f"chunks={sel.shape[0]} fine-demand={cnts[:, 0].tolist()}",
              flush=True)
        print(f"group-demand={cnts[:, 1].tolist()}", flush=True)
        # per-chunk timing sweep (synced each — attribution only)
        bg = jnp.full((chunk, 3), 1.0, jnp.float32)
        ek = tr.cfg.eval_budget_per_ray
        for ci in range(sel.shape[0]):
            fine, grp = int(cnts[ci, 0]), int(cnts[ci, 1])
            pick = 1.0
            for bb in tr.cfg.eval_buckets:
                budget = max(int(round(chunk * ek * bb / 128)) * 128, 128)
                bg_ok = True
                if tr._eval_tl_uncapped:
                    budget_g = max(-(-int(round(
                        budget * tr._eval_tl_over))
                        // (tr._eval_tl_group * 16)) * 16, 16)
                    bg_ok = budget_g >= grp
                if budget >= fine * 1.02 and bg_ok:
                    pick = bb
                    break
            pick = min(pick, tr.cfg.eval_flat_frac)
            fn = tr._render_eval_at(pick)
            out = fn(tr.state.params, tr.state.occ.bitfield, ro_c[ci],
                     rd_c[ci], bg, jax.random.PRNGKey(0),
                     tr.state.occ.occ_aabb)
            _sync(out["image"])
            t0 = time.time()
            out = fn(tr.state.params, tr.state.occ.bitfield, ro_c[ci],
                     rd_c[ci], bg, jax.random.PRNGKey(0),
                     tr.state.occ.occ_aabb)
            _sync(out["image"])
            print(f"  chunk {ci:2d} fine={fine:7d} grp={grp:6d} "
                  f"bucket={pick:5.3f} {1e3 * (time.time() - t0):7.1f} ms",
                  flush=True)
        tr._intrinsics = intr_val

    if "scanline" in arms:
        run_arm("scanline", dict(eval_tile_chunks=False))
    if "morton64k" in arms:
        run_arm("morton64k", dict(eval_tile_chunks=True), chunk=2**16)
    if "1l-fixed" in arms:
        run_arm("1l-fixed", dict(eval_two_level=False, eval_adaptive=False,
                                 eval_flat_frac=0.375))
    if "1l-adaptive" in arms:
        # single-level march + demand buckets + Z-order + skip: the
        # stride-capped probe demand is exact, buckets lossless at k
        run_arm("1l-adaptive", dict(eval_two_level=False, eval_adaptive=True,
                                    eval_flat_frac=0.5))


if __name__ == "__main__":
    main()
