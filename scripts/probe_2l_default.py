"""Pick the DEFAULT two-level eval point (VERDICT r3 item 2): sweep
(tl_over, eval_flat_frac) at the fixed g4/pool64/kg-1 config and report BOTH
val-view PSNR (the regression guard) and the 800x800 pose-0 frame time (the
speed target). Run on the real TPU:

    python -u scripts/probe_2l_default.py

Trains 600 steps on first run; caches the state to /tmp/probe2l_state.npz
(shared with probe_2l_kg/probe_2l_refine).
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


def main():
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
                       eval_flat_frac=0.375, random_bg=False,
                       adaptive_budget=True)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    if os.path.exists(STATE):
        tr.load_checkpoint(STATE)
        print(f"loaded cached state (step={int(tr.state.step)})", flush=True)
    else:
        tr.train(steps=600, silent=True, blocked=True, log_every=10**9)
        jax.device_get(jnp.ravel(jax.tree.leaves(tr.state.params)[0])[0])
        tr.save_checkpoint(STATE)
        print("trained + cached 600-step state", flush=True)

    h = w = 800
    fx = float(ds.intrinsics[0]) * (w / ds.w)
    intr_800 = jnp.asarray(np.array([fx, fx, w / 2, h / 2], np.float32))
    intr_val = jnp.asarray(ds.intrinsics)

    base = dict(eval_two_level=True, eval_tl_kg=-1, eval_tl_group=4,
                eval_tl_pool=64)
    grid = [
        ("1l f375 (ref)", dict(eval_flat_frac=0.375, eval_two_level=False)),
        ("2l o2.0 f28", dict(eval_flat_frac=0.28, eval_tl_over=2.0, **base)),
        ("2l o2.5 f35", dict(eval_flat_frac=0.35, eval_tl_over=2.5, **base)),
        ("2l o2.5 f28", dict(eval_flat_frac=0.28, eval_tl_over=2.5, **base)),
        ("2l o3.0 f28", dict(eval_flat_frac=0.28, eval_tl_over=3.0, **base)),
        ("2l o2.5 f50", dict(eval_flat_frac=0.5, eval_tl_over=2.5, **base)),
        ("2l o2.0 f35", dict(eval_flat_frac=0.35, eval_tl_over=2.0, **base)),
    ]
    sel = sys.argv[1:]
    if sel:
        grid = [(t, kw) for t, kw in grid if any(s in t for s in sel)]
    for tag, kw in grid:
        tr.cfg = dataclasses.replace(tr.cfg, **kw)
        tr._build_steps(tr._loss_override)
        psnr = tr.evaluate(max_views=2)
        tr._intrinsics = intr_800
        img, _ = tr.render_image(ds.poses[0], h, w)  # compile
        jax.device_get(jnp.ravel(img)[0])
        t0 = time.time()
        img, _ = tr.render_image(ds.poses[0], h, w)
        jax.device_get(jnp.ravel(img)[0])
        dt = time.time() - t0
        tr._intrinsics = intr_val
        print(f"{tag:16s} psnr={psnr:6.2f}  800x800={dt:5.2f}s "
              f"({h*w/dt/1e3:6.0f}k rays/s)", flush=True)


if __name__ == "__main__":
    main()
