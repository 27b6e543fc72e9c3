"""Isolate the broken -O eval operating point (round 3).

probe_train_2l measured the SAME trained state at 41.32 dB under the r2
eval point (flat 0.375, single-level) but 26.16 dB under the adopted r3
point (flat 0.28, two-level over=2.0) on 256^2 val views — while the
800x800 pose-0 matrix (probe_render_best.py) had shown parity. This probe
trains once (600 steps, bench recipe) and evaluates the same state under a
grid of eval configs to pinpoint which knob (sample budget, two-level
march, group over-provision, coarse 32) collapses small-view PSNR.

Run on the real TPU: python -u scripts/probe_eval_point.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


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
    tr.train(steps=600, silent=True, blocked=True, log_every=10**9)
    jax.device_get(jnp.ravel(jax.tree.leaves(tr.state.params)[0])[0])

    grid = [
        ("f375 1l", dict(eval_flat_frac=0.375, eval_two_level=False)),
        ("f375 2l o1.5", dict(eval_flat_frac=0.375, eval_two_level=True,
                              eval_tl_over=1.5)),
        ("f28  2l o2.0", dict(eval_flat_frac=0.28, eval_two_level=True,
                              eval_tl_over=2.0)),
        # The r3 regression isolator: the 2l eval branch also flips
        # coarse_steps 64->32; if THIS arm reads ~35.5 (parity with 1l),
        # the coarse-32 tighten is the culprit — set eval_coarse_steps=64
        # and re-enable eval_two_level (see PERFORMANCE.md r3 note).
        ("f375 2l c64", dict(eval_flat_frac=0.375, eval_two_level=True,
                             eval_tl_over=2.0, eval_coarse_steps=64)),
        # and the no-coarse control: plan-level tighten off entirely
        ("f375 2l c0", dict(eval_flat_frac=0.375, eval_two_level=True,
                            eval_tl_over=2.0, eval_coarse_steps=0)),
    ]
    sel = sys.argv[1:]
    if sel:
        grid = [(t, kw) for t, kw in grid if any(s in t for s in sel)]
    for tag, kw in grid:
        tr.cfg = dataclasses.replace(tr.cfg, **kw)
        tr._build_steps(tr._loss_override)
        psnr = tr.evaluate(max_views=2)
        print(f"{tag:14s} psnr={psnr:6.2f}", flush=True)


if __name__ == "__main__":
    main()
