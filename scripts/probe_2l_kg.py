"""Round-4 isolation of the two-level eval regression: the per-ray group
stride (group_plan kg).

Round 4's probe_eval_point run REFUTED the round-3 coarse-steps hypothesis
(c64 26.92 / c0 26.77 vs 35.56 single-level). The remaining knob that is
budget-independent — matching the 'EXACTLY 26.82 across all budget arms'
signature — is the per-ray kept-group cap kg = k//g = 6: foreground rays
cross ~20-30 dilated-occupied groups, so they get strided 4-6x, clumping
samples into g-runs with ~4g*dt_min gaps (vs the single-level path's
stride-3 candidate gaps). This probe evaluates ONE cached trained state
under kg arms to confirm and pick the fix.

Run on the real TPU: python -u scripts/probe_2l_kg.py
(trains 600 steps on first run, caches the state to /tmp/probe2l_state.npz)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

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

    g8 = dict(eval_tl_group=8, eval_tl_pool=32)
    g4 = dict(eval_tl_group=4, eval_tl_pool=64)
    grid = [
        ("1l", dict(eval_flat_frac=0.375, eval_two_level=False)),
        ("2l g8p32 kg6 (r3)", dict(eval_flat_frac=0.375,
                                   eval_two_level=True, eval_tl_over=2.0,
                                   eval_tl_kg=0, **g8)),
        ("2l g8p32 kg12", dict(eval_flat_frac=0.375, eval_two_level=True,
                               eval_tl_over=2.0, eval_tl_kg=12, **g8)),
        ("2l g8p32 kg-1", dict(eval_flat_frac=0.375,
                               eval_two_level=True, eval_tl_over=2.0,
                               eval_tl_kg=-1, **g8)),
        ("2l g8p32 kg-1 f28", dict(eval_flat_frac=0.28, eval_two_level=True,
                                   eval_tl_over=2.0, eval_tl_kg=-1, **g8)),
        ("2l g4p64 kg-1", dict(eval_flat_frac=0.375, eval_two_level=True,
                               eval_tl_over=2.0, eval_tl_kg=-1, **g4)),
        ("2l g4p64 kg-1 f28", dict(eval_flat_frac=0.28, eval_two_level=True,
                                   eval_tl_over=2.0, eval_tl_kg=-1, **g4)),
        ("2l g4p64 kg12", dict(eval_flat_frac=0.375, eval_two_level=True,
                               eval_tl_over=2.0, eval_tl_kg=12, **g4)),
    ]
    sel = sys.argv[1:]
    if sel:
        grid = [(t, kw) for t, kw in grid if any(s in t for s in sel)]
    import time
    for tag, kw in grid:
        tr.cfg = dataclasses.replace(tr.cfg, **kw)
        tr._build_steps(tr._loss_override)
        psnr = tr.evaluate(max_views=2)   # compiles
        t0 = time.time()
        tr.evaluate(max_views=2)          # timed (2 views @256^2 = 4 chunks)
        dt = time.time() - t0
        print(f"{tag:20s} psnr={psnr:6.2f}  eval2={dt:5.2f}s", flush=True)


if __name__ == "__main__":
    main()
