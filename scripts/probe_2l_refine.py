"""Refine the g4/pool64 two-level eval point: close the last ~0.36 dB vs
single-level (probe_2l_kg round-4 results) by sweeping group over-provision
and the sample budget. Run on the real TPU."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

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
    assert os.path.exists(STATE), "run probe_2l_kg first"
    tr.load_checkpoint(STATE)
    print(f"loaded cached state (step={int(tr.state.step)})", flush=True)

    base = dict(eval_two_level=True, eval_tl_kg=-1, eval_tl_group=4,
                eval_tl_pool=64)
    grid = [
        ("1l f375 (ref)", dict(eval_flat_frac=0.375, eval_two_level=False)),
        ("2l o3.0 f375", dict(eval_flat_frac=0.375, eval_tl_over=3.0, **base)),
        ("2l o2.0 f50", dict(eval_flat_frac=0.5, eval_tl_over=2.0, **base)),
        ("2l o2.5 f50", dict(eval_flat_frac=0.5, eval_tl_over=2.5, **base)),
        ("2l o2.0 f375 c64", dict(eval_flat_frac=0.375, eval_tl_over=2.0,
                                  eval_coarse_steps=64, **base)),
    ]
    sel = sys.argv[1:]
    if sel:
        grid = [(t, kw) for t, kw in grid if any(s in t for s in sel)]
    for tag, kw in grid:
        tr.cfg = dataclasses.replace(tr.cfg, **kw)
        tr._build_steps(tr._loss_override)
        psnr = tr.evaluate(max_views=2)
        t0 = time.time()
        tr.evaluate(max_views=2)
        dt = time.time() - t0
        print(f"{tag:18s} psnr={psnr:6.2f}  eval2={dt:5.2f}s", flush=True)


if __name__ == "__main__":
    main()
