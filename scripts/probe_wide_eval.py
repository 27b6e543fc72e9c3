"""A/B the wide (bound=2, cascades=2) arm's eval path: round-4 defaults
(eval_two_level=True -> ineligible fallback w/ coarse 32 + adaptive buckets)
vs the legacy fixed single-level eval, on ONE trained state — isolates
whether BENCH_r04's wide_bound2_psnr=14.9 is an eval-path artifact or the
trained field itself. Also times the train block to contextualize the
18.7k rays/s. Run on the real TPU."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

STATE = "/tmp/probe_wide_state.npz"


def main():
    from bench import _cached_dataset
    from seal3d_tpu.data.synthetic import WideSyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

    ds = _cached_dataset(WideSyntheticScene(), ".bench_dataset_wide.npz",
                         n_views=12, h=192, w=192)
    fcfg = NGPConfig(bound=2.0, log2_hashmap_size=15, grid_backend="halo",
                     gridtype="wrap")
    opts = RenderOptions(bound=2.0, dt_gamma=1.0 / 128, max_steps=512,
                         budget_per_ray=48, num_candidates=256,
                         min_near=0.05, coarse_steps=64)
    tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=4096,
                       eval_chunk=2**15, eval_budget_per_ray=64,
                       eval_flat_frac=0.5, random_bg=False,
                       adaptive_budget=True)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(2))
    tr.init_state()
    if os.path.exists(STATE):
        tr.load_checkpoint(STATE)
        print(f"loaded cached state (step={int(tr.state.step)})", flush=True)
    else:
        tr.train(steps=448, silent=True, blocked=True, log_every=10**9)
        jax.device_get(jnp.ravel(jax.tree.leaves(tr.state.params)[0])[0])
        tr.save_checkpoint(STATE)
        print("trained + cached 448-step state", flush=True)
        t0 = time.time()
        tr.train(steps=96, silent=True, blocked=True, log_every=10**9)
        jax.device_get(jnp.ravel(jax.tree.leaves(tr.state.params)[0])[0])
        dt = time.time() - t0
        print(f"sustained train: {96 * 4096 / dt:.0f} rays/s "
              f"({dt / 96 * 1e3:.1f} ms/step)", flush=True)

    arms = [
        ("r4 defaults (2l-gated + adaptive)", {}),
        ("legacy 1l fixed f50", dict(eval_two_level=False,
                                     eval_adaptive=False)),
        ("r4 defaults, eval coarse 64", dict(eval_coarse_steps=64)),
        ("dense grid eval", dict(eval_flat_frac=None)),
    ]
    for tag, kw in arms:
        tr.cfg = dataclasses.replace(tr.cfg, **kw)
        tr._build_steps(tr._loss_override)
        psnr = tr.evaluate(max_views=2)
        print(f"{tag:34s} psnr={psnr:6.2f}", flush=True)


if __name__ == "__main__":
    main()
