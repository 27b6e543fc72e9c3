"""Time ONLY the full jitted train step at several ray-batch sizes.

Question: is the recipe step (4096 rays) dominated by per-sample work
(throughput flat in batch) or by fixed overheads (throughput grows with
batch)? Decides whether a large-batch operating point is worth exposing.

Usage: python scripts/probe_batch_scale.py [--sizes 4096,8192,16384]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="2048,4096,8192,16384")
    ap.add_argument("--budget", type=int, default=48)
    ap.add_argument("--candidates", type=int, default=256)
    ap.add_argument("--log2t", type=int, default=15)
    ap.add_argument("--backend", type=str, default="halo")
    ap.add_argument("--flat", type=float, default=None,
                    help="fixed flat_frac; default (None) lets the adaptive "
                         "budget pick the per-size operating point like the "
                         "production trainer does (ADVICE r2)")
    ap.add_argument("--coarse", type=int, default=64)
    ap.add_argument("--two_level", action="store_true",
                    help="A/B: enable the two-level hierarchical march "
                         "(march_rays_flat_2level) in the train step")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=288,
                    help="settle steps before timing (the first ~250 steps "
                         "are the dense-grid early phase; bench.py's "
                         "sustained point is ~576 steps in — short warmups "
                         "under-report large batches, ADVICE r2)")
    args = ap.parse_args()

    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=12, h=256, w=256, seed=0)
    for n in [int(s) for s in args.sizes.split(",")]:
        fcfg = NGPConfig(bound=1.0, log2_hashmap_size=args.log2t,
                         grid_backend=args.backend,
                         gridtype="wrap" if args.backend == "halo" else "hash")
        opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                             budget_per_ray=args.budget,
                             num_candidates=args.candidates,
                             min_near=0.05, flat_frac=args.flat,
                             coarse_steps=args.coarse,
                             march_two_level=args.two_level)
        tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=n,
                           random_bg=False,
                           adaptive_budget=args.flat is None)
        tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds,
                     key=jax.random.PRNGKey(0))
        tr.init_state()
        # settle: past the dense early phase so occupancy (and with it the
        # adaptive flat bucket) is representative of the sustained rate
        tr.train(steps=args.warmup, silent=True, blocked=True)
        state = jax.tree.map(jnp.copy, tr.state)
        step = tr._train_step
        # fresh ray batch every timed step: repeating one key would train
        # repeatedly on the same rays and drift their sample counts (ADVICE)
        keys = jax.random.split(jax.random.PRNGKey(3), args.iters + 3)
        for i in range(3):
            state, _ = step(state, keys[args.iters + i])
        _sync(state)
        t0 = time.time()
        for i in range(args.iters):
            state, _ = step(state, keys[i])
        _sync(state)
        ms = (time.time() - t0) / args.iters * 1000.0
        flat_used = (args.flat if args.flat is not None
                     else tr.opts.flat_frac)
        print(f"rays={n:6d}  step={ms:7.2f} ms  {n / ms * 1000.0:9.0f} rays/s"
              f"  flat={flat_used}", flush=True)


if __name__ == "__main__":
    main()
