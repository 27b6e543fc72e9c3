"""Train-quality + throughput A/B for the two-level march in the TRAIN step.

Round-3 question: probe_batch_scale showed the two-level hierarchical march
(march_rays_flat_2level) cuts the 4096-ray train step 32.8 -> 24.2 ms
(169.6k rays/s) with the adaptive budget settling at flat 0.25 — but the
march changes which samples train (fine repack keeps every surviving ray's
samples; group budget can starve at tight flat_frac, the r3 render matrix's
one failure arm). This probe trains the bench recipe to 1216 steps under
three arms — single-level, two-level over=1.5, two-level over=2.0 — with
identical keys/data, and reports sustained step time + eval PSNR so the
train default is flipped only at quality parity.

Run on the real TPU: python -u scripts/probe_train_2l.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _sync(x):
    jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[0])


def run_arm(tag, two_level, over, steps=1216, timed=96, eval_cmp=False,
            group=8, pool=32, kg=0):
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
                         min_near=0.05, coarse_steps=64,
                         march_two_level=two_level, tl_over=over,
                         tl_group=group, tl_pool=pool, tl_kg=kg)
    # Round-5: eval at the FIXED default operating point (two-level kg=-1
    # g4/pool64 + demand-adaptive buckets capped at 0.5 — TrainConfig
    # defaults) so the arms differ ONLY in the TRAIN march (VERDICT r4
    # item 2: "A/B at the fixed eval point").
    tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=4096,
                       eval_chunk=2**15, eval_budget_per_ray=48,
                       eval_flat_frac=0.5, random_bg=False,
                       adaptive_budget=True)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    tr.train(steps=steps - timed, silent=True, blocked=True, log_every=10**9)
    _sync(tr.state.params)
    t0 = time.time()
    tr.train(steps=timed, silent=True, blocked=True, log_every=10**9)
    _sync(tr.state.params)
    dt = (time.time() - t0) / timed
    psnr = tr.evaluate(max_views=2)
    flat = tr.opts.flat_frac if tr.opts.flat_frac is not None else -1.0
    print(f"{tag:14s} step={dt * 1e3:7.2f} ms  {4096 / dt:9.0f} rays/s  "
          f"psnr={psnr:6.2f}  flat={flat:.3f}", flush=True)
    if eval_cmp:
        # Same trained state, round-2 eval operating point (flat 0.375,
        # single-level) — isolates what the NEW eval point costs in PSNR
        # (the r3 verify drive read 27.2 vs the r2 note's 28.3 at 600 steps;
        # jit is lazy so this only costs one render_eval compile).
        import dataclasses
        tr.cfg = dataclasses.replace(tr.cfg, eval_flat_frac=0.375,
                                     eval_two_level=False)
        tr._build_steps(getattr(tr, "_loss_override", None))
        psnr_old = tr.evaluate(max_views=2)
        print(f"{tag:14s} eval@f375-1l psnr={psnr_old:6.2f} "
              f"(vs f28-2l {psnr:6.2f})", flush=True)
    del tr


def main():
    import sys
    arms = sys.argv[1:] or ["single", "o15", "o20"]
    if "single" in arms:
        run_arm("single", False, 1.5, eval_cmp=True)
    if "o15" in arms:
        run_arm("2l over=1.5", True, 1.5, eval_cmp=True)
    if "o20" in arms:
        run_arm("2l over=2.0", True, 2.0, eval_cmp=True)
    # Round-4 arms informed by the eval-regression root cause: the per-ray
    # kept-group stride (kg) clumps TRAIN samples exactly like it clumped
    # eval samples, and the 32^3 pooled view admits ~2x the group demand.
    if "g4" in arms:
        run_arm("2l o2.0 g4/p64", True, 2.0, eval_cmp=True, group=4, pool=64)
    if "g4k" in arms:
        run_arm("2l o2.0 g4 kg-1", True, 2.0, eval_cmp=True, group=4,
                pool=64, kg=-1)


if __name__ == "__main__":
    main()
