"""Benchmark: NGP training + rendering throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): rays/sec for the lego-recipe NGP training
step (4096 rays/iter, occupancy fast path, grid updates every 16 steps
included) plus an 800x800 render throughput check. No NeRF dataset ships in
this image, so the scene is the procedural analytic stand-in
(seal3d_tpu/data/synthetic.py) at lego-like resolution.

vs_baseline: the reference recipe is 30k iters x 4096 rays in ~5 min on a
single NVIDIA GPU (readme.md:91 + update_logs) ~= 410k train rays/sec; we
report value / 410_000.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_TRAIN_RAYS_PER_SEC = 410_000.0


def main():
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

    scene = SyntheticScene()
    t0 = time.time()
    ds = scene.make_dataset(n_views=24, h=256, w=256, seed=0)
    t_data = time.time() - t0

    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=19)
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=1024,
                         budget_per_ray=48, num_candidates=1024, min_near=0.05)
    tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=4096,
                       eval_chunk=65536, eval_budget_per_ray=96,
                       random_bg=False)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()

    # Warmup: compiles + first grid updates + a few steps.
    tr.train(steps=64, silent=True, blocked=True)
    jax.block_until_ready(tr.state.params)

    # Timed training segment.
    n_timed = 512
    t0 = time.time()
    tr.train(steps=n_timed, silent=True, blocked=True, log_every=10**9)
    jax.block_until_ready(tr.state.params)
    t_train = time.time() - t0
    train_rays_per_sec = n_timed * tcfg.num_rays / t_train

    # Finish a short training run so the render/PSNR numbers are meaningful.
    tr.train(steps=1500, silent=True, blocked=True, log_every=10**9)
    psnr = tr.evaluate(max_views=2)

    # Timed 800x800 render (the reference's headline render size).
    h = w = 800
    fx = ds.intrinsics[0] * (w / ds.w)
    intr = np.array([fx, fx, w / 2, h / 2], np.float32)
    tr._intrinsics = jnp.asarray(intr)
    img, _ = tr.render_image(ds.poses[0], h, w)  # warmup/compile
    jax.block_until_ready(img)
    t0 = time.time()
    img, _ = tr.render_image(ds.poses[0], h, w)
    jax.block_until_ready(img)
    t_render = time.time() - t0
    render_rays_per_sec = h * w / t_render

    result = {
        "metric": "train_rays_per_sec",
        "value": round(train_rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(train_rays_per_sec / REF_TRAIN_RAYS_PER_SEC, 3),
        "extra": {
            "render_rays_per_sec_800x800": round(render_rays_per_sec),
            "psnr_synthetic_2k_steps": round(psnr, 2),
            "train_time_512_steps_s": round(t_train, 2),
            "dataset_gen_s": round(t_data, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
