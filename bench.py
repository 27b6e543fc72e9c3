"""Benchmark: NGP training + rendering throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): rays/sec of the lego-recipe NGP training
step (4096 rays/iter, occupancy fast path with the fused Pallas hash-encode
kernel, grid updates every 16 steps included) plus an 800x800 render
throughput check and the PSNR after a short training run. No NeRF dataset
ships in this image, so the scene is the procedural analytic stand-in
(seal3d_tpu/data/synthetic.py) at lego-like sparsity.

vs_baseline: the reference recipe trains 30k iters x 4096 rays in ~5 min on
a single NVIDIA GPU (readme.md:91, assets/update_logs.md) ~= 410k train
rays/sec; we report value / 410_000.
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

    import os

    scene = SyntheticScene()
    t0 = time.time()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_dataset.npz")
    if os.path.exists(cache):
        from seal3d_tpu.data.provider import NeRFDataset

        z = np.load(cache)
        ds = NeRFDataset(poses=z["poses"], images=z["images"],
                         intrinsics=z["intrinsics"], h=int(z["h"]), w=int(z["w"]))
    else:
        ds = scene.make_dataset(n_views=12, h=256, w=256, seed=0)
        np.savez_compressed(cache, poses=ds.poses, images=ds.images,
                            intrinsics=ds.intrinsics, h=ds.h, w=ds.w)
    t_data = time.time() - t0

    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=14, grid_backend="pallas")
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=48, num_candidates=512,
                         min_near=0.05)
    tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=4096,
                       eval_chunk=2**14, eval_budget_per_ray=64,
                       random_bg=False)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()

    # Warmup: compiles + first grid updates + a few steps.
    tr.train(steps=48, silent=True, blocked=True)
    jax.device_get(tr.state.step)

    # Timed training segment (includes the every-16-step grid refresh).
    n_timed = 128
    t0 = time.time()
    tr.train(steps=n_timed, silent=True, blocked=True, log_every=10**9)
    jax.device_get(tr.state.step)
    t_train = time.time() - t0
    train_rays_per_sec = n_timed * tcfg.num_rays / t_train

    # Short convergence run so the PSNR/render numbers are meaningful.
    t0 = time.time()
    tr.train(steps=400, silent=True, blocked=True, log_every=10**9)
    jax.device_get(tr.state.step)
    t_converge = time.time() - t0
    psnr = tr.evaluate(max_views=1)

    # Max-throughput operating point (bigger ray batches, tighter budget).
    tcfg_big = TrainConfig(lr=1e-2, max_steps=30000, num_rays=16384,
                           random_bg=False)
    opts_big = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                             budget_per_ray=32, num_candidates=512,
                             min_near=0.05)
    tr_big = Trainer(ngp, fcfg, opts_big, tcfg_big, dataset=ds,
                     key=jax.random.PRNGKey(1))
    tr_big.init_state()
    tr_big.train(steps=32, silent=True, blocked=True)
    jax.device_get(tr_big.state.step)
    t0 = time.time()
    tr_big.train(steps=96, silent=True, blocked=True, log_every=10**9)
    jax.device_get(tr_big.state.step)
    big_rays_per_sec = 96 * tcfg_big.num_rays / (time.time() - t0)
    del tr_big

    # Timed 800x800 render (the reference's headline render size).
    h = w = 800
    fx = float(ds.intrinsics[0]) * (w / ds.w)
    tr._intrinsics = jnp.asarray(np.array([fx, fx, w / 2, h / 2], np.float32))
    img, _ = tr.render_image(ds.poses[0], h, w)  # warmup/compile
    jax.device_get(img)
    t0 = time.time()
    img, _ = tr.render_image(ds.poses[0], h, w)
    jax.device_get(img)
    t_render = time.time() - t0
    render_rays_per_sec = h * w / t_render

    result = {
        "metric": "train_rays_per_sec",
        "value": round(train_rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(train_rays_per_sec / REF_TRAIN_RAYS_PER_SEC, 4),
        "extra": {
            "max_throughput_rays_per_sec_16k_batch": round(big_rays_per_sec),
            "render_rays_per_sec_800x800": round(render_rays_per_sec),
            "psnr_synthetic_576_steps": round(psnr, 2),
            "train_time_128_steps_s": round(t_train, 2),
            "converge_400_steps_s": round(t_converge, 1),
            "dataset_gen_s": round(t_data, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
