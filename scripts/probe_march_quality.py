"""Hard-scene quality A/B for march cost knobs (occ_stride, candidates).

occ_stride subsamples the occupancy bit test along the candidate ladder
(result repeated stride-wise); candidates sets the ladder length. Both cut
the march cost linearly but risk missing thin occupied cells — the hard
scene (struts + studs + high-frequency texture) is the sensitive case.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from seal3d_tpu.data.synthetic import HardSyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

    ds = HardSyntheticScene().make_dataset(n_views=12, h=192, w=192, seed=0)
    for tag, stride, cand, adap in (
            ("s4_c256", 4, 256, False),          # current -O point
            ("s4_c128_adaptive", 4, 128, True),  # span-adaptive, half ladder
            ("s4_c192_adaptive", 4, 192, True),
            ("s4_c256_adaptive", 4, 256, True)):
        fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15,
                         grid_backend="halo", gridtype="wrap")
        opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                             budget_per_ray=48, num_candidates=cand,
                             min_near=0.05, coarse_steps=64,
                             occ_stride=stride, span_adaptive=adap)
        tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=4096,
                           eval_chunk=2**14, eval_budget_per_ray=96,
                           random_bg=False, adaptive_budget=True)
        tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds,
                     key=jax.random.PRNGKey(0))
        tr.init_state()
        t0 = time.time()
        tr.train(steps=500, silent=True, blocked=True, log_every=10**9)
        jax.device_get(jnp.ravel(jax.tree.leaves(tr.state.params)[0])[0])
        wall = time.time() - t0
        psnr = tr.evaluate(max_views=2)
        print(f"{tag}: psnr={psnr:.2f} wall={wall:.1f}s", flush=True)
        del tr


if __name__ == "__main__":
    main()
