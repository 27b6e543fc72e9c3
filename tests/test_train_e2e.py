"""End-to-end: NGP field + dense renderer + Trainer fit a synthetic scene.

CPU-sized smoke of the full vertical slice (SURVEY.md §7 step 3): loss must
drop and PSNR must beat the untrained baseline. The occupancy fast path gets
its own parity test in test_render_paths.py; the TPU bench exercises it at
full size.
"""

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.data.synthetic import SyntheticScene
from seal3d_tpu.models import ngp
from seal3d_tpu.models.ngp import NGPConfig
from seal3d_tpu.render.renderer import RenderOptions
from seal3d_tpu.train.trainer import TrainConfig, Trainer


def _tiny_setup(tmp_path=None):
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=6, h=48, w=48, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15)
    opts = RenderOptions(bound=1.0, num_steps=48, upsample_steps=0, min_near=0.05)
    tcfg = TrainConfig(lr=1e-2, max_steps=200, num_rays=256, eval_chunk=512,
                       random_bg=False,
                       workspace=str(tmp_path) if tmp_path else None)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, use_dense=True,
                 key=jax.random.PRNGKey(0))
    return scene, ds, tr


def test_train_improves_psnr(tmp_path):
    scene, ds, tr = _tiny_setup(tmp_path)
    tr.init_state()
    psnr0 = tr.evaluate(max_views=2)
    m = tr.train(steps=150, silent=True)
    psnr1 = tr.evaluate(max_views=2)
    print(f"psnr {psnr0:.2f} -> {psnr1:.2f}")
    assert np.isfinite(m["loss"])
    assert psnr1 > psnr0 + 2.0, (psnr0, psnr1)

    # checkpoint round trip
    p = tr.save_checkpoint()
    step_before = int(tr.state.step)
    tr.init_state()
    tr.load_checkpoint(p)
    assert int(tr.state.step) == step_before
    psnr2 = tr.evaluate(max_views=1)
    assert psnr2 > psnr0
