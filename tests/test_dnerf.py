"""D-NeRF tests: variant shapes, time-sliced occupancy, small dynamic fit."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.models import dnerf
from seal3d_tpu.models.dnerf import DNeRFConfig


def _xdt(n=16):
    kx, kd = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(kx, (n, 3), minval=-0.8, maxval=0.8)
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return x, d, jnp.asarray(0.3)


def test_variants_apply():
    for variant in ("deform", "basis", "hyper"):
        cfg = DNeRFConfig(variant=variant, log2_hashmap_size=12)
        params = dnerf.init(jax.random.PRNGKey(1), cfg)
        x, d, t = _xdt()
        sigma, rgb, warped = dnerf.apply(params, cfg, x, d, t)
        assert sigma.shape == (16,) and rgb.shape == (16, 3), variant
        if variant == "deform":
            assert warped is not None
            # dx == 0 at init (zero-init output layer: training must start
            # as a static canonical field)
            np.testing.assert_allclose(np.asarray(warped), np.asarray(x),
                                       atol=1e-7)
            # time dependence once the warp head is non-zero
            params["deform_net"][-1]["w"] = 0.01 * jax.random.normal(
                jax.random.PRNGKey(2), params["deform_net"][-1]["w"].shape)
            _, _, w1 = dnerf.apply(params, cfg, x, d, t)
            _, _, w2 = dnerf.apply(params, cfg, x, d, jnp.asarray(0.9))
            assert float(jnp.abs(w1 - w2).max()) > 1e-5  # warp moved with t


def test_lr_net_scale_transform():
    """lr_net_scale multiplies MLP updates only — the functional form of the
    reference's per-group LRs (dnerf/network.py:255: encoders lr, nets
    lr_net = lr/10)."""
    from seal3d_tpu.train.trainer import _scale_non_encoder

    tx = _scale_non_encoder(0.1)
    updates = {"encoder": jnp.ones((4, 2)), "sigma_net": [{"w": jnp.ones((3, 3))}]}
    out, _ = tx.update(updates, tx.init(updates))
    np.testing.assert_allclose(out["encoder"], 1.0)
    np.testing.assert_allclose(out["sigma_net"][0]["w"], 0.1)


def test_time_grid_update():
    from seal3d_tpu.render.occupancy import occupancy_t_init, occupancy_t_update

    st = occupancy_t_init(time_size=4, cascades=1)

    def density_fn(x, t):
        # ball at x offset by time
        c = jnp.stack([t - 0.5, jnp.zeros_like(t), jnp.zeros_like(t)], -1)
        return 50.0 * (jnp.linalg.norm(x - c, axis=-1) < 0.3)

    st = occupancy_t_update(st, density_fn, jax.random.PRNGKey(0), bound=1.0,
                            t_indices=jnp.arange(4),
                            cells_per_slice=2**14, query_chunk=2**15)
    occ_frac = np.asarray((st.density_grid > 0.01).mean(axis=(1, 2)))
    assert (occ_frac > 0).all()
    # occupied regions differ between first and last time slice
    g0 = np.asarray(st.density_grid[0, 0] > 0.01)
    g3 = np.asarray(st.density_grid[3, 0] > 0.01)
    assert (g0 != g3).mean() > 0.0001


@pytest.mark.slow
def test_dnerf_trains_dynamic_scene():
    from seal3d_tpu.data.synthetic import DynamicSyntheticScene
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.dnerf_trainer import DNeRFTrainer
    from seal3d_tpu.train.trainer import TrainConfig

    scene = DynamicSyntheticScene()
    ds = scene.make_dataset(n_views=6, h=36, w=36, seed=0)
    assert ds.times is not None
    cfg = DNeRFConfig(variant="deform", log2_hashmap_size=15,
                      num_layers_time=3, hidden_dim_time=64)
    opts = RenderOptions(bound=1.0, num_steps=48, upsample_steps=0, min_near=0.05)
    tcfg = TrainConfig(lr=1e-2, max_steps=400, num_rays=256, eval_chunk=512,
                       random_bg=False)
    tr = DNeRFTrainer(cfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0),
                      time_size=8, use_dense=True, deform_reg=1e-3,
                      sigma_reg=1e-3)
    tr.init_state()
    p0 = tr.evaluate(max_views=2)
    tr.train(steps=250, silent=True)
    p1 = tr.evaluate(max_views=2)
    print(f"dnerf psnr {p0:.2f} -> {p1:.2f}")
    assert p1 > p0 + 2.0


def test_views_per_time_dataset():
    """views_per_time controls the simultaneous-view grouping: times repeat
    in blocks of vpt and the number of distinct times shrinks accordingly."""
    from seal3d_tpu.data.synthetic import DynamicSyntheticScene

    scene = DynamicSyntheticScene()
    ds = scene.make_dataset(n_views=8, h=12, w=12, seed=0, views_per_time=4)
    t = np.asarray(ds.times)
    assert len(np.unique(t)) == 2
    assert (t[:4] == t[0]).all() and (t[4:] == t[4]).all()
    ds2 = scene.make_dataset(n_views=8, h=12, w=12, seed=0)  # default 2/time
    assert len(np.unique(np.asarray(ds2.times))) == 4
