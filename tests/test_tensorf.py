"""TensoRF backbone tests: interpolation oracles, decomposition math,
resolution surgeries, and a small end-to-end fit."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.models import tensorf
from seal3d_tpu.models.tensorf import TensoRFConfig


def test_sample_plane_matches_manual_bilinear():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(2, 5, 7)).astype(np.float32))
    cx = jnp.asarray(rng.uniform(-1, 1, 64).astype(np.float32))
    cy = jnp.asarray(rng.uniform(-1, 1, 64).astype(np.float32))
    out = np.asarray(tensorf.sample_plane(plane, cx, cy))
    # manual align_corners bilinear
    x = (np.asarray(cx) + 1) / 2 * 6
    y = (np.asarray(cy) + 1) / 2 * 4
    x0 = np.clip(np.floor(x).astype(int), 0, 5)
    y0 = np.clip(np.floor(y).astype(int), 0, 3)
    fx, fy = x - x0, y - y0
    p = np.asarray(plane)
    ref = (p[:, y0, x0] * (1 - fx) * (1 - fy) + p[:, y0, x0 + 1] * fx * (1 - fy)
           + p[:, y0 + 1, x0] * (1 - fx) * fy + p[:, y0 + 1, x0 + 1] * fx * fy)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_sample_outside_is_zero():
    plane = jnp.ones((1, 4, 4))
    out = np.asarray(tensorf.sample_plane(plane, jnp.array([1.5]), jnp.array([0.0])))
    assert out[0, 0] == 0.0
    line = jnp.ones((1, 4))
    assert np.asarray(tensorf.sample_line(line, jnp.array([-1.2])))[0, 0] == 0.0


def _mk(cfg, key=0, res=(24, 24, 24)):
    return tensorf.init(jax.random.PRNGKey(key), cfg, resolution=res)


def test_vm_apply_shapes_and_grad():
    cfg = TensoRFConfig(resolution=(24, 24, 24), sigma_rank=(4, 4, 4),
                        color_rank=(8, 8, 8))
    params = _mk(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    sigma, rgb = tensorf.apply(params, cfg, x, d)
    assert sigma.shape == (32,) and rgb.shape == (32, 3)
    assert (sigma >= 0).all() and (rgb >= 0).all() and (rgb <= 1).all()

    g = jax.grad(lambda p: tensorf.apply(p, cfg, x, d)[0].sum())(params)
    assert float(jnp.abs(g["sigma_mat"][0]).sum()) > 0
    assert float(jnp.abs(g["sigma_vec"][0]).sum()) > 0
    assert float(jnp.abs(g["aabb"]).sum()) >= 0  # aabb grad exists but optimizer freezes it


def test_cp_apply():
    cfg = TensoRFConfig(decomposition="cp", resolution=(24, 24, 24),
                        sigma_rank=(12, 12, 12), color_rank=(12, 12, 12))
    params = _mk(cfg)
    assert "sigma_mat" not in params or not params.get("sigma_mat")
    x = jnp.zeros((4, 3))
    d = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (4, 1))
    sigma, rgb = tensorf.apply(params, cfg, x, d)
    assert sigma.shape == (4,)


def test_upsample_and_shrink():
    cfg = TensoRFConfig(resolution=(16, 16, 16), sigma_rank=(2, 2, 2),
                        color_rank=(2, 2, 2))
    params = _mk(cfg, res=(16, 16, 16))
    up = tensorf.upsample_model(params, cfg, (32, 28, 24))
    assert up["sigma_mat"][0].shape == (2, 28, 32)  # plane 0 = (y res, x res)
    assert up["sigma_vec"][0].shape == (2, 24)      # line 0 = z axis
    # value preservation at corners (align-corner-ish)
    x = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    s0, _ = tensorf.apply(params, cfg, x, d)
    s1, _ = tensorf.apply(up, cfg, x, d)
    np.testing.assert_allclose(np.log(np.asarray(s0) + 1e-8),
                               np.log(np.asarray(s1) + 1e-8), atol=0.3)

    # shrink with a grid occupied only near the center
    from seal3d_tpu.ops.bitfield import GRID_CELLS
    from seal3d_tpu.ops.morton import morton3d_invert

    coords = np.asarray(morton3d_invert(jnp.arange(GRID_CELLS, dtype=jnp.uint32)))
    occ = ((np.abs(coords - 63.5) < 20).all(-1)).astype(np.float32)
    shrunk = tensorf.shrink_model(params, cfg, occ[None], mean_density=1.0)
    aabb = np.asarray(shrunk["aabb"])
    assert (aabb[3:] - aabb[:3] < 1.5).all()
    assert shrunk["sigma_vec"][0].shape[1] < 16


@pytest.mark.slow
def test_tensorf_trains(tmp_path):
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.tensorf_trainer import TensoRFTrainer
    from seal3d_tpu.train.trainer import TrainConfig

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=4, h=40, w=40, seed=0)
    cfg = TensoRFConfig(resolution=(48, 48, 48), sigma_rank=(4, 4, 4),
                        color_rank=(8, 8, 8), hidden_dim=64)
    opts = RenderOptions(bound=1.0, num_steps=48, upsample_steps=0, min_near=0.05)
    tcfg = TrainConfig(lr=2e-2, max_steps=400, num_rays=256, eval_chunk=512,
                       random_bg=False)
    tr = TensoRFTrainer(cfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0),
                        use_dense=True, upsample_steps=(120,),
                        n_voxel_init=48**3, n_voxel_final=64**3,
                        shrink_step=None)
    tr.init_state()
    p0 = tr.evaluate(max_views=2)
    tr.train(steps=250, silent=True)
    p1 = tr.evaluate(max_views=2)
    print(f"tensorf psnr {p0:.2f} -> {p1:.2f}")
    assert p1 > p0 + 2.0
    # upsample milestone must have fired
    assert tr.state.params["sigma_vec"][0].shape[1] > 48
