"""CCNeRF tests: residual structure, finalize/compress invariants, compose."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.models import ccnerf
from seal3d_tpu.models.ccnerf import CCNeRFConfig


def _cfg(**kw):
    d = dict(resolution=(32, 32, 32), rank_vec_density=(2, 4), rank_mat_density=(0, 2),
             rank_vec=(4, 8), rank_mat=(0, 4), degree=2)
    d.update(kw)
    return CCNeRFConfig(**d)


def _xd(n=16, seed=0):
    kx, kd = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.uniform(kx, (n, 3), minval=-0.8, maxval=0.8)
    d = jax.random.normal(kd, (n, 3))
    return x, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_residual_shapes_and_final_consistency():
    cfg = _cfg()
    params = ccnerf.init(jax.random.PRNGKey(0), cfg)
    x, d = _xd()
    sig_r, rgb_r = ccnerf.apply_residual(params, cfg, x, d)
    assert sig_r.shape == (2, 16) and rgb_r.shape == (2, 16, 3)
    sig, rgb = ccnerf.apply(params, cfg, x, d)
    np.testing.assert_allclose(sig, sig_r[-1], rtol=1e-5)
    np.testing.assert_allclose(rgb, rgb_r[-1], rtol=1e-5)


def test_finalize_preserves_output():
    cfg = _cfg()
    params = ccnerf.init(jax.random.PRNGKey(1), cfg)
    x, d = _xd(seed=2)
    sig0, rgb0 = ccnerf.apply(params, cfg, x, d)
    fin = ccnerf.finalize(params)
    # one fused group per family
    assert len(fin["objects"][0]["vec_density"]) == 1
    sig1, rgb1 = ccnerf.apply(fin, cfg, x, d)
    np.testing.assert_allclose(sig0, sig1, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(rgb0, rgb1, rtol=1e-4, atol=1e-6)


def test_compress_full_rank_identity_and_partial_runs():
    cfg = _cfg()
    params = ccnerf.init(jax.random.PRNGKey(3), cfg)
    x, d = _xd(seed=4)
    sig0, rgb0 = ccnerf.apply(params, cfg, x, d)
    full = ccnerf.compress(params, (4, 2, 8, 4))
    sig1, _ = ccnerf.apply(full, cfg, x, d)
    np.testing.assert_allclose(sig0, sig1, rtol=1e-4, atol=1e-6)
    small = ccnerf.compress(params, (2, 1, 4, 2))
    assert small["objects"][0]["vec_density"][0]["U"][0].shape[0] == 2
    sig2, rgb2 = ccnerf.apply(small, cfg, x, d)
    assert np.isfinite(np.asarray(sig2)).all()


def test_compose_two_objects():
    cfg = _cfg()
    a = ccnerf.init(jax.random.PRNGKey(5), cfg)
    b = ccnerf.init(jax.random.PRNGKey(6), cfg)
    t = np.array([0.3, 0.0, 0.0], np.float32)
    scene = ccnerf.compose(a, b, t=t)
    assert len(scene["objects"]) == 2
    x, d = _xd(seed=7)
    sig, rgb = ccnerf.apply(scene, cfg, x, d)
    assert sig.shape == (16,) and rgb.shape == (16, 3)
    # composed density = a(x) + b(x - t) (identity rotation/scale)
    sa = ccnerf.apply(ccnerf.finalize(a), cfg, x, d)[0]
    xb = x - jnp.asarray(t)
    sb = ccnerf.apply(ccnerf.finalize(b), cfg, xb, d)[0]
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sa + sb), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_cc_training_improves():
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.cc_trainer import CCNeRFTrainer
    from seal3d_tpu.train.trainer import TrainConfig

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=3, h=32, w=32, seed=0)
    cfg = _cfg(resolution=(48, 48, 48))
    opts = RenderOptions(bound=1.0, num_steps=48, upsample_steps=0, min_near=0.05)
    tcfg = TrainConfig(lr=2e-2, max_steps=300, num_rays=256, eval_chunk=512,
                       random_bg=False)
    tr = CCNeRFTrainer(cfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    p0 = tr.evaluate(max_views=1)
    tr.train(steps=200, silent=True)
    p1 = tr.evaluate(max_views=1)
    print(f"ccnerf psnr {p0:.2f} -> {p1:.2f}")
    assert p1 > p0 + 2.0
