"""CLIP guidance: the loss math, image gradients, and the trainer's
rand-pose guided step (reference nerf/clip_utils.py + nerf/utils.py:446-456)
must execute end-to-end — random-init CLIP weights make the full path
runnable without downloads (direction meaningless, math identical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seal3d_tpu.utils.clip_guidance import CLIPLoss


@pytest.fixture(scope="module")
def clip_loss():
    cl = CLIPLoss("a red chair", random_init=True)
    if not cl.available:
        pytest.skip("transformers/torch CLIP unavailable")
    return cl


def test_clip_loss_and_grad(clip_loss):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    l0 = clip_loss(img)
    assert np.isfinite(l0)
    loss, g = clip_loss.loss_and_grad(img)
    assert abs(loss - l0) < 1e-5
    assert g.shape == img.shape
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    # descending the gradient on the raw image must reduce the loss
    # (frozen CLIP, differentiable preprocess — the guidance mechanism)
    x = img.copy()
    for _ in range(8):
        l, g = clip_loss.loss_and_grad(x)
        x = np.clip(x - 2.0 * g, 0, 1)
    assert clip_loss(x) < l0 - 1e-4, (clip_loss(x), l0)


def test_clip_loss_tracks_text(clip_loss):
    # different prompts give different losses on the same image
    img = np.random.default_rng(1).uniform(0, 1, (48, 48, 3)) \
        .astype(np.float32)
    l_a = clip_loss(img)
    clip_loss.prepare_text("a blue ocean wave")
    l_b = clip_loss(img)
    clip_loss.prepare_text("a red chair")
    assert l_a != l_b
    assert abs(clip_loss(img) - l_a) < 1e-5  # re-preparing restores


def test_trainer_clip_step(clip_loss):
    import dataclasses

    import __graft_entry__ as g

    ngp_m, fcfg, opts, tcfg, ds, TrainerCls = g._setup(n_rays=64, h=16,
                                                       w=16, log2_hashmap=12)
    tcfg = dataclasses.replace(tcfg, rand_pose=0, clip_size=24, lr=1e-2)
    tr = TrainerCls(ngp_m, fcfg, opts, tcfg, dataset=ds,
                    key=jax.random.PRNGKey(0), clip_loss=clip_loss)
    tr.init_state()
    tr.state = tr._update_grid_full(tr.state, jax.random.PRNGKey(1))
    p0 = jax.tree.map(jnp.copy, tr.state.params)
    loss = tr.clip_step()
    assert np.isfinite(loss)
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(tr.state.params)))
    assert moved  # CLIP gradient reached the field params
    assert int(tr.state.step) == 1

    # the train() loop in clip-only mode (rand_pose=0) drives guided steps
    tr.train(steps=2, silent=True)
    assert int(tr.state.step) >= 3
