"""Training losses (equivalent of reference loss.py)."""

from __future__ import annotations

import jax.numpy as jnp


def mape_loss(pred, target, reduce=True):
    """Mean absolute percentage error (reference loss.py:7-15)."""
    difference = (pred - target).reshape(pred.shape[0], -1)
    scale = 1.0 / (jnp.abs(target.reshape(pred.shape[0], -1)) + 1e-2)
    loss = jnp.abs(difference) * scale
    return loss.mean() if reduce else loss


def huber_loss(pred, target, delta: float = 0.1, reduce=True):
    """Huber loss (reference loss.py:18-27)."""
    diff = jnp.abs(pred - target).reshape(pred.shape[0], -1)
    loss = jnp.where(diff < delta, 0.5 * diff * diff / delta, diff - 0.5 * delta)
    return loss.mean() if reduce else loss


def eff_distloss(weights, ts, deltas):
    """O(N) distortion loss over per-ray sample grids [N, K]
    (reference loss.py:30-76, EffDistLoss)."""
    wm = weights * ts
    w_cum = jnp.cumsum(weights, axis=-1) - weights
    wm_cum = jnp.cumsum(wm, axis=-1) - wm
    loss_uni = (weights * weights * deltas).sum(-1) / 3.0
    loss_bi = 2.0 * (wm * w_cum - weights * wm_cum).sum(-1)
    return (loss_uni + loss_bi).mean()
