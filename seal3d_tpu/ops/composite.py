"""Volume-rendering compositing, dense and flat-compacted variants.

Replaces the reference CUDA kernels `composite_rays_train_forward/backward`
(raymarching/src/raymarching.cu:501-693) and the inference compositor
(:799-914). Key TPU insight: with alpha_i = 1 - exp(-sigma_i * dt_i) the
log-transmittance is *exactly* -sum(sigma*dt), so per-ray transmittance over a
flat ray-contiguous buffer is one global cumsum plus a gather of each
segment's start value — fully parallel, numerically exact, and autodiff gives
the reference's hand-derived sigma backward (:662-667) for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def composite_dense(sigmas: jnp.ndarray, rgbs: jnp.ndarray, deltas: jnp.ndarray,
                    ts: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Composite per-ray sample grids.

    Args:
      sigmas: [N, K]; rgbs: [N, K, 3]; deltas, ts: [N, K];
      valid: optional [N, K] mask.

    Returns:
      dict with weights [N, K], weights_sum [N], depth [N], image [N, 3].
    """
    sdelta = sigmas * deltas
    if valid is not None:
        sdelta = jnp.where(valid, sdelta, 0.0)
    cum = jnp.cumsum(sdelta, axis=-1)
    trans = jnp.exp(-(cum - sdelta))  # exclusive
    alpha = 1.0 - jnp.exp(-sdelta)
    weights = trans * alpha
    weights_sum = weights.sum(-1)
    depth = (weights * ts).sum(-1)
    image = (weights[..., None] * rgbs).sum(-2)
    return {"weights": weights, "weights_sum": weights_sum, "depth": depth,
            "image": image}


def composite_flat(sigmas: jnp.ndarray, rgbs: jnp.ndarray, deltas: jnp.ndarray,
                   ts: jnp.ndarray, ray_id: jnp.ndarray, offsets: jnp.ndarray,
                   valid: jnp.ndarray, num_rays: int,
                   tau_in: jnp.ndarray | None = None):
    """Composite a flat ray-contiguous compacted buffer (see raymarch.MarchedRays).

    Args:
      sigmas: [M]; rgbs: [M, 3]; deltas, ts: [M]; ray_id: [M] int32;
      offsets: [N] segment starts; valid: [M] bool; num_rays: N (static).
      tau_in: optional [N] per-ray optical depth accumulated by EARLIER
        marching rounds (the transmittance-termination path,
        render.renderer.render_rays term_rounds > 1): every weight is
        scaled by exp(-tau_in[ray]), and the returned `tau_out` extends it
        with this buffer's per-ray optical depth so rounds chain exactly —
        the multi-round composite is bit-for-bit the single-pass composite
        of the concatenated sample stream (the reference instead carries T
        per alive ray between marching iterations, raymarching.cu:799-914).

    Returns:
      dict with weights [M], weights_sum [N], depth [N], image [N, 3]
      (+ tau_out [N] when tau_in is given).
    """
    m = sigmas.shape[0]
    sdelta = jnp.where(valid, sigmas * deltas, 0.0)

    # Compensated (TwoSum) prefix scan: a single fp32 cumsum over the whole
    # [M] buffer can reach ~1e6-1e9 with post-trunc_exp densities, and the
    # per-ray difference of two large rounded prefixes would lose the optical
    # depth's low bits. Carrying a (hi, lo) residual pair through the scan and
    # differencing hi and lo separately keeps the per-segment result accurate
    # regardless of the global prefix magnitude.
    def _comp_add(x, y):
        s = x[0] + y[0]
        z = s - x[0]
        err = (x[0] - (s - z)) + (y[0] - z)
        return s, err + x[1] + y[1]

    cum_hi, cum_lo = jax.lax.associative_scan(
        _comp_add, (sdelta, jnp.zeros_like(sdelta)))
    off = jnp.clip(offsets, 0, m - 1)
    hi_s = jnp.take(jnp.take(cum_hi, off), ray_id)
    lo_s = jnp.take(jnp.take(cum_lo, off), ray_id)
    sd_s = jnp.take(jnp.take(sdelta, off), ray_id)
    # Exclusive in-segment optical depth: (inclusive prefix diff) - own sdelta
    # + start's sdelta (the start sample's own contribution is excluded).
    tau = (cum_hi - hi_s) + (cum_lo - lo_s) - sdelta + sd_s
    if tau_in is not None:
        tau = tau + jnp.take(tau_in, ray_id)
    trans = jnp.exp(-tau)
    alpha = 1.0 - jnp.exp(-sdelta)
    weights = jnp.where(valid, trans * alpha, 0.0)

    seg = jnp.zeros((num_rays,), weights.dtype)
    weights_sum = seg.at[ray_id].add(weights)
    depth = seg.at[ray_id].add(weights * ts)
    image = jnp.zeros((num_rays, 3), rgbs.dtype).at[ray_id].add(
        weights[:, None] * jnp.where(valid[:, None], rgbs, 0.0))
    out = {"weights": weights, "weights_sum": weights_sum, "depth": depth,
           "image": image}
    if tau_in is not None:
        out["tau_out"] = tau_in + seg.at[ray_id].add(sdelta)
    return out
