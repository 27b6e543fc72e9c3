"""Sin/cos positional (frequency) encoding.

Equivalent of the reference freqencoder CUDA extension
(freqencoder/src/freqencoder.cu:31-128): out = [x, sin(2^0 x), cos(2^0 x), ...,
sin(2^{F-1} x), cos(2^{F-1} x)], analytic gradients via autodiff. On TPU this
is a handful of VPU transcendentals — no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_encode(x: jnp.ndarray, degree: int = 12) -> jnp.ndarray:
    """[..., D] -> [..., D * (1 + 2*degree)].

    Layout: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] with each
    sin/cos block covering all D input dims.
    """
    outs = [x]
    for f in range(degree):
        xf = x * (2.0**f)
        outs.append(jnp.sin(xf))
        outs.append(jnp.cos(xf))
    return jnp.concatenate(outs, axis=-1)


def freq_encode_dim(input_dim: int, degree: int) -> int:
    return input_dim * (1 + 2 * degree)
