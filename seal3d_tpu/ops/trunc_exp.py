"""Truncated-gradient exponential activation.

Equivalent of reference activation.py:5-17 (`trunc_exp`): forward is exp(x),
backward is g * exp(clamp(x, -15, 15)) so density gradients can't explode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
