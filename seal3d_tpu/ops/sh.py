"""Real spherical-harmonics direction encoding.

Equivalent of the reference shencoder CUDA extension
(shencoder/src/shencoder.cu:28-438). Degrees 1-4 are hardcoded with the same
polynomial basis/constants as instant-ngp & torch-ngp so that imported
reference checkpoints see identical color-MLP input features; degrees 5-8 use
a generic scaled associated-Legendre recurrence (differentiable, pole-safe).
Backward is plain autodiff — the VPU handles this without a custom kernel.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sh_encode(d: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Encode unit directions.

    Args:
      d: [..., 3] unit direction vectors (x, y, z).
      degree: SH degree in [1, 8]; output has degree**2 channels.

    Returns:
      [..., degree**2] real SH basis values.
    """
    assert 1 <= degree <= 8, "sh_encode supports degree 1..8"
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    if degree <= 4:
        return _sh_hardcoded(x, y, z, degree)
    return _sh_generic(x, y, z, degree)


def sh_encode_dim(degree: int) -> int:
    return degree * degree


def _sh_hardcoded(x, y, z, degree):
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    comps = [jnp.full_like(x, 0.28209479177387814)]
    if degree >= 2:
        comps += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        comps += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        ]
    if degree >= 4:
        comps += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(comps, axis=-1)


def _sh_generic(x, y, z, degree):
    """Any-degree real SH via the scaled-Legendre + complex-power recurrences.

    Uses \\hat P_l^m(z) (associated Legendre with the sin^m(theta) factor
    removed) together with A_m = Re((x+iy)^m), B_m = Im((x+iy)^m), which carry
    the sin^m(theta) * cos/sin(m*phi) parts without ever dividing by sin(theta)
    — stable and differentiable at the poles.
    """
    lmax = degree - 1
    # A_m, B_m recurrences.
    A = [jnp.ones_like(x), x]
    B = [jnp.zeros_like(x), y]
    for m in range(2, lmax + 1):
        A.append(x * A[m - 1] - y * B[m - 1])
        B.append(x * B[m - 1] + y * A[m - 1])
    # Scaled Legendre.
    P = {(0, 0): jnp.ones_like(z)}
    for m in range(1, lmax + 1):
        P[(m, m)] = (1.0 - 2.0 * m) * P[(m - 1, m - 1)]
    for m in range(0, lmax):
        P[(m + 1, m)] = (2.0 * m + 1.0) * z * P[(m, m)]
    for l in range(2, lmax + 1):
        for m in range(0, l - 1):
            P[(l, m)] = ((2.0 * l - 1.0) * z * P[(l - 1, m)] - (l + m - 1.0) * P[(l - 2, m)]) / (l - m)

    def K(l, m):
        return math.sqrt(
            (2.0 * l + 1.0) / (4.0 * math.pi) * math.factorial(l - m) / math.factorial(l + m)
        )

    comps = []
    sqrt2 = math.sqrt(2.0)
    for l in range(0, lmax + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            k = K(l, am)
            if m == 0:
                comps.append(k * P[(l, 0)])
            elif m > 0:
                comps.append(sqrt2 * k * P[(l, am)] * A[am])
            else:
                comps.append(sqrt2 * k * P[(l, am)] * B[am])
    return jnp.stack(comps, axis=-1)
