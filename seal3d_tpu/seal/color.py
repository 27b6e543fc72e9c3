"""Vectorized RGB <-> HSV/HSL (jnp).

Equivalent of reference SealNeRF/color_utils.py:7-82 and the color-edit
helpers modify_hsv / modify_rgb (seal_utils.py:739-783). Layout here is the
natural [N, 3] (the reference shuffles [N, 3, 1] through torch image-style
converters)."""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] in [0,1] -> (h, s, v), h in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    hr = jnp.mod((g - b) / safe, 6.0)
    hg = (b - r) / safe + 2.0
    hb = (r - g) / safe + 4.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb)) / 6.0
    h = jnp.where(delta > 0, h, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = jnp.mod(hsv[..., 0], 1.0), jnp.clip(hsv[..., 1], 0, 1), hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_hsl(rgb: jnp.ndarray) -> jnp.ndarray:
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    l = (maxc + minc) * 0.5
    delta = maxc - minc
    s = jnp.where(delta > 0, delta / jnp.maximum(1.0 - jnp.abs(2 * l - 1.0), 1e-12), 0.0)
    h = rgb_to_hsv(rgb)[..., 0]
    return jnp.stack([h, jnp.clip(s, 0, 1), l], axis=-1)


def hsl_to_rgb(hsl: jnp.ndarray) -> jnp.ndarray:
    h, s, l = jnp.mod(hsl[..., 0], 1.0), jnp.clip(hsl[..., 1], 0, 1), hsl[..., 2]
    c = (1.0 - jnp.abs(2 * l - 1.0)) * s
    hp = h * 6.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    i = hp.astype(jnp.int32) % 6
    z = jnp.zeros_like(c)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [c, x, z, z, x, c])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [x, c, c, x, z, z])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [z, z, x, c, c, x])
    m = l - c * 0.5
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def modify_hsv(rgb: jnp.ndarray, mod: jnp.ndarray) -> jnp.ndarray:
    """Shift colors in HSV space (reference modify_hsv, seal_utils.py:739-750)."""
    hsv = rgb_to_hsv(rgb) + jnp.asarray(mod)
    return jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)


def modify_rgb(rgb: jnp.ndarray, target_rgb: jnp.ndarray,
               light_offset: float = 0.0, mask: jnp.ndarray = None) -> jnp.ndarray:
    """Recolor keeping per-point lightness variation around the mean
    (reference modify_rgb, seal_utils.py:753-769: H,S from the target color,
    V = target V + (point V - mean V) + offset).

    `mask` (bool [...]) restricts the V mean to edit-region samples: the
    reference computes the mean over a gathered edit-region subset only
    (SealNeRF/renderer.py:316), whereas this vectorized version sees the whole
    batch — an unmasked mean would drift with render chunk contents."""
    hsv = rgb_to_hsv(rgb)
    target = rgb_to_hsv(jnp.broadcast_to(jnp.asarray(target_rgb), rgb.shape))
    if mask is None:
        v_mean = hsv[..., 2].mean()
    else:
        m = mask.astype(hsv.dtype)
        v_mean = (hsv[..., 2] * m).sum() / jnp.maximum(m.sum(), 1.0)
    v_offset = hsv[..., 2] - v_mean
    v = jnp.clip(target[..., 2] + v_offset + light_offset, 0.0, 1.0)
    out = jnp.stack([target[..., 0], target[..., 1], v], axis=-1)
    return jnp.clip(hsv_to_rgb(out), 0.0, 1.0)
