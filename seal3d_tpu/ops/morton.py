"""30-bit 3D Morton (Z-order) codes, pure jnp bit-twiddling.

TPU-native equivalent of the reference CUDA ops `morton3D` / `morton3D_invert`
(reference: raymarching/src/raymarching.cu:56-81, 214-260). Used to index the
multi-cascade occupancy grid in Z-order so that (a) bitfield marching is
cache-friendly and (b) Seal-style edit-region "bitfield hacking" stays an
O(edit-volume) index computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of each lane out to every 3rd bit ("xxyyzz" prep)."""
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def _compress_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _expand_bits: gather every 3rd bit back into the low 10 bits."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x49249249)
    v = (v ^ (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v ^ (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v ^ (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v ^ (v >> 16)) & jnp.uint32(0x0000FFFF)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] integer grid coords (0..1023) -> [...] uint32 Morton codes."""
    coords = coords.astype(jnp.uint32)
    x = _expand_bits(coords[..., 0])
    y = _expand_bits(coords[..., 1])
    z = _expand_bits(coords[..., 2])
    return x | (y << 1) | (z << 2)


def morton3d_invert(codes: jnp.ndarray) -> jnp.ndarray:
    """[...] uint32 Morton codes -> [..., 3] int32 grid coords."""
    codes = codes.astype(jnp.uint32)
    x = _compress_bits(codes)
    y = _compress_bits(codes >> 1)
    z = _compress_bits(codes >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
