"""Occupancy bitfield pack/lookup.

TPU-native equivalent of the reference CUDA `packbits` kernel
(raymarching/src/raymarching.cu:268-300): density grid float -> 1 bit per cell,
8 cells per byte, bit set iff density > threshold. The bitfield layout is
identical to the reference (Morton-ordered cells, cascade-major), which keeps
Seal-3D's `hack_bitfield` editing trick an O(edit volume) byte write.
"""

from __future__ import annotations

import jax.numpy as jnp

# Grid side length per cascade, matches reference H=128 (nerf/renderer.py:87-101).
GRID_SIZE = 128
GRID_CELLS = GRID_SIZE**3  # 2**21 cells per cascade
GRID_BYTES = GRID_CELLS // 8  # 2**18 bytes per cascade

_BIT_VALUES = jnp.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint32)


def packbits(density_grid: jnp.ndarray, thresh) -> jnp.ndarray:
    """Pack a density grid into an occupancy bitfield.

    Args:
      density_grid: [C, H^3] float densities in Morton order (negative =
        untrained cell, never occupied — mirrors reference semantics where
        `mark_untrained_grid` writes -1).
      thresh: scalar occupancy threshold.

    Returns:
      [C * H^3 / 8] uint8 bitfield; bit b of byte i covers Morton cell 8*i+b
      of the flattened [C, H^3] grid.
    """
    occ = (density_grid.reshape(-1) > thresh).astype(jnp.uint32)
    occ = occ.reshape(-1, 8)
    packed = (occ * _BIT_VALUES[None, :]).sum(axis=-1).astype(jnp.uint8)
    return packed


def bitfield_lookup(bitfield: jnp.ndarray, cascade: jnp.ndarray, morton: jnp.ndarray) -> jnp.ndarray:
    """Query occupancy bits.

    Args:
      bitfield: [C * H^3 / 8] uint8.
      cascade: [...] int32 cascade index per query.
      morton: [...] uint32/int32 Morton cell code per query.

    Returns:
      [...] bool occupancy.
    """
    cell = cascade.astype(jnp.uint32) * jnp.uint32(GRID_CELLS) + morton.astype(jnp.uint32)
    byte = jnp.take(bitfield, (cell >> 3).astype(jnp.int32), axis=0)
    bit = (byte.astype(jnp.uint32) >> (cell & 7)) & 1
    return bit.astype(jnp.bool_)
