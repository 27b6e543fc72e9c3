"""Encoder factory — the typed equivalent of the reference's `get_encoder`
(encoding.py:44-77), which maps a name to an encoder module and its output
dim. Here encoders are pure functions, so the factory returns an `Encoder`
record: `init(key) -> params | None`, `encode(params, x) -> features`, and
`output_dim`. Parameter-free encoders ('none', 'frequency',
'sphere_harmonics') return params=None and ignore them in encode.

Names match the reference factory: 'None' | 'frequency' | 'sphere_harmonics'
| 'hashgrid' | 'tiledgrid' (case-insensitive). The reference's 'ash' raises
NotImplementedError there too (encoding.py:72-74). Extra grid kwargs pass
through to HashGridConfig (backend/log2_hashmap_size/...); 'wrapgrid' is the
TPU-native wrap gridtype (see ops/hashgrid.py and PERFORMANCE.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax.numpy as jnp

from seal3d_tpu.ops.freq import freq_encode, freq_encode_dim
from seal3d_tpu.ops.hashgrid import (HashGridConfig, hashgrid_encode,
                                     hashgrid_init)
from seal3d_tpu.ops.sh import sh_encode, sh_encode_dim


@dataclass(frozen=True)
class Encoder:
    name: str
    output_dim: int
    init: Callable[[Any], Any]            # key -> params (or None)
    encode: Callable[[Any, jnp.ndarray], jnp.ndarray]
    grid_cfg: Optional[HashGridConfig] = None


def get_encoder(name: str, input_dim: int = 3, *,
                multires: int = 6,          # frequency octaves
                degree: int = 4,            # SH degree
                num_levels: int = 16, level_dim: int = 2,
                base_resolution: int = 16, log2_hashmap_size: int = 19,
                desired_resolution: int = 2048,
                backend: str = "xla", align_corners: bool = False,
                **grid_kwargs) -> Encoder:
    """Build an encoder by name (reference encoding.py:44-77)."""
    key = name.lower()
    if key in ("none", "identity"):
        return Encoder(name="none", output_dim=input_dim,
                       init=lambda k: None,
                       encode=lambda p, x: x)
    if key in ("frequency", "freq"):
        return Encoder(name="frequency",
                       output_dim=freq_encode_dim(input_dim, multires),
                       init=lambda k: None,
                       encode=lambda p, x: freq_encode(x, multires))
    if key in ("sphere_harmonics", "spherical_harmonics", "sh"):
        assert input_dim == 3, "SH encodes unit 3D directions"
        return Encoder(name="sphere_harmonics",
                       output_dim=sh_encode_dim(degree),
                       init=lambda k: None,
                       encode=lambda p, x: sh_encode(x, degree))
    if key in ("hashgrid", "tiledgrid", "wrapgrid"):
        gridtype = {"hashgrid": "hash", "tiledgrid": "tiled",
                    "wrapgrid": "wrap"}[key]
        cfg = HashGridConfig(
            num_levels=num_levels, level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution, gridtype=gridtype,
            input_dim=input_dim, backend=backend,
            align_corners=align_corners, **grid_kwargs)
        return Encoder(name=key, output_dim=cfg.output_dim,
                       init=lambda k: hashgrid_init(k, cfg),
                       encode=lambda p, x: hashgrid_encode(p, x, cfg),
                       grid_cfg=cfg)
    if key == "ash":
        raise NotImplementedError(
            "'ash' is unimplemented in the reference too (encoding.py:72-74)")
    raise ValueError(f"unknown encoder '{name}'")
