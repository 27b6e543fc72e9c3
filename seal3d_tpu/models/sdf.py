"""SDF fitting network (hash grid + MLP -> signed distance).

Equivalent of reference sdf/netowrk.py:8 (sic): hashgrid encoding of x in
[0,1] + a 3x64 MLP producing one signed distance value. clip_sdf optionally
clamps outputs (reference ctor arg)."""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Optional

import jax
import jax.numpy as jnp

from seal3d_tpu.models.mlp import mlp_apply, mlp_init
from seal3d_tpu.ops.hashgrid import HashGridConfig, hashgrid_encode, hashgrid_init


@dataclass(frozen=True)
class SDFConfig:
    bound: float = 1.0
    num_layers: int = 3
    hidden_dim: int = 64
    log2_hashmap_size: int = 19
    clip_sdf: Optional[float] = None
    grid_backend: str = "xla"

    @cached_property
    def grid(self) -> HashGridConfig:
        return HashGridConfig(num_levels=16, level_dim=2, base_resolution=16,
                              log2_hashmap_size=self.log2_hashmap_size,
                              desired_resolution=2048,
                              backend=self.grid_backend)


def init(key: jax.Array, cfg: SDFConfig):
    k1, k2 = jax.random.split(key)
    dims = [cfg.grid.output_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [1]
    return {"encoder": hashgrid_init(k1, cfg.grid), "net": mlp_init(k2, dims)}


def apply(params, cfg: SDFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: [M, 3] in [-bound, bound] -> sdf [M]."""
    xn = (x + cfg.bound) / (2.0 * cfg.bound)
    h = hashgrid_encode(params["encoder"], xn, cfg.grid)
    out = mlp_apply(params["net"], h)[..., 0]
    if cfg.clip_sdf is not None:
        out = jnp.clip(out, -cfg.clip_sdf, cfg.clip_sdf)
    return out
