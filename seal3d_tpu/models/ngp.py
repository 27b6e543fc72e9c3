"""Instant-NGP-style field (hash-grid NeRF), functional.

Capability parity with reference nerf/network.py:
- sigma branch: hash grid (L=16, F=2, desired 2048*bound) -> 2x64 bias-free
  MLP -> (sigma via trunc_exp, 15-d geo feature)          (:32-48, :99-128)
- color branch: SH(deg 4) of the view dir + geo feature + a SECOND hash grid
  of the position (a Seal-3D-specific addition vs upstream torch-ngp,
  SURVEY.md §5.10) -> 3x64 bias-free MLP -> sigmoid rgb    (:50-72, :116-126)
- optional background net: 2D hash grid over sphere coords + SH dir -> 2x64
  MLP -> sigmoid rgb                                       (:74-96, :149-166)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import jax
import jax.numpy as jnp

from seal3d_tpu.models.mlp import mlp_apply, mlp_init
from seal3d_tpu.ops.hashgrid import (HashGridConfig, hashgrid_encode,
                                     hashgrid_encode_stacked, hashgrid_init)
from seal3d_tpu.ops.sh import sh_encode, sh_encode_dim
from seal3d_tpu.ops.trunc_exp import trunc_exp


@dataclass(frozen=True)
class NGPConfig:
    bound: float = 1.0
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    sh_degree: int = 4
    log2_hashmap_size: int = 19
    bg_radius: float = -1.0  # >0 enables the background net
    num_levels: int = 16
    level_dim: int = 2
    # 'pallas' = blocked one-hot MXU lookups (TPU-native; use log2T <= 16),
    # 'xla' = jnp.take gathers (any size; reference-parity table layout).
    grid_backend: str = "xla"
    # 'hash' | 'tiled' | 'wrap' (sheared block-wrap; see HashGridConfig).
    gridtype: str = "hash"
    # Shard the hash-table level stack over a 2-D mesh's 'model' axis
    # (tensor parallelism; see HashGridConfig.shard_levels). The small bg
    # encoder and the MLPs stay replicated.
    grid_shard_levels: bool = False

    @cached_property
    def grid(self) -> HashGridConfig:
        return HashGridConfig(
            num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=16,
            log2_hashmap_size=self.log2_hashmap_size,
            desired_resolution=int(2048 * self.bound),
            backend=self.grid_backend,
            gridtype=self.gridtype,
            shard_levels=self.grid_shard_levels,
        )

    @cached_property
    def grid_bg(self) -> HashGridConfig:
        return HashGridConfig(
            num_levels=4,
            level_dim=2,
            base_resolution=16,
            log2_hashmap_size=19,
            desired_resolution=2048,
            input_dim=2,
        )


def init(key: jax.Array, cfg: NGPConfig):
    ks = jax.random.split(key, 6)
    grid_dim = cfg.grid.output_dim
    sh_dim = sh_encode_dim(cfg.sh_degree)
    sigma_dims = [grid_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [1 + cfg.geo_feat_dim]
    color_in = sh_dim + cfg.geo_feat_dim + grid_dim
    color_dims = [color_in] + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1) + [3]
    params = {
        "encoder": hashgrid_init(ks[0], cfg.grid),
        "encoder_color": hashgrid_init(ks[1], cfg.grid),
        "sigma_net": mlp_init(ks[2], sigma_dims),
        "color_net": mlp_init(ks[3], color_dims),
    }
    if cfg.bg_radius > 0:
        bg_in = cfg.grid_bg.output_dim + sh_dim
        bg_dims = [bg_in] + [cfg.hidden_dim_bg] * (cfg.num_layers_bg - 1) + [3]
        params["encoder_bg"] = hashgrid_init(ks[4], cfg.grid_bg)
        params["bg_net"] = mlp_init(ks[5], bg_dims)
    return params


def _normalize(x: jnp.ndarray, bound: float) -> jnp.ndarray:
    """[-bound, bound] -> [0, 1] for the grid encoders."""
    return (x + bound) / (2.0 * bound)


def density(params, cfg: NGPConfig, x: jnp.ndarray):
    """x: [M, 3] in [-bound, bound] -> sigma [M], geo_feat [M, G]."""
    feat = hashgrid_encode(params["encoder"], _normalize(x, cfg.bound), cfg.grid)
    h = mlp_apply(params["sigma_net"], feat)
    sigma = trunc_exp(h[..., 0])
    geo_feat = h[..., 1:]
    return {"sigma": sigma, "geo_feat": geo_feat}


def color(params, cfg: NGPConfig, x: jnp.ndarray, d: jnp.ndarray, geo_feat: jnp.ndarray):
    """x: [M, 3], d: [M, 3] unit dirs -> rgb [M, 3] in [0, 1]."""
    d_enc = sh_encode(d, cfg.sh_degree)
    c_enc = hashgrid_encode(params["encoder_color"], _normalize(x, cfg.bound), cfg.grid)
    h = jnp.concatenate([d_enc, geo_feat, c_enc], axis=-1)
    h = mlp_apply(params["color_net"], h)
    return jax.nn.sigmoid(h)


def apply(params, cfg: NGPConfig, x: jnp.ndarray, d: jnp.ndarray,
          valid: jnp.ndarray | None = None):
    # The sigma and color hash grids share identical configs, hence identical
    # corner indices for the same x — one stacked gather serves both (halves
    # the dominant lookup cost vs calling density() + color()). `valid` lets
    # the halo kernel skip table chunks only packed-tail samples touch.
    feat, c_enc = hashgrid_encode_stacked(
        (params["encoder"], params["encoder_color"]),
        _normalize(x, cfg.bound), cfg.grid, valid=valid)
    h = mlp_apply(params["sigma_net"], feat)
    sigma = trunc_exp(h[..., 0])
    geo_feat = h[..., 1:]
    d_enc = sh_encode(d, cfg.sh_degree)
    hc = jnp.concatenate([d_enc, geo_feat, c_enc], axis=-1)
    rgb = jax.nn.sigmoid(mlp_apply(params["color_net"], hc))
    return sigma, rgb


def background(params, cfg: NGPConfig, sph: jnp.ndarray, d: jnp.ndarray):
    """sph: [M, 2] sphere coords in [-1, 1], d: [M, 3] -> rgb [M, 3]."""
    h_enc = hashgrid_encode(params["encoder_bg"], (sph + 1.0) * 0.5, cfg.grid_bg)
    d_enc = sh_encode(d, cfg.sh_degree)
    h = mlp_apply(params["bg_net"], jnp.concatenate([h_enc, d_enc], axis=-1))
    return jax.nn.sigmoid(h)


def param_lr_scales(params, encoder_scale: float = 1.0, net_scale: float = 1.0):
    """Per-group LR multipliers (reference get_params, nerf/network.py:199:
    encoders and nets share lr by default; hook kept for parity)."""
    return jax.tree.map_with_path(
        lambda path, _: encoder_scale if "encoder" in str(path[0]) else net_scale,
        params,
    )
