"""TensoRF backbone: vector-matrix (VM) and CP tensor decompositions.

Capability parity with reference tensoRF/network.py (VM) and network_cp.py
(CP): density is a sum over three plane x line (VM) or triple line (CP) rank
products; color features go through a rank->27 basis matmul, frequency
encoding, and a 3x128 MLP. The `F.grid_sample` calls become explicit jnp
bilinear/linear interpolation (align_corners=True, zeros outside [-1,1]) —
dense-plane gathers that XLA fuses well on TPU.

Dynamic-resolution features (upsample_model:277, shrink_model:283) are
host-side param-tree surgeries between jit regions — shapes change, XLA
recompiles once per stage, matching the reference's optimizer re-init
schedule (tensoRF/utils.py:112-130).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.models.mlp import mlp_apply, mlp_init
from seal3d_tpu.ops.freq import freq_encode, freq_encode_dim
from seal3d_tpu.ops.trunc_exp import trunc_exp

# plane i spans world axes (mat_ids[i]); line i spans axis vec_ids[i]
MAT_IDS = ((0, 1), (0, 2), (1, 2))
VEC_IDS = (2, 1, 0)


@dataclass(frozen=True)
class TensoRFConfig:
    bound: float = 1.0
    decomposition: str = "vm"  # 'vm' | 'cp'
    resolution: Tuple[int, int, int] = (128, 128, 128)
    sigma_rank: Tuple[int, int, int] = (16, 16, 16)
    color_rank: Tuple[int, int, int] = (48, 48, 48)
    color_feat_dim: int = 27
    num_layers: int = 3
    hidden_dim: int = 128
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    bg_resolution: Tuple[int, int] = (512, 512)
    bg_rank: int = 8
    bg_radius: float = -1.0
    freq_degree: int = 2

    @cached_property
    def dir_enc_dim(self) -> int:
        return freq_encode_dim(3, self.freq_degree)


def init(key: jax.Array, cfg: TensoRFConfig, resolution=None):
    res = tuple(resolution or cfg.resolution)
    ks = iter(jax.random.split(key, 16))
    scale = 0.1

    def one_svd(ranks):
        mats, vecs = [], []
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            v = VEC_IDS[i]
            if cfg.decomposition == "vm":
                mats.append(scale * jax.random.normal(next(ks), (ranks[i], res[m1], res[m0])))
            vecs.append(scale * jax.random.normal(next(ks), (ranks[i], res[v])))
        return mats, vecs

    sigma_mat, sigma_vec = one_svd(cfg.sigma_rank)
    color_mat, color_vec = one_svd(cfg.color_rank)
    total_color_rank = (sum(cfg.color_rank) if cfg.decomposition == "vm"
                        else cfg.color_rank[0])
    feat_enc_dim = freq_encode_dim(cfg.color_feat_dim, cfg.freq_degree)
    color_dims = ([feat_enc_dim + cfg.dir_enc_dim]
                  + [cfg.hidden_dim] * (cfg.num_layers - 1) + [3])
    params = {
        "sigma_mat": sigma_mat,
        "sigma_vec": sigma_vec,
        "color_mat": color_mat,
        "color_vec": color_vec,
        "basis_mat": [{"w": mlp_init(next(ks), [total_color_rank, cfg.color_feat_dim])[0]["w"]}],
        "color_net": mlp_init(next(ks), color_dims),
        "aabb": jnp.array([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32),
    }
    if cfg.bg_radius > 0:
        params["bg_mat"] = 0.1 * jax.random.normal(
            next(ks), (cfg.bg_rank, cfg.bg_resolution[0], cfg.bg_resolution[1]))
        bg_dims = ([cfg.bg_rank + cfg.dir_enc_dim]
                   + [cfg.hidden_dim_bg] * (cfg.num_layers_bg - 1) + [3])
        params["bg_net"] = mlp_init(next(ks), bg_dims)
    return params


# ------------------------------------------------------- interpolation cores

def sample_plane(plane: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                 align_corners: bool = True) -> jnp.ndarray:
    """Bilinear sample of [R, H, W] at coords in [-1, 1] (zero outside).
    cx indexes W, cy indexes H. Returns [R, N]."""
    r, h, w = plane.shape
    inside = (jnp.abs(cx) <= 1.0) & (jnp.abs(cy) <= 1.0)
    if align_corners:
        x = (jnp.clip(cx, -1, 1) + 1.0) * 0.5 * (w - 1)
        y = (jnp.clip(cy, -1, 1) + 1.0) * 0.5 * (h - 1)
    else:
        x = jnp.clip((cx + 1.0) * 0.5 * w - 0.5, 0.0, w - 1.0)
        y = jnp.clip((cy + 1.0) * 0.5 * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = x - x0
    fy = y - y0
    flat = plane.reshape(r, h * w)
    i00 = y0 * w + x0
    v00 = jnp.take(flat, i00, axis=1)
    v01 = jnp.take(flat, i00 + 1, axis=1)
    v10 = jnp.take(flat, i00 + w, axis=1)
    v11 = jnp.take(flat, i00 + w + 1, axis=1)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    return out * inside[None, :]


def sample_line(line: jnp.ndarray, c: jnp.ndarray,
                align_corners: bool = True) -> jnp.ndarray:
    """Linear sample of [R, D] at coords in [-1, 1]. Returns [R, N]."""
    r, d = line.shape
    inside = jnp.abs(c) <= 1.0
    if align_corners:
        x = (jnp.clip(c, -1, 1) + 1.0) * 0.5 * (d - 1)
    else:
        x = jnp.clip((c + 1.0) * 0.5 * d - 0.5, 0.0, d - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, d - 2)
    fx = x - x0
    v0 = jnp.take(line, x0, axis=1)
    v1 = jnp.take(line, x0 + 1, axis=1)
    return (v0 * (1 - fx) + v1 * fx) * inside[None, :]


def _normalize(params, x):
    aabb = params["aabb"]
    return 2.0 * (x - aabb[:3]) / (aabb[3:] - aabb[:3]) - 1.0


def _sigma_feat(params, cfg, xn):
    if cfg.decomposition == "cp":
        prod = (sample_line(params["sigma_vec"][0], xn[:, VEC_IDS[0]])
                * sample_line(params["sigma_vec"][1], xn[:, VEC_IDS[1]])
                * sample_line(params["sigma_vec"][2], xn[:, VEC_IDS[2]]))
        return prod.sum(0)
    feat = 0.0
    for i in range(3):
        m0, m1 = MAT_IDS[i]
        mat = sample_plane(params["sigma_mat"][i], xn[:, m0], xn[:, m1])
        vec = sample_line(params["sigma_vec"][i], xn[:, VEC_IDS[i]])
        feat = feat + (mat * vec).sum(0)
    return feat


def _color_feat(params, cfg, xn):
    if cfg.decomposition == "cp":
        prod = (sample_line(params["color_vec"][0], xn[:, VEC_IDS[0]])
                * sample_line(params["color_vec"][1], xn[:, VEC_IDS[1]])
                * sample_line(params["color_vec"][2], xn[:, VEC_IDS[2]]))
        feats = prod  # [R, N]
    else:
        parts = []
        for i in range(3):
            m0, m1 = MAT_IDS[i]
            mat = sample_plane(params["color_mat"][i], xn[:, m0], xn[:, m1])
            vec = sample_line(params["color_vec"][i], xn[:, VEC_IDS[i]])
            parts.append(mat * vec)
        feats = jnp.concatenate(parts, axis=0)  # [3R, N]
    return jnp.dot(feats.T, params["basis_mat"][0]["w"],
                   preferred_element_type=jnp.float32)


def density(params, cfg: TensoRFConfig, x: jnp.ndarray):
    xn = _normalize(params, x)
    sigma = trunc_exp(_sigma_feat(params, cfg, xn))
    return {"sigma": sigma, "geo_feat": None}


def color(params, cfg: TensoRFConfig, x: jnp.ndarray, d: jnp.ndarray,
          geo_feat=None):
    xn = _normalize(params, x)
    feat = _color_feat(params, cfg, xn)
    h = jnp.concatenate([freq_encode(feat, cfg.freq_degree),
                         freq_encode(d, cfg.freq_degree)], axis=-1)
    h = mlp_apply(params["color_net"], h)
    return jax.nn.sigmoid(h)


def apply(params, cfg: TensoRFConfig, x: jnp.ndarray, d: jnp.ndarray):
    out = density(params, cfg, x)
    return out["sigma"], color(params, cfg, x, d)


def background(params, cfg: TensoRFConfig, sph: jnp.ndarray, d: jnp.ndarray):
    feats = sample_plane(params["bg_mat"], sph[:, 0], sph[:, 1]).T  # [N, R]
    h = jnp.concatenate([freq_encode(d, cfg.freq_degree), feats], axis=-1)
    return jax.nn.sigmoid(mlp_apply(params["bg_net"], h))


def density_loss(params, cfg: TensoRFConfig):
    """L1 sparsity penalty on the sigma factors (reference density_loss:259)."""
    loss = 0.0
    for v in params["sigma_vec"]:
        loss = loss + jnp.abs(v).mean()
    if cfg.decomposition == "vm":
        for m in params["sigma_mat"]:
            loss = loss + jnp.abs(m).mean()
    return loss


# ------------------------------------------------------ resolution surgeries

def _resize_plane(p, h, w):
    return jax.image.resize(p, (p.shape[0], h, w), method="linear")


def _resize_line(v, d):
    return jax.image.resize(v, (v.shape[0], d), method="linear")


def upsample_model(params, cfg: TensoRFConfig, resolution: Sequence[int]):
    """Bilinear-resize all factors to a new grid resolution
    (reference upsample_model:277; the optax state must be re-initialized by
    the caller, as the reference re-creates its optimizer)."""
    res = tuple(resolution)
    out = dict(params)
    for nm in ("sigma", "color"):
        if f"{nm}_mat" in out and cfg.decomposition == "vm":
            out[f"{nm}_mat"] = [
                _resize_plane(p, res[MAT_IDS[i][1]], res[MAT_IDS[i][0]])
                for i, p in enumerate(out[f"{nm}_mat"])]
        out[f"{nm}_vec"] = [
            _resize_line(v, res[VEC_IDS[i]])
            for i, v in enumerate(out[f"{nm}_vec"])]
    return out


def shrink_model(params, cfg: TensoRFConfig, density_grid: np.ndarray,
                 mean_density: float, density_thresh: float = 0.01,
                 grid_size: int = 128):
    """Crop factors to the occupied sub-box of the density grid and shrink
    aabb (reference shrink_model:283-320). Host-side numpy surgery."""
    from seal3d_tpu.ops.morton import morton3d_invert

    bound = float(np.asarray(params["aabb"])[3])
    half_grid = bound / grid_size
    thresh = min(density_thresh, float(mean_density))
    valid = np.asarray(density_grid)[-1] > thresh
    if not valid.any():
        return params
    codes = np.nonzero(valid)[0].astype(np.uint32)
    pos = np.asarray(morton3d_invert(jnp.asarray(codes)))
    pos = (2 * pos / (grid_size - 1) - 1) * (bound - half_grid)
    aabb = np.asarray(params["aabb"])
    min_pos = pos.min(0) - half_grid
    max_pos = pos.max(0) + half_grid

    res = np.array([params["sigma_vec"][i].shape[1] for i in (2, 1, 0)])
    units = (aabb[3:] - aabb[:3]) / res
    tl = np.clip(np.round((min_pos - aabb[:3]) / units).astype(int), 0, None)
    br = np.minimum(np.round((max_pos - aabb[:3]) / units).astype(int), res)

    out = dict(params)
    for nm in ("sigma", "color"):
        vecs, mats = [], []
        for i in range(3):
            v = VEC_IDS[i]
            vecs.append(out[f"{nm}_vec"][i][:, tl[v]:br[v]])
            if cfg.decomposition == "vm":
                m0, m1 = MAT_IDS[i]
                mats.append(out[f"{nm}_mat"][i][:, tl[m1]:br[m1], tl[m0]:br[m0]])
        out[f"{nm}_vec"] = vecs
        if cfg.decomposition == "vm":
            out[f"{nm}_mat"] = mats
    out["aabb"] = jnp.asarray(np.concatenate([min_pos, max_pos]), jnp.float32)
    return out


def n_to_reso(n_voxels: int, aabb) -> list:
    """Voxel-count -> per-axis resolution (reference tensoRF/utils.py
    upsample schedule helper)."""
    aabb = np.asarray(aabb)
    xyz = aabb[3:] - aabb[:3]
    voxel_size = float((xyz.prod() / n_voxels) ** (1.0 / 3.0))
    return [max(int(round(v / voxel_size)), 2) for v in xyz]
