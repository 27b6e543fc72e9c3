"""CCNeRF: compressible & composable rank-residual tensor radiance field.

Capability parity with reference tensoRF/network_cc.py:
- K residual rank groups per factor family (vec/mat x density/color); training
  returns all K progressive reconstructions (rank-residual loss, :128-250),
- SH-weighted color head (no MLP: features [3*deg^2] dotted with the SH
  encoding of the view dir, :283-296),
- `finalize` (sort ranks by importance, fuse groups :462-516), `compress`
  (slice top ranks :520-539), `compose` (multi-object scenes with per-object
  rigid transforms + softmax sigma-weighted color blending :541-617),
- upsample/shrink surgeries like TensoRF.

Params are a LIST of per-object dicts (object 0 is the trainable one); group
structure is encoded in array shapes, transforms in `T`/`R`/`aabb` entries.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.models.tensorf import MAT_IDS, VEC_IDS, sample_line, sample_plane
from seal3d_tpu.ops.sh import sh_encode, sh_encode_dim
from seal3d_tpu.ops.trunc_exp import trunc_exp


@dataclass(frozen=True)
class CCNeRFConfig:
    bound: float = 1.0
    resolution: Tuple[int, int, int] = (300, 300, 300)
    # cumulative ranks per residual group (reference defaults main_CCNeRF.py)
    rank_vec_density: Tuple[int, ...] = (8, 8, 8)
    rank_mat_density: Tuple[int, ...] = (0, 16, 24)
    rank_vec: Tuple[int, ...] = (24, 24, 24)
    rank_mat: Tuple[int, ...] = (0, 48, 72)
    degree: int = 3
    bg_resolution: Tuple[int, int] = (512, 512)
    bg_rank: int = 8
    bg_radius: float = -1.0

    @cached_property
    def out_dim(self) -> int:
        return 3 * sh_encode_dim(self.degree)

    @cached_property
    def K(self) -> int:
        return len(self.rank_vec)


def _groups(ranks) -> list:
    return list(np.diff(np.asarray(ranks), prepend=0))


def _init_family(key, groups, make_u, out_dim):
    """Per non-empty group: {'U': [3 factors], 'S': [out_dim, r]}."""
    out = []
    for g in groups:
        if g <= 0:
            out.append(None)
            continue
        key, *ks = jax.random.split(key, 4)
        out.append({
            "U": [make_u(ks[i], g, i) for i in range(3)],
            "S": jnp.ones((out_dim, g), jnp.float32),
        })
    return key, [o for o in out if o is not None]


def init(key: jax.Array, cfg: CCNeRFConfig, resolution=None):
    res = tuple(resolution or cfg.resolution)

    def vec_u(k, r, i):
        return 0.2 * jax.random.normal(k, (r, res[VEC_IDS[i]]))

    def mat_u(k, r, i):
        m0, m1 = MAT_IDS[i]
        return 0.2 * jax.random.normal(k, (r, res[m1], res[m0]))

    key, vd = _init_family(key, _groups(cfg.rank_vec_density), vec_u, 1)
    key, md = _init_family(key, _groups(cfg.rank_mat_density), mat_u, 1)
    key, vc = _init_family(key, _groups(cfg.rank_vec), vec_u, cfg.out_dim)
    key, mc = _init_family(key, _groups(cfg.rank_mat), mat_u, cfg.out_dim)
    obj = {
        "vec_density": vd, "mat_density": md, "vec_color": vc, "mat_color": mc,
        "aabb": jnp.array([-cfg.bound] * 3 + [cfg.bound] * 3, jnp.float32),
        "T": jnp.eye(4), "R": jnp.eye(3),
    }
    params = {"objects": [obj]}
    if cfg.bg_radius > 0:
        key, k1 = jax.random.split(key)
        params["bg_mat"] = 0.2 * jax.random.normal(
            k1, (cfg.bg_rank, cfg.bg_resolution[0], cfg.bg_resolution[1]))
        params["bg_S"] = jnp.ones((cfg.out_dim, cfg.bg_rank), jnp.float32)
    return params


def _group_feat(group, xn, is_mat):
    """One rank group's [out_dim, N] contribution (triple product x S)."""
    if is_mat:
        feats = (sample_plane(group["U"][0], xn[:, MAT_IDS[0][0]], xn[:, MAT_IDS[0][1]], False)
                 * sample_plane(group["U"][1], xn[:, MAT_IDS[1][0]], xn[:, MAT_IDS[1][1]], False)
                 * sample_plane(group["U"][2], xn[:, MAT_IDS[2][0]], xn[:, MAT_IDS[2][1]], False))
    else:
        feats = (sample_line(group["U"][0], xn[:, VEC_IDS[0]], False)
                 * sample_line(group["U"][1], xn[:, VEC_IDS[1]], False)
                 * sample_line(group["U"][2], xn[:, VEC_IDS[2]], False))
    return group["S"] @ feats


def _features(obj, family_vec, family_mat, xn, residual: bool):
    """Residual accumulation over groups -> [K, out_dim, N] or [out_dim, N]."""
    n_groups = max(len(obj[family_vec]), len(obj[family_mat]))
    outputs = []
    y = 0.0
    iv = im = 0
    # group k may contribute a vec part, a mat part, or both, in rank order
    # (the reference walks vec/mat lists with independent offsets, :145-180)
    for k in range(n_groups):
        if iv < len(obj[family_vec]):
            y = y + _group_feat(obj[family_vec][iv], xn, False)
            iv += 1
        if im < len(obj[family_mat]):
            y = y + _group_feat(obj[family_mat][im], xn, True)
            im += 1
        outputs.append(y)
    if residual:
        return jnp.stack(outputs)  # [K, out_dim, N]
    return outputs[-1]


def _normalize(obj, x):
    homo = jnp.concatenate([x, jnp.ones_like(x[:, :1])], -1)
    xt = (homo @ obj["T"].T)[:, :3]
    aabb = obj["aabb"]
    return 2.0 * (xt - aabb[:3]) / (aabb[3:] - aabb[:3]) - 1.0


def _color_from_feats(cfg, feats, d):
    """[..., 3C, N] features + dirs -> [..., N, 3] via SH dot."""
    enc_d = sh_encode(d, cfg.degree)  # [N, C]
    c = sh_encode_dim(cfg.degree)
    h = jnp.moveaxis(feats, -2, -1)  # [..., N, 3C]
    h = h.reshape(*h.shape[:-1], 3, c)
    return (h * enc_d[..., None, :]).sum(-1)


def apply_residual(params, cfg: CCNeRFConfig, x, d):
    """Training mode: all K progressive reconstructions.
    Returns sigma [K, N], rgb [K, N, 3]."""
    obj = params["objects"][0]
    xn = _normalize(obj, x)
    fd = _features(obj, "vec_density", "mat_density", xn, residual=True)  # [K,1,N]
    sigma = trunc_exp(fd[:, 0, :])
    fc = _features(obj, "vec_color", "mat_color", xn, residual=True)  # [K,3C,N]
    rgb = jax.nn.sigmoid(_color_from_feats(cfg, fc, d))
    return sigma, rgb


def apply(params, cfg: CCNeRFConfig, x, d):
    """Inference: final reconstruction; multi-object scenes blend colors by
    softmax of per-object sigmas (reference :296-337)."""
    objs = params["objects"]
    if len(objs) == 1:
        obj = objs[0]
        xn = _normalize(obj, x)
        sigma = trunc_exp(_features(obj, "vec_density", "mat_density", xn, False)[0])
        fc = _features(obj, "vec_color", "mat_color", xn, False)
        rgb = jax.nn.sigmoid(_color_from_feats(cfg, fc, d))
        return sigma, rgb
    sigmas, hs = [], []
    for obj in objs:
        xn = _normalize(obj, x)
        s = trunc_exp(_features(obj, "vec_density", "mat_density", xn, False)[0])
        dm = d @ obj["R"].T
        fc = _features(obj, "vec_color", "mat_color", xn, False)
        hs.append(_color_from_feats(cfg, fc, dm))
        sigmas.append(s)
    ws = jax.nn.softmax(jnp.stack(sigmas), axis=0)
    rgb = jax.nn.sigmoid(sum(h * w[:, None] for h, w in zip(hs, ws)))
    return sum(sigmas), rgb


def density(params, cfg: CCNeRFConfig, x):
    sigma = 0.0
    for obj in params["objects"]:
        xn = _normalize(obj, x)
        sigma = sigma + trunc_exp(
            _features(obj, "vec_density", "mat_density", xn, False)[0])
    return {"sigma": sigma, "geo_feat": None}


def color(params, cfg: CCNeRFConfig, x, d, geo_feat=None):
    return apply(params, cfg, x, d)[1]


def background(params, cfg: CCNeRFConfig, sph, d):
    feats = params["bg_S"] @ sample_plane(params["bg_mat"], sph[:, 0], sph[:, 1], False)
    return jax.nn.sigmoid(_color_from_feats(cfg, feats, d))


def density_loss(params, cfg: CCNeRFConfig):
    loss = 0.0
    obj = params["objects"][0]
    for fam in ("vec_density", "mat_density"):
        for g in obj[fam]:
            for u in g["U"]:
                loss = loss + jnp.abs(u).mean()
    return loss


# -------------------------------------------------------------- host surgery

def _finalize_family(groups):
    """Sort ranks by importance inside each group, then fuse all groups
    (reference finalize_group:462-491)."""
    if not groups:
        return groups
    sorted_groups = []
    for g in groups:
        imp = np.abs(np.asarray(g["S"])).sum(0)
        for u in g["U"]:
            imp = imp * np.linalg.norm(np.asarray(u).reshape(u.shape[0], -1), axis=-1)
        order = np.argsort(-imp)
        sorted_groups.append({
            "U": [jnp.asarray(np.asarray(u)[order]) for u in g["U"]],
            "S": jnp.asarray(np.asarray(g["S"])[:, order]),
        })
    fused = {
        "U": [jnp.concatenate([g["U"][i] for g in sorted_groups], axis=0)
              for i in range(3)],
        "S": jnp.concatenate([g["S"] for g in sorted_groups], axis=1),
    }
    return [fused]


def finalize(params):
    """Fuse all rank groups (disables rank-residual training)."""
    out = dict(params)
    objs = []
    for obj in params["objects"]:
        o = dict(obj)
        for fam in ("vec_density", "mat_density", "vec_color", "mat_color"):
            o[fam] = _finalize_family(obj[fam])
        objs.append(o)
    out["objects"] = objs
    return out


def compress(params, ranks: Sequence[int]):
    """Slice the top `ranks` = (vd, md, vc, mc) of a finalized model
    (reference compress:520-539)."""
    params = finalize(params)
    out = dict(params)
    objs = []
    for obj in params["objects"]:
        o = dict(obj)
        for fam, r in zip(("vec_density", "mat_density", "vec_color", "mat_color"),
                          ranks):
            if not o[fam]:
                continue
            if r == 0:
                o[fam] = []
                continue
            g = o[fam][0]
            o[fam] = [{"U": [u[:r] for u in g["U"]], "S": g["S"][:, :r]}]
        objs.append(o)
    out["objects"] = objs
    return out


def compose(params, other, R=None, s=None, t=None):
    """Add `other`'s (finalized) object into the scene with model transform
    x_world = R*s @ x_obj + t (reference compose:541-617)."""
    params = finalize(params)
    other = finalize(other)
    R = np.eye(3, dtype=np.float32) if R is None else np.asarray(R, np.float32)
    s = 1.0 if s is None else float(s)
    t = np.zeros(3, np.float32) if t is None else np.asarray(t, np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R * s
    T[:3, 3] = t
    T_inv = np.linalg.inv(T)

    new_obj = dict(other["objects"][0])
    new_obj["T"] = jnp.asarray(T_inv)
    new_obj["R"] = jnp.asarray(R.T)
    out = dict(params)
    base = list(params["objects"])
    if len(base) == 1:
        # first compose: object 0 becomes a scene member with identity transform
        base[0] = dict(base[0])
    out["objects"] = base + [new_obj]
    return out


def upsample_model(params, cfg: CCNeRFConfig, resolution):
    res = tuple(resolution)
    out = dict(params)
    objs = []
    for obj in params["objects"][:1]:  # only the trainable object
        o = dict(obj)
        for fam in ("vec_density", "vec_color"):
            o[fam] = [{"U": [jax.image.resize(g["U"][i], (g["U"][i].shape[0], res[VEC_IDS[i]]),
                                              "linear") for i in range(3)],
                       "S": g["S"]} for g in obj[fam]]
        for fam in ("mat_density", "mat_color"):
            o[fam] = [{"U": [jax.image.resize(
                g["U"][i],
                (g["U"][i].shape[0], res[MAT_IDS[i][1]], res[MAT_IDS[i][0]]),
                "linear") for i in range(3)], "S": g["S"]} for g in obj[fam]]
        objs.append(o)
    out["objects"] = objs + list(params["objects"][1:])
    return out
