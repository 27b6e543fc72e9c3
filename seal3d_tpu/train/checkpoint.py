"""Checkpoint save/load.

Equivalent of reference save_checkpoint/load_checkpoint
(nerf/utils.py:1015-1137): full checkpoints carry params + optimizer + EMA +
occupancy state + step; light ones carry params/EMA only. Format is a plain
.npz keyed by pytree paths (torch-free). `import_torch_ngp` maps a reference
.pth state_dict onto our NGP param tree for cross-framework checkpoint
compatibility (SURVEY.md §5.4 / hard part 5).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(path: str, state: Any, full: bool = True):
    if not full:
        state = state._replace(opt_state=None)
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for p, leaf in flat:
        arrays[_path_str(p)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_state(path: str, template: Any) -> Any:
    """Load into the structure of `template`; missing keys keep template values
    (non-strict, with a warning — mirrors reference non-strict load)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    missing = []
    for p, leaf in flat:
        key = _path_str(p)
        if key in data.files:
            leaves.append(jnp.asarray(data[key]))
        else:
            missing.append(key)
            leaves.append(leaf)
    if missing:
        print(f"[checkpoint] missing keys kept from template: {missing[:5]}"
              f"{'...' if len(missing) > 5 else ''}")
    return jax.tree_util.tree_unflatten(treedef, [l for l in leaves])


def prune_checkpoints(directory: str, name: str, keep: int = 2):
    files = sorted(glob.glob(os.path.join(directory, f"{name}_step*.npz")))
    for f in files[:-keep]:
        os.remove(f)


def latest_checkpoint(directory: str, name: str):
    files = sorted(glob.glob(os.path.join(directory, f"{name}_step*.npz")))
    return files[-1] if files else None


# --------------------------------------------------------------- torch interop

_TORCH_NGP_LAYER = re.compile(r"(sigma_net|color_net|bg_net)\.(\d+)\.weight")


def export_torch_ngp(path: str, params: dict, step: int = 0, grid_cfg=None):
    """Write our NGP params as a reference-compatible torch .pth checkpoint
    (state_dict naming of nerf/network.py; SURVEY.md §5.4 compatibility
    surface) so the CUDA reference can load models trained here. Pass
    `grid_cfg` for pallas-backend params so tables are re-packed into the
    reference's xla level layout."""
    import dataclasses

    import torch

    from seal3d_tpu.ops.hashgrid import convert_table_layout

    def from_table(tab):
        if grid_cfg is not None and grid_cfg.backend in ("pallas", "halo"):
            # Re-pack padded-level layouts to native per-level sizes. NB for
            # 'halo' (gridtype='wrap') the exported entries keep wrap
            # indexing semantics: round-trips through our own configs, but
            # the torch reference would interpret hashed levels differently.
            ref_cfg = dataclasses.replace(grid_cfg, backend="xla")
            tab = convert_table_layout(jnp.asarray(tab), grid_cfg, ref_cfg)
        return np.asarray(tab)

    sd = {}
    for enc in ("encoder", "encoder_color"):
        if enc in params:
            sd[f"{enc}.embeddings"] = torch.from_numpy(
                from_table(params[enc]).copy())
    if "encoder_bg" in params:
        sd["encoder_bg.embeddings"] = torch.from_numpy(
            np.asarray(params["encoder_bg"]).copy())
    for net in ("sigma_net", "color_net", "bg_net"):
        if net in params:
            for i, layer in enumerate(params[net]):
                sd[f"{net}.{i}.weight"] = torch.from_numpy(
                    np.asarray(layer["w"]).T.copy())
    torch.save({"model": sd, "global_step": step, "epoch": 0, "stats": {}},
               path)


def tensorf_resolution(params: dict) -> list:
    """Per-axis grid resolution derived from the sigma line factors
    (vec i spans world axis VEC_IDS[i]; reference stores model.resolution,
    tensoRF/utils.py:247)."""
    from seal3d_tpu.models.tensorf import VEC_IDS

    res = [0, 0, 0]
    for i in range(3):
        res[VEC_IDS[i]] = int(params["sigma_vec"][i].shape[1])
    return res


def export_torch_tensorf(path: str, params: dict, step: int = 0):
    """Write TensoRF (VM or CP) params as a reference-compatible .pth with
    the `resolution` metadata the reference loader re-instantiates from
    (tensoRF/utils.py:239-256, 328-356). Reference shapes: mats [1,R,H,W],
    vecs [1,R,D,1], Linears [out, in] (ours are transposed [in, out])."""
    import torch

    sd = {}
    for nm in ("sigma", "color"):
        for i, m in enumerate(params.get(f"{nm}_mat", []) or []):
            sd[f"{nm}_mat.{i}"] = torch.from_numpy(np.asarray(m)[None].copy())
        for i, v in enumerate(params[f"{nm}_vec"]):
            sd[f"{nm}_vec.{i}"] = torch.from_numpy(
                np.asarray(v)[None, ..., None].copy())
    sd["basis_mat.weight"] = torch.from_numpy(
        np.asarray(params["basis_mat"][0]["w"]).T.copy())
    for net in ("color_net", "bg_net"):
        if net in params:
            for i, layer in enumerate(params[net]):
                sd[f"{net}.{i}.weight"] = torch.from_numpy(
                    np.asarray(layer["w"]).T.copy())
    if "bg_mat" in params:
        sd["bg_mat"] = torch.from_numpy(np.asarray(params["bg_mat"])[None].copy())
    aabb = torch.from_numpy(np.asarray(params["aabb"]).copy())
    sd["aabb_train"] = aabb
    sd["aabb_infer"] = aabb.clone()
    torch.save({"model": sd, "resolution": tensorf_resolution(params),
                "global_step": step, "epoch": 0, "stats": {}}, path)


def import_torch_tensorf(pth_path: str, cfg):
    """Reference TensoRF .pth -> (params, resolution), re-instantiated AT
    CHECKPOINT SHAPE: the param tree is built from the checkpoint's
    `resolution` metadata (falling back to factor shapes), the analog of the
    reference loader calling upsample_model(checkpoint['resolution']) before
    load_state_dict (tensoRF/utils.py:352-356). cfg.decomposition must match
    the checkpoint (vm checkpoints carry sigma_mat.* keys, cp don't)."""
    import torch

    from seal3d_tpu.models import tensorf

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)

    def to_np(t):
        return np.asarray(t.detach().float().numpy())

    is_vm = any(k.endswith("sigma_mat.0") for k in sd)
    want_vm = cfg.decomposition == "vm"
    if is_vm != want_vm:
        raise ValueError(f"checkpoint decomposition ({'vm' if is_vm else 'cp'})"
                         f" != cfg.decomposition ({cfg.decomposition})")
    res = ckpt.get("resolution")
    if res is None:
        res = [0, 0, 0]
        for i in range(3):
            key = next(k for k in sd if k.endswith(f"sigma_vec.{i}"))
            res[tensorf.VEC_IDS[i]] = int(sd[key].shape[2])
    params = tensorf.init(jax.random.PRNGKey(0), cfg, resolution=res)
    for k, v in sd.items():
        base = k.split(".")
        name = base[-2] if base[-1].isdigit() else base[-1]
        if name in ("sigma_mat", "color_mat"):
            params[name][int(base[-1])] = jnp.asarray(to_np(v)[0])
        elif name in ("sigma_vec", "color_vec"):
            params[name][int(base[-1])] = jnp.asarray(to_np(v)[0, :, :, 0])
        elif k.endswith("basis_mat.weight"):
            params["basis_mat"][0]["w"] = jnp.asarray(to_np(v).T)
        elif name == "bg_mat" and "bg_mat" in params:
            params["bg_mat"] = jnp.asarray(to_np(v)[0])
        elif k.endswith("aabb_train"):
            params["aabb"] = jnp.asarray(to_np(v))
        else:
            m = _TORCH_NGP_LAYER.search(k)
            if m and m.group(1) in params:
                params[m.group(1)][int(m.group(2))]["w"] = jnp.asarray(to_np(v).T)
    return params, list(res)


_CC_FAMS = (("vec_density", "U_vec_density", "S_vec_density", "rank_vec_density"),
            ("mat_density", "U_mat_density", "S_mat_density", "rank_mat_density"),
            ("vec_color", "U_vec", "S_vec", "rank_vec"),
            ("mat_color", "U_mat", "S_mat", "rank_mat"))


def _cc_ranks(obj: dict, fam: str, cfg_ranks) -> tuple:
    """Cumulative rank metadata for one family. Uses the config's tuple when
    the live group sizes still match it (keeps zero-group alignment), else
    derives a plain cumsum (post-finalize/compress params)."""
    sizes = [int(g["U"][0].shape[0]) for g in obj[fam]]
    cfg_sizes = [int(d) for d in np.diff(np.asarray(cfg_ranks), prepend=0) if d > 0]
    if cfg_sizes == sizes:
        return tuple(int(r) for r in cfg_ranks)
    return tuple(int(c) for c in np.cumsum(sizes))


def export_torch_ccnerf(path: str, params: dict, cfg, step: int = 0):
    """Write CCNeRF object-0 params as a reference-compatible .pth carrying
    the rank/resolution metadata its loader re-instantiates from
    (tensoRF/utils.py:248-256, 330-348). Reference naming: U_*.{3k+i}
    [1,R,D,1] or [1,R,H,W] per group k / axis i, S_*.{k} [out_dim, R]."""
    import torch

    obj = params["objects"][0]
    sd = {}
    meta = {}
    for fam, un, sn, rn in _CC_FAMS:
        for k, g in enumerate(obj[fam]):
            for i in range(3):
                arr = np.asarray(g["U"][i])
                if fam.startswith("vec"):
                    arr = arr[:, :, None]   # [R, D] -> [R, D, 1]
                sd[f"{un}.{3 * k + i}"] = torch.from_numpy(arr[None].copy())
            sd[f"{sn}.{k}"] = torch.from_numpy(np.asarray(g["S"]).copy())
        meta[rn] = list(_cc_ranks(obj, fam, getattr(cfg, rn)))
    aabb = torch.from_numpy(np.asarray(obj["aabb"]).copy())
    sd["aabb_train"] = aabb
    sd["aabb_infer"] = aabb.clone()
    fam0 = next(f for f, _, _, _ in _CC_FAMS if obj[f])
    u0 = obj[fam0][0]["U"]
    res = [0, 0, 0]
    from seal3d_tpu.models.tensorf import MAT_IDS, VEC_IDS
    for i in range(3):
        if fam0.startswith("vec"):
            res[VEC_IDS[i]] = int(u0[i].shape[1])
        else:
            res[MAT_IDS[i][0]] = int(u0[i].shape[2])
            res[MAT_IDS[i][1]] = int(u0[i].shape[1])
    torch.save({"model": sd, "resolution": res, **meta,
                "global_step": step, "epoch": 0, "stats": {}}, path)


def import_torch_ccnerf(pth_path: str, cfg):
    """Reference CCNeRF .pth -> (params, new_cfg): the model is re-built at
    the checkpoint's rank structure + resolution (reference re-instantiates
    CCNeRF from checkpoint_dict['rank_*'] + ['resolution'],
    tensoRF/utils.py:330-348), then the factors are filled in."""
    import dataclasses

    import torch

    from seal3d_tpu.models import ccnerf

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    res = tuple(ckpt["resolution"])
    new_cfg = dataclasses.replace(
        cfg, resolution=res,
        **{rn: tuple(ckpt[rn]) for _, _, _, rn in _CC_FAMS if rn in ckpt})
    params = ccnerf.init(jax.random.PRNGKey(0), new_cfg, resolution=res)
    obj = params["objects"][0]

    def to_np(t):
        return np.asarray(t.detach().float().numpy())

    for fam, un, sn, _ in _CC_FAMS:
        for k, g in enumerate(obj[fam]):
            for i in range(3):
                arr = to_np(sd[f"{un}.{3 * k + i}"])[0]
                if fam.startswith("vec"):
                    arr = arr[:, :, 0]
                g["U"][i] = jnp.asarray(arr)
            g["S"] = jnp.asarray(to_np(sd[f"{sn}.{k}"]))
    if "aabb_train" in sd:
        obj["aabb"] = jnp.asarray(to_np(sd["aabb_train"]))
    return params, new_cfg


def import_torch_ngp(pth_path: str, params: dict, grid_cfg=None) -> dict:
    """Map a reference torch-ngp/Seal-3D NGP checkpoint (.pth) onto our param
    tree. Requires torch (CPU) to deserialize.

    Reference layout (nerf/network.py): `encoder.embeddings [T, F]`,
    `encoder_color.embeddings`, `{sigma,color,bg}_net.{i}.weight [out, in]`
    (bias-free Linears — ours store transposed [in, out]). Reference tables
    use the xla level layout (8-entry alignment); pass `grid_cfg` (the 3D
    HashGridConfig of `params`) so pallas-backend tables are re-packed into
    the fused kernel's 1024-aligned layout.
    """
    import dataclasses

    import torch

    from seal3d_tpu.ops.hashgrid import convert_table_layout

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    out = jax.tree.map(lambda x: x, params)  # shallow copy

    def to_np(t):
        return np.asarray(t.detach().float().numpy())

    def to_table(v, like):
        tab = jnp.asarray(to_np(v))
        if grid_cfg is not None and tab.shape != like.shape:
            ref_cfg = dataclasses.replace(grid_cfg, backend="xla")
            tab = convert_table_layout(tab, ref_cfg, grid_cfg)
        return tab

    for k, v in sd.items():
        if k.endswith("encoder.embeddings"):
            out["encoder"] = to_table(v, out["encoder"])
        elif k.endswith("encoder_color.embeddings"):
            out["encoder_color"] = to_table(v, out["encoder_color"])
        elif k.endswith("encoder_bg.embeddings") and "encoder_bg" in out:
            out["encoder_bg"] = jnp.asarray(to_np(v))
        else:
            m = _TORCH_NGP_LAYER.search(k)
            if m:
                net, idx = m.group(1), int(m.group(2))
                if net in out and idx < len(out[net]):
                    out[net][idx]["w"] = jnp.asarray(to_np(v).T)
    return out
