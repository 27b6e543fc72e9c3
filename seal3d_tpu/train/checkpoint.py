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
