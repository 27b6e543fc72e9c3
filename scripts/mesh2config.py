#!/usr/bin/env python3
"""Generate a bbox seal.json edit config from a mesh
(equivalent of reference scripts/mesh2config.py:31-44: the mesh's vertices
become the `raw` points; transform/scale describe the edit)."""

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh", help=".obj/.ply mesh marking the edit region")
    ap.add_argument("--out", default="seal_config")
    ap.add_argument("--translate", type=float, nargs=3, default=[0, 0, 0])
    ap.add_argument("--rotate_z_deg", type=float, default=0.0)
    ap.add_argument("--scale", type=float, nargs=3, default=[1, 1, 1])
    ap.add_argument("--rgb", type=float, nargs=3, default=None)
    args = ap.parse_args()

    from seal3d_tpu.data.sdf_provider import load_mesh

    verts, _ = load_mesh(args.mesh)
    # subsample raw points (config stays small)
    if len(verts) > 512:
        verts = verts[np.linspace(0, len(verts) - 1, 512).astype(int)]

    th = np.deg2rad(args.rotate_z_deg)
    tf = np.eye(4)
    tf[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                           [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    tf[:3, 3] = args.translate

    cfg = {
        "type": "bbox",
        "raw": verts.tolist(),
        "transform": tf.tolist(),
        "scale": list(args.scale),
    }
    if args.rgb:
        cfg["rgb"] = list(args.rgb)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "seal.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    print(f"wrote {args.out}/seal.json")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
