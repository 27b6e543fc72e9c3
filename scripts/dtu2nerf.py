#!/usr/bin/env python3
"""DTU (cameras.npz projection matrices) -> transforms.json
(equivalent of reference scripts/dtu2nerf.py)."""

import argparse
import json
import math
import os

import numpy as np


def decompose_projection(p):
    """P = K [R|t] -> (K, c2w)."""
    m = p[:3, :3]
    k, r = np.linalg.qr(np.linalg.inv(m))
    k, r = np.linalg.inv(r), np.linalg.inv(k)
    k = k / k[2, 2]
    # enforce positive diagonal
    s = np.diag(np.sign(np.diag(k)))
    k, r = k @ s, s @ r
    t = np.linalg.inv(k) @ p[:3, 3]
    c2w = np.eye(4)
    c2w[:3, :3] = r.T
    c2w[:3, 3] = -r.T @ t
    return k, c2w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="DTU scan dir (cameras.npz + image/)")
    ap.add_argument("--images", default="image")
    args = ap.parse_args()

    cams = np.load(os.path.join(args.path, "cameras.npz"))
    names = sorted(os.listdir(os.path.join(args.path, args.images)))
    frames = []
    k0 = None
    flip = np.diag([1, -1, -1, 1.0])
    for i, name in enumerate(names):
        world_mat = cams[f"world_mat_{i}"]
        scale_mat = cams.get(f"scale_mat_{i}", np.eye(4))
        p = (world_mat @ scale_mat)[:3, :4]
        k, c2w = decompose_projection(p)
        k0 = k0 if k0 is not None else k
        frames.append({"file_path": os.path.join(args.images, name),
                       "transform_matrix": (c2w @ flip).tolist()})
    w = 2 * k0[0, 2]
    out = {
        "camera_angle_x": 2 * math.atan(w / (2 * k0[0, 0])),
        "fl_x": float(k0[0, 0]), "fl_y": float(k0[1, 1]),
        "cx": float(k0[0, 2]), "cy": float(k0[1, 2]),
        "w": int(round(w)), "h": int(round(2 * k0[1, 2])),
        "aabb_scale": 2, "frames": frames,
    }
    with open(os.path.join(args.path, "transforms.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote transforms.json with {len(frames)} frames")


if __name__ == "__main__":
    main()
