#!/usr/bin/env python3
"""LLFF (poses_bounds.npy) -> transforms.json
(equivalent of reference scripts/llff2nerf.py)."""

import argparse
import json
import math
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="LLFF scene dir (poses_bounds.npy + images/)")
    ap.add_argument("--images", default="images")
    ap.add_argument("--downscale", type=int, default=1)
    args = ap.parse_args()

    data = np.load(os.path.join(args.path, "poses_bounds.npy"))  # [N, 17]
    poses = data[:, :15].reshape(-1, 3, 5)
    h, w, focal = poses[0, :, 4]
    h, w, focal = h / args.downscale, w / args.downscale, focal / args.downscale

    imgdir = os.path.join(args.path, args.images)
    names = sorted(os.listdir(imgdir))
    frames = []
    for i, pose in enumerate(poses):
        # llff [down right back] -> nerf [right up back]
        m = np.eye(4)
        m[:3, :4] = np.concatenate(
            [pose[:, 1:2], pose[:, 0:1], -pose[:, 2:3], pose[:, 3:4]], axis=1)
        frames.append({"file_path": os.path.join(args.images, names[i]),
                       "transform_matrix": m.tolist()})
    out = {
        "camera_angle_x": 2 * math.atan(w / (2 * focal)),
        "fl_x": focal, "fl_y": focal, "cx": w / 2, "cy": h / 2,
        "w": int(w), "h": int(h), "aabb_scale": 4, "frames": frames,
    }
    with open(os.path.join(args.path, "transforms.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote transforms.json with {len(frames)} frames")


if __name__ == "__main__":
    main()
