#!/usr/bin/env python3
"""Tanks&Temples (NSVF layout: intrinsics.txt + pose/*.txt) -> transforms.json
(equivalent of reference scripts/tanks2nerf.py)."""

import argparse
import json
import math
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="scene dir (intrinsics.txt, pose/, rgb/)")
    args = ap.parse_args()

    intr = np.loadtxt(os.path.join(args.path, "intrinsics.txt")).reshape(-1)[:9].reshape(3, 3)
    pose_dir = os.path.join(args.path, "pose")
    rgb_dir = os.path.join(args.path, "rgb")
    names = sorted(os.listdir(pose_dir))
    flip = np.diag([1, -1, -1, 1.0])
    frames = []
    for name in names:
        c2w = np.loadtxt(os.path.join(pose_dir, name)).reshape(4, 4)
        img = name.replace(".txt", ".png")
        if not os.path.exists(os.path.join(rgb_dir, img)):
            img = name.replace(".txt", ".jpg")
        frames.append({"file_path": os.path.join("rgb", img),
                       "transform_matrix": (c2w @ flip).tolist()})
    w, h = 2 * intr[0, 2], 2 * intr[1, 2]
    out = {
        "camera_angle_x": 2 * math.atan(w / (2 * intr[0, 0])),
        "fl_x": float(intr[0, 0]), "fl_y": float(intr[1, 1]),
        "cx": float(intr[0, 2]), "cy": float(intr[1, 2]),
        "w": int(round(w)), "h": int(round(h)), "aabb_scale": 4,
        "frames": frames,
    }
    with open(os.path.join(args.path, "transforms.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote transforms.json with {len(frames)} frames")


if __name__ == "__main__":
    main()
