#!/usr/bin/env python3
"""HyperNeRF dataset (dataset.json/scene.json/camera/*.json) ->
transforms_{train,val}.json with per-frame time
(equivalent of reference scripts/hyper2nerf.py)."""

import argparse
import json
import math
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="HyperNeRF capture dir")
    ap.add_argument("--downscale", type=int, default=2)
    args = ap.parse_args()

    with open(os.path.join(args.path, "dataset.json")) as f:
        dataset = json.load(f)
    with open(os.path.join(args.path, "scene.json")) as f:
        scene = json.load(f)
    with open(os.path.join(args.path, "metadata.json")) as f:
        meta = json.load(f)

    ids = dataset["ids"]
    max_time = max(meta[i]["warp_id"] for i in ids) or 1
    splits = {"train": dataset.get("train_ids", ids),
              "val": dataset.get("val_ids", ids[:2])}

    for split, split_ids in splits.items():
        frames = []
        cam0 = None
        for i in split_ids:
            with open(os.path.join(args.path, "camera", f"{i}.json")) as f:
                cam = json.load(f)
            cam0 = cam0 or cam
            r = np.asarray(cam["orientation"])  # world->cam rows
            pos = np.asarray(cam["position"])
            c2w = np.eye(4)
            c2w[:3, :3] = r.T @ np.diag([1, -1, -1])
            c2w[:3, 3] = (pos - np.asarray(scene["center"])) * scene["scale"]
            frames.append({
                "file_path": os.path.join("rgb", f"{args.downscale}x", f"{i}.png"),
                "transform_matrix": c2w.tolist(),
                "time": meta[i]["warp_id"] / max_time,
            })
        f0 = cam0["focal_length"] / args.downscale
        w = cam0["image_size"][0] / args.downscale
        h = cam0["image_size"][1] / args.downscale
        out = {
            "camera_angle_x": 2 * math.atan(w / (2 * f0)),
            "fl_x": f0, "fl_y": f0, "cx": w / 2, "cy": h / 2,
            "w": int(w), "h": int(h), "aabb_scale": 2, "frames": frames,
        }
        with open(os.path.join(args.path, f"transforms_{split}.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote transforms_{split}.json ({len(frames)} frames)")


if __name__ == "__main__":
    main()
