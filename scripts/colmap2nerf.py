#!/usr/bin/env python3
"""COLMAP (text model) -> transforms.json converter.

Equivalent of reference scripts/colmap2nerf.py: parses cameras.txt/images.txt,
recenters/rescales poses, writes instant-ngp-style transforms.json. COLMAP
runs (feature extraction/mapping) must be done separately; this converts an
existing sparse text model."""

import argparse
import json
import math
import os

import numpy as np


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
    ])


def parse_cameras(path):
    cams = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            p = line.split()
            cam_id, model, w, h = int(p[0]), p[1], int(p[2]), int(p[3])
            params = [float(v) for v in p[4:]]
            if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
                fx = fy = params[0]
                cx, cy = params[1], params[2]
            else:  # PINHOLE, OPENCV, ...
                fx, fy, cx, cy = params[0], params[1], params[2], params[3]
            cams[cam_id] = dict(w=w, h=h, fl_x=fx, fl_y=fy, cx=cx, cy=cy)
    return cams


def parse_images(path):
    out = []
    with open(path) as f:
        lines = [l for l in f if not l.startswith("#") and l.strip()]
    for i in range(0, len(lines), 2):  # every image has a 2nd POINTS2D line
        p = lines[i].split()
        q = [float(v) for v in p[1:5]]
        t = np.array([float(v) for v in p[5:8]])
        cam_id = int(p[8])
        name = p[9]
        r = qvec2rotmat(q)
        # world-to-camera -> camera-to-world
        c2w = np.eye(4)
        c2w[:3, :3] = r.T
        c2w[:3, 3] = -r.T @ t
        out.append((name, cam_id, c2w))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="colmap_text",
                    help="dir with cameras.txt/images.txt")
    ap.add_argument("--images", default="images")
    ap.add_argument("--out", default="transforms.json")
    ap.add_argument("--aabb_scale", type=int, default=16)
    args = ap.parse_args()

    cams = parse_cameras(os.path.join(args.text, "cameras.txt"))
    images = parse_images(os.path.join(args.text, "images.txt"))
    cam0 = cams[images[0][1]]

    # colmap (x right, y down, z fwd) -> nerf (x right, y up, z back)
    flip = np.diag([1, -1, -1, 1.0])
    frames = []
    centers = []
    for name, cam_id, c2w in images:
        m = c2w @ flip
        centers.append(m[:3, 3])
        frames.append({"file_path": os.path.join(args.images, name),
                       "transform_matrix": m})
    centers = np.stack(centers)
    center = centers.mean(0)
    scale = 4.0 / (np.percentile(np.linalg.norm(centers - center, axis=1), 90) + 1e-9)
    for fr in frames:
        m = fr["transform_matrix"].copy()
        m[:3, 3] = (m[:3, 3] - center) * scale
        fr["transform_matrix"] = m.tolist()

    out = {
        "camera_angle_x": 2 * math.atan(cam0["w"] / (2 * cam0["fl_x"])),
        "fl_x": cam0["fl_x"], "fl_y": cam0["fl_y"],
        "cx": cam0["cx"], "cy": cam0["cy"],
        "w": cam0["w"], "h": cam0["h"],
        "aabb_scale": args.aabb_scale,
        "frames": frames,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out} with {len(frames)} frames")


if __name__ == "__main__":
    main()
