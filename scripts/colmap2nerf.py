#!/usr/bin/env python3
"""Capture -> transforms.json pipeline (reference scripts/colmap2nerf.py).

Full parity surface (reference :26-40, :60-100): optionally extract frames
from a video with ffmpeg (--video), optionally run the COLMAP
feature-extract / match / map / bundle-adjust / TXT-export pipeline on the
image folder (--run_colmap), then parse cameras.txt/images.txt,
recenter/rescale poses, and write instant-ngp-style transforms.json
(plus train/val splits with --hold, and per-frame time with --dynamic).
Unlike the reference this never prompts interactively (pass --overwrite)
and shells out with argument lists, not f-string os.system calls."""

import argparse
import json
import math
import os
import shutil
import subprocess
import sys

import numpy as np


def _run(cmd):
    print("==== running:", " ".join(cmd), flush=True)
    r = subprocess.run(cmd)
    if r.returncode != 0:
        sys.exit(f"FATAL: {cmd[0]} failed (rc={r.returncode})")


def _fresh_dir(path, overwrite):
    if os.path.exists(path) and os.listdir(path):
        if not overwrite:
            sys.exit(f"refusing to replace non-empty '{path}' "
                     f"(pass --overwrite)")
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def extract_frames(video, images_dir, fps=3.0, time_slice="",
                   overwrite=False):
    """Video -> image folder via ffmpeg (reference run_ffmpeg, :53-76)."""
    if shutil.which("ffmpeg") is None:
        sys.exit("ffmpeg not found on PATH (needed for --video)")
    _fresh_dir(images_dir, overwrite)
    vf = f"fps={fps or 1.0}"
    if time_slice:
        t0, t1 = time_slice.split(",")
        vf += f",select='between(t,{t0},{t1})'"
    _run(["ffmpeg", "-y", "-i", video, "-qscale:v", "1", "-qmin", "1",
          "-vf", vf, os.path.join(images_dir, "%04d.jpg")])


def run_colmap_pipeline(images_dir, workdir, matcher="exhaustive",
                        estimate_affine_shape=False, overwrite=False):
    """Image folder -> sparse TXT model via the COLMAP CLI (reference
    run_colmap, :78-100: feature_extractor, <matcher>_matcher, mapper,
    bundle_adjuster w/ principal-point refine, model_converter TXT).
    Returns the text-model directory."""
    if shutil.which("colmap") is None:
        sys.exit("colmap not found on PATH (needed for --run_colmap)")
    db = os.path.join(workdir, "colmap.db")
    sparse = os.path.join(workdir, "sparse")
    text = os.path.join(workdir, "colmap_text")
    os.makedirs(workdir, exist_ok=True)
    if os.path.exists(db):
        if not overwrite:
            sys.exit(f"refusing to replace '{db}' (pass --overwrite)")
        os.remove(db)
    _fresh_dir(sparse, overwrite)
    _fresh_dir(text, overwrite)
    eas = "1" if estimate_affine_shape else "0"
    _run(["colmap", "feature_extractor",
          "--ImageReader.camera_model", "OPENCV",
          "--ImageReader.single_camera", "1",
          "--SiftExtraction.estimate_affine_shape", eas,
          "--SiftExtraction.domain_size_pooling", eas,
          "--database_path", db, "--image_path", images_dir])
    _run(["colmap", f"{matcher}_matcher",
          "--SiftMatching.guided_matching", eas,
          "--database_path", db])
    _run(["colmap", "mapper", "--database_path", db,
          "--image_path", images_dir, "--output_path", sparse])
    _run(["colmap", "bundle_adjuster",
          "--input_path", os.path.join(sparse, "0"),
          "--output_path", os.path.join(sparse, "0"),
          "--BundleAdjustment.refine_principal_point", "1"])
    _run(["colmap", "model_converter",
          "--input_path", os.path.join(sparse, "0"),
          "--output_path", text, "--output_type", "TXT"])
    return text


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
        lines = [l for l in f if not l.startswith("#")]
    # alternating IMAGE / POINTS2D records; a POINTS2D line may be EMPTY
    # (image with zero observations), so blank lines must stay in the
    # stream until pairing — filtering them first desyncs the records.
    img_lines = []
    expect_image = True
    for l in lines:
        if expect_image:
            if not l.strip():
                continue  # stray separator before an image record
            img_lines.append(l)
            expect_image = False
        else:
            expect_image = True
    for line in img_lines:
        p = line.split()
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
                    help="dir with cameras.txt/images.txt (set automatically "
                         "with --run_colmap)")
    ap.add_argument("--images", default="images")
    ap.add_argument("--out", default="transforms.json")
    ap.add_argument("--aabb_scale", type=int, default=16)
    ap.add_argument("--video", default="",
                    help="extract frames from this video into --images first")
    ap.add_argument("--video_fps", type=float, default=3.0)
    ap.add_argument("--time_slice", default="",
                    help="'t0,t1' seconds of the video to use")
    ap.add_argument("--run_colmap", action="store_true",
                    help="run the COLMAP pipeline on --images first")
    ap.add_argument("--colmap_matcher", default="exhaustive",
                    choices=["exhaustive", "sequential", "spatial",
                             "transitive", "vocab_tree"])
    ap.add_argument("--estimate_affine_shape", action="store_true")
    ap.add_argument("--workdir", default=".",
                    help="where --run_colmap puts db/sparse/text outputs")
    ap.add_argument("--hold", type=int, default=0,
                    help="also write transforms_train/_val.json holding out "
                         "every Nth frame for validation")
    ap.add_argument("--dynamic", action="store_true",
                    help="add per-frame 'time' in [0,1] from frame order "
                         "(D-NeRF-style captures)")
    ap.add_argument("--overwrite", action="store_true",
                    help="replace existing ffmpeg/COLMAP outputs without "
                         "prompting")
    args = ap.parse_args()

    if args.video:
        extract_frames(args.video, args.images, fps=args.video_fps,
                       time_slice=args.time_slice, overwrite=args.overwrite)
    if args.run_colmap:
        args.text = run_colmap_pipeline(
            args.images, args.workdir, matcher=args.colmap_matcher,
            estimate_affine_shape=args.estimate_affine_shape,
            overwrite=args.overwrite)

    cams = parse_cameras(os.path.join(args.text, "cameras.txt"))
    images = parse_images(os.path.join(args.text, "images.txt"))
    cam0 = cams[images[0][1]]

    # colmap (x right, y down, z fwd) -> nerf (x right, y up, z back)
    flip = np.diag([1, -1, -1, 1.0])
    frames = []
    centers = []
    images = sorted(images, key=lambda it: it[0])  # frame order for --dynamic
    for fi, (name, cam_id, c2w) in enumerate(images):
        m = c2w @ flip
        centers.append(m[:3, 3])
        fr = {"file_path": os.path.join(args.images, name),
              "transform_matrix": m}
        if args.dynamic:
            fr["time"] = fi / max(len(images) - 1, 1)
        frames.append(fr)
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

    if args.hold > 0:
        base, ext = os.path.splitext(args.out)
        val = [fr for i, fr in enumerate(frames) if i % args.hold == 0]
        train = [fr for i, fr in enumerate(frames) if i % args.hold != 0]
        for split, frs in (("train", train), ("val", val)):
            path = f"{base}_{split}{ext}"
            with open(path, "w") as f:
                json.dump({**out, "frames": frs}, f, indent=1)
            print(f"wrote {path} with {len(frs)} frames")


if __name__ == "__main__":
    main()
