"""Generate the checked-in Blender-format micro dataset (tests/fixtures/).

VERDICT r2 item 9: no NeRF dataset ships in this image, so the first contact
of `NeRFDataset.load` with a real transforms_{split}.json tree would be on
user data. This script renders the procedural SyntheticScene from a few
orbit poses and writes a real Blender-layout scene (transforms_train/val/
test.json + PNGs) that tests load through the full provider path
(nerf_matrix_to_ngp conversion included).

The stored camera matrices are in the NeRF/Blender convention — the exact
INVERSE of nerf_matrix_to_ngp at scale=1 — so the loader reproduces the
poses the images were rendered from.

Usage: python scripts/make_blender_fixture.py [out_dir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ngp_to_nerf_matrix(p: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Inverse of data/provider.nerf_matrix_to_ngp (same axis cycle back)."""
    flip = np.array([1, -1, -1], np.float32)
    out = np.eye(4, dtype=np.float32)
    out[1, :3] = p[0, :3] * flip
    out[1, 3] = p[0, 3] / scale
    out[2, :3] = p[1, :3] * flip
    out[2, 3] = p[1, 3] / scale
    out[0, :3] = p[2, :3] * flip
    out[0, 3] = p[2, 3] / scale
    return out


def main(out_dir: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2

    from seal3d_tpu.data.provider import rand_poses
    from seal3d_tpu.data.synthetic import SyntheticScene

    h = w = 64
    fov_deg = 50.0
    fx = 0.5 * w / np.tan(0.5 * np.deg2rad(fov_deg))
    intr = np.array([fx, fx, w / 2.0, h / 2.0], np.float32)
    camera_angle_x = 2.0 * np.arctan(0.5 * w / fx)

    scene = SyntheticScene()
    rng = np.random.default_rng(11)
    splits = {"train": 4, "val": 1, "test": 1}
    poses_all = rand_poses(rng, sum(splits.values()), radius=2.2,
                           theta_range=(40, 110))
    os.makedirs(out_dir, exist_ok=True)
    idx = 0
    for split, n in splits.items():
        frames = []
        for k in range(n):
            pose_ngp = poses_all[idx]
            img, _ = scene.render_view(pose_ngp, intr, h, w)
            img8 = np.asarray(np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
            name = f"r_{split}_{k}"
            cv2.imwrite(os.path.join(out_dir, name + ".png"),
                        img8[..., ::-1])  # RGB -> BGR
            frames.append({
                "file_path": name,
                "transform_matrix": ngp_to_nerf_matrix(pose_ngp).tolist(),
            })
            idx += 1
        meta = {"camera_angle_x": float(camera_angle_x), "frames": frames}
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f, indent=1)
    # the ngp-convention poses, for the loader round-trip test
    np.save(os.path.join(out_dir, "poses_ngp.npy"),
            poses_all.astype(np.float32))
    print(f"wrote {idx} views to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "blender_micro"))
