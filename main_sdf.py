"""SDF fitting CLI (equivalent of reference main_sdf.py)."""

import argparse
import os

import jax

from seal3d_tpu.config import enable_compile_cache

from seal3d_tpu.data.sdf_provider import SDFDataset
from seal3d_tpu.models.sdf import SDFConfig
from seal3d_tpu.train.sdf_trainer import SDFTrainer
from seal3d_tpu.utils.seeding import seed_everything


def main():
    p = argparse.ArgumentParser(description="seal3d-tpu SDF fitting")
    p.add_argument("path", type=str, help="mesh path (.obj/.ply) or 'synthetic'")
    p.add_argument("--workspace", type=str, default="workspace_sdf")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--num_points", type=int, default=16384)
    p.add_argument("--log2_hashmap_size", type=int, default=19)
    p.add_argument("--clip_sdf", type=float, default=None)
    p.add_argument("--test", action="store_true")
    p.add_argument("--mesh_resolution", type=int, default=256)
    args = p.parse_args()
    enable_compile_cache()
    seed_everything(args.seed)

    if args.path == "synthetic":
        import numpy as np

        from seal3d_tpu.seal.geometry import box_mesh_from_aabb

        verts, faces = box_mesh_from_aabb(np.array([[-1, -1, -1], [1, 1, 1.0]]))
        ds = SDFDataset(verts=verts, faces=faces, scale=0.6, seed=args.seed)
    else:
        ds = SDFDataset(mesh_path=args.path, seed=args.seed)

    cfg = SDFConfig(log2_hashmap_size=args.log2_hashmap_size,
                    clip_sdf=args.clip_sdf)
    tr = SDFTrainer(cfg, ds, lr=args.lr, num_points=args.num_points,
                    key=jax.random.PRNGKey(args.seed),
                    workspace=args.workspace)
    if not args.test:
        tr.train(steps=args.iters)
    print(f"[eval] SDF MAE = {tr.evaluate():.5f}")
    os.makedirs(args.workspace, exist_ok=True)
    tr.save_mesh(os.path.join(args.workspace, "sdf_mesh.ply"),
                 resolution=args.mesh_resolution)
    print(f"[mesh] wrote {args.workspace}/sdf_mesh.ply")


if __name__ == "__main__":
    main()
