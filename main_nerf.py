"""NGP NeRF training/eval CLI (equivalent of reference main_nerf.py)."""

import os

import jax
import numpy as np

from seal3d_tpu.config import (build_options, build_train_config,
                               common_parser, grid_defaults, load_dataset)
from seal3d_tpu.models import ngp
from seal3d_tpu.models.ngp import NGPConfig
from seal3d_tpu.train import checkpoint as ckpt_io
from seal3d_tpu.train.trainer import Trainer
from seal3d_tpu.utils.seeding import seed_everything


def main():
    parser = common_parser("seal3d-tpu NGP NeRF")
    args = parser.parse_args()
    seed_everything(args.seed)
    backend, log2t = grid_defaults(args)

    fcfg = NGPConfig(bound=args.bound, log2_hashmap_size=log2t,
                     grid_backend=backend, bg_radius=args.bg_radius)
    opts = build_options(args)
    tcfg = build_train_config(args)
    ds = load_dataset(args, "trainval" if not args.test else "test")

    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds,
                 key=jax.random.PRNGKey(args.seed),
                 use_dense=args.dense_render, name="ngp")
    tr.init_state()

    if args.ckpt and args.ckpt != "scratch":
        path = args.ckpt
        if path == "latest" and tcfg.workspace:
            path = ckpt_io.latest_checkpoint(
                os.path.join(tcfg.workspace, "checkpoints"), "ngp")
        if path and os.path.exists(path):
            if path.endswith(".pth"):
                tr.state = tr.state._replace(
                    params=ckpt_io.import_torch_ngp(path, tr.state.params))
            else:
                tr.load_checkpoint(path)
            print(f"[ckpt] loaded {path}")

    if args.gui:
        from seal3d_tpu.gui import launch_gui

        launch_gui(args, tr)
        return

    if not args.test:
        tr.train(steps=args.iters, blocked=not args.dense_render)
        tr.save_checkpoint()
        psnr = tr.evaluate(max_views=4)
        print(f"[eval] PSNR {psnr:.2f}")

    test_ds = load_dataset(args, "test")
    tr.attach_dataset(test_ds) if args.test else None
    out_dir = os.path.join(tcfg.workspace, "results")
    os.makedirs(out_dir, exist_ok=True)
    import imageio

    frames = []
    for vi in range(min(len(test_ds), 16)):
        img, _ = tr.render_image(test_ds.poses[vi], test_ds.h, test_ds.w)
        frames.append((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(out_dir, f"ngp_{vi:04d}_rgb.png"), frames[-1])
    try:
        imageio.mimwrite(os.path.join(out_dir, "ngp_rgb.mp4"), frames, fps=12)
    except Exception:
        pass
    print(f"[test] wrote {len(frames)} views to {out_dir}")

    if args.save_mesh:
        from seal3d_tpu.runtime.mesh_export import extract_geometry, save_mesh

        verts, tris = extract_geometry(
            lambda x: ngp.density(tr.state.ema_params, fcfg, x)["sigma"],
            bound=args.bound, resolution=args.mesh_resolution,
            threshold=min(10.0, float(tr.state.occ.mean_density)))
        save_mesh(os.path.join(tcfg.workspace, "meshes", "ngp.ply"), verts, tris)
        print(f"[mesh] {len(verts)} verts, {len(tris)} tris")


if __name__ == "__main__":
    main()
