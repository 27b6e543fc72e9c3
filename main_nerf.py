"""NGP NeRF training/eval CLI (equivalent of reference main_nerf.py)."""

import os

import jax

from seal3d_tpu.config import (enable_compile_cache,
                               build_options, build_train_config,
                               common_parser, grid_defaults, load_dataset)
from seal3d_tpu.models import ngp
from seal3d_tpu.models.ngp import NGPConfig
from seal3d_tpu.train import checkpoint as ckpt_io
from seal3d_tpu.train.trainer import Trainer
from seal3d_tpu.utils.seeding import seed_everything


def main():
    parser = common_parser("seal3d-tpu NGP NeRF")
    # CLIP-guided random-pose training (reference main_nerf.py:63-64)
    parser.add_argument("--clip_text", type=str, default="",
                        help="text prompt for CLIP guidance")
    parser.add_argument("--clip_model_path", type=str, default=None,
                        help="local transformers CLIP checkpoint dir "
                             "(no network egress: weights must be on disk)")
    parser.add_argument("--clip_random_init", action="store_true",
                        help="random-weight CLIP (smoke/demo: the guidance "
                             "math runs, the direction is meaningless)")
    parser.add_argument("--rand_pose", type=int, default=-1,
                        help="<0 off, 0 = every step CLIP-guided rand pose, "
                             ">0 one guided step per N gt steps")
    args = parser.parse_args()
    enable_compile_cache()
    seed_everything(args.seed)
    backend, log2t, gridtype = grid_defaults(args)

    fcfg = NGPConfig(bound=args.bound, log2_hashmap_size=log2t,
                     grid_backend=backend, gridtype=gridtype,
                     bg_radius=args.bg_radius)
    opts = build_options(args)
    tcfg = build_train_config(args)
    ds = load_dataset(args, "trainval" if not args.test else "test")

    clip_loss = None
    if args.clip_text and args.rand_pose >= 0:
        from seal3d_tpu.utils.clip_guidance import CLIPLoss

        clip_loss = CLIPLoss(args.clip_text,
                             model_path=args.clip_model_path,
                             random_init=args.clip_random_init)
        if not clip_loss.available:
            raise SystemExit("--clip_text needs --clip_model_path (local "
                             "weights) or --clip_random_init")
        import dataclasses

        tcfg = dataclasses.replace(tcfg, rand_pose=args.rand_pose)

    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds,
                 key=jax.random.PRNGKey(args.seed),
                 use_dense=args.dense_render, name="ngp",
                 clip_loss=clip_loss)
    tr.init_state()

    if args.ckpt and args.ckpt != "scratch":
        path = args.ckpt
        if path == "latest" and tcfg.workspace:
            path = ckpt_io.latest_checkpoint(
                os.path.join(tcfg.workspace, "checkpoints"), "ngp")
        if path and os.path.exists(path):
            if path.endswith(".pth"):
                tr.state = tr.state._replace(
                    params=ckpt_io.import_torch_ngp(
                        path, tr.state.params, grid_cfg=fcfg.grid))
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
        val_ds = load_dataset(args, "val")
        psnr = tr.evaluate(dataset=val_ds)  # full split (nerf/utils.py:905-1013)
        print(f"[eval] PSNR {psnr:.2f} over {len(val_ds)} val views")

    test_ds = load_dataset(args, "test")
    if args.test:
        tr.attach_dataset(test_ds)
    out_dir = os.path.join(tcfg.workspace, "results")
    from seal3d_tpu.train.video import write_test_outputs

    written = write_test_outputs(
        lambda vi: tr.render_image(test_ds.poses[vi], test_ds.h, test_ds.w),
        len(test_ds), out_dir, "ngp")
    print(f"[test] wrote {len(test_ds)} views to {out_dir} "
          f"(video: {written['video']})")

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
