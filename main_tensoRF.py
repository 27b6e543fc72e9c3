"""TensoRF (VM/CP) training CLI (equivalent of reference main_tensoRF.py)."""

import os

import jax

from seal3d_tpu.config import (enable_compile_cache,
                               build_options, build_train_config,
                               common_parser, load_dataset)
from seal3d_tpu.models.tensorf import TensoRFConfig
from seal3d_tpu.train.tensorf_trainer import TensoRFTrainer
from seal3d_tpu.utils.seeding import seed_everything


def main():
    parser = common_parser("seal3d-tpu TensoRF")
    parser.add_argument("--cp", action="store_true", help="CP decomposition")
    parser.add_argument("--resolution0", type=int, default=128)
    parser.add_argument("--resolution1", type=int, default=300)
    parser.add_argument("--l1_reg_weight", type=float, default=1e-4)
    parser.add_argument("--upsample_model_steps", type=int, nargs="*",
                        default=[2000, 3000, 4000, 5500, 7000])
    args = parser.parse_args()
    enable_compile_cache()
    seed_everything(args.seed)

    fcfg = TensoRFConfig(
        bound=args.bound, decomposition="cp" if args.cp else "vm",
        resolution=(args.resolution0,) * 3, bg_radius=args.bg_radius)
    opts = build_options(args)
    tcfg = build_train_config(args, family="tensorf")
    ds = load_dataset(args, "trainval" if not args.test else "test")

    tr = TensoRFTrainer(fcfg, opts, tcfg, dataset=ds,
                        key=jax.random.PRNGKey(args.seed),
                        l1_weight=args.l1_reg_weight,
                        upsample_steps=tuple(args.upsample_model_steps),
                        n_voxel_init=args.resolution0**3,
                        n_voxel_final=args.resolution1**3,
                        use_dense=args.dense_render)
    tr.init_state()

    if args.ckpt and args.ckpt != "scratch":
        from seal3d_tpu.train import checkpoint as ckpt_io

        path = args.ckpt
        if path == "latest":
            path = ckpt_io.latest_checkpoint(
                os.path.join(tcfg.workspace, "checkpoints"), "tensorf")
        if path and os.path.exists(path):
            tr.load_checkpoint(path)
            print(f"[ckpt] loaded {path}")

    if not args.test:
        tr.train(steps=args.iters, blocked=not args.dense_render)
        tr.save_checkpoint()
        val_ds = load_dataset(args, "val")
        print(f"[eval] PSNR {tr.evaluate(dataset=val_ds):.2f} "
              f"over {len(val_ds)} val views")

    test_ds = load_dataset(args, "test")
    out_dir = os.path.join(tcfg.workspace, "results")
    from seal3d_tpu.train.video import write_test_outputs

    written = write_test_outputs(
        lambda vi: tr.render_image(test_ds.poses[vi], test_ds.h, test_ds.w),
        len(test_ds), out_dir, "tensorf")
    print(f"[test] wrote {len(test_ds)} views to {out_dir} "
          f"(video: {written['video']})")


if __name__ == "__main__":
    main()
