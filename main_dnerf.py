"""D-NeRF (dynamic scenes) CLI (equivalent of reference main_dnerf.py)."""

import os
import dataclasses

import jax
import numpy as np

from seal3d_tpu.config import (enable_compile_cache,
                               build_options, build_train_config,
                               common_parser, grid_defaults, load_dataset)
from seal3d_tpu.models.dnerf import DNeRFConfig
from seal3d_tpu.train.dnerf_trainer import DNeRFTrainer
from seal3d_tpu.utils.seeding import seed_everything


def main():
    parser = common_parser("seal3d-tpu D-NeRF")
    parser.add_argument("--variant", type=str, default="deform",
                        choices=["deform", "basis", "hyper"])
    parser.add_argument("--time_size", type=int, default=64)
    parser.add_argument("--deform_reg", type=float, default=0.0)
    parser.add_argument("--sigma_reg", type=float, default=0.0,
                        help="L1 density sparsity at random points (floater "
                             "suppression for sparse-view dynamic captures)")
    parser.add_argument("--time_multires", type=int, default=6,
                        help="frequency octaves of the time encoding "
                             "(reference default 6; LOW values force the "
                             "warp to vary smoothly in time, which shares "
                             "geometry constraints across frames — use 1-2 "
                             "for sparse-view dynamic captures)")
    args = parser.parse_args()
    enable_compile_cache()
    seed_everything(args.seed)
    backend, log2t, gridtype = grid_defaults(args)

    fcfg = DNeRFConfig(bound=args.bound, variant=args.variant,
                       log2_hashmap_size=log2t, grid_backend=backend,
                       gridtype="tiled" if backend == "xla" else gridtype,
                       time_multires=args.time_multires)
    opts = build_options(args)
    tcfg = build_train_config(args)
    # reference D-NeRF trains MLPs at lr_net = lr/10 (main_dnerf.py:25)
    tcfg = dataclasses.replace(tcfg, lr_net_scale=0.1)
    ds = load_dataset(args, "trainval" if not args.test else "test")

    tr = DNeRFTrainer(fcfg, opts, tcfg, dataset=ds,
                      key=jax.random.PRNGKey(args.seed),
                      time_size=args.time_size, deform_reg=args.deform_reg,
                      sigma_reg=args.sigma_reg,
                      use_dense=args.dense_render)
    tr.init_state()

    if args.gui:
        # time-aware viewer (reference dnerf/gui.py: NeRFGUI + time slider)
        from seal3d_tpu.gui import launch_gui

        launch_gui(args, tr)
        return

    if not args.test:
        tr.train(steps=args.iters, blocked=not args.dense_render)
        tr.save_checkpoint()
        val_ds = load_dataset(args, "val")
        print(f"[eval] PSNR {tr.evaluate(dataset=val_ds):.2f} "
              f"over {len(val_ds)} val views")

    test_ds = load_dataset(args, "test")
    times = (test_ds.times if test_ds.times is not None
             else np.linspace(0, 1, len(test_ds)))
    out_dir = os.path.join(tcfg.workspace, "results")
    from seal3d_tpu.train.video import write_test_outputs

    written = write_test_outputs(
        lambda vi: tr.render_image_t(test_ds.poses[vi], test_ds.h, test_ds.w,
                                     float(times[vi])),
        len(test_ds), out_dir, "dnerf")
    print(f"[test] wrote {len(test_ds)} views to {out_dir} "
          f"(video: {written['video']})")


if __name__ == "__main__":
    main()
