"""D-NeRF (dynamic scenes) CLI (equivalent of reference main_dnerf.py)."""

import os

import jax
import numpy as np

from seal3d_tpu.config import (build_options, build_train_config,
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
    args = parser.parse_args()
    seed_everything(args.seed)
    backend, log2t = grid_defaults(args)

    fcfg = DNeRFConfig(bound=args.bound, variant=args.variant,
                       log2_hashmap_size=log2t, grid_backend=backend,
                       gridtype="tiled" if backend == "xla" else "hash")
    opts = build_options(args)
    tcfg = build_train_config(args)
    ds = load_dataset(args, "trainval" if not args.test else "test")

    tr = DNeRFTrainer(fcfg, opts, tcfg, dataset=ds,
                      key=jax.random.PRNGKey(args.seed),
                      time_size=args.time_size, deform_reg=args.deform_reg,
                      use_dense=args.dense_render)
    tr.init_state()

    if not args.test:
        tr.train(steps=args.iters, blocked=not args.dense_render)
        tr.save_checkpoint()
        print(f"[eval] PSNR {tr.evaluate(max_views=4):.2f}")

    test_ds = load_dataset(args, "test")
    times = (test_ds.times if test_ds.times is not None
             else np.linspace(0, 1, len(test_ds)))
    out_dir = os.path.join(tcfg.workspace, "results")
    os.makedirs(out_dir, exist_ok=True)
    import imageio

    for vi in range(min(len(test_ds), 8)):
        img, _ = tr.render_image_t(test_ds.poses[vi], test_ds.h, test_ds.w,
                                   float(times[vi]))
        imageio.imwrite(os.path.join(out_dir, f"dnerf_{vi:04d}_rgb.png"),
                        (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8))
    print(f"[test] wrote results to {out_dir}")


if __name__ == "__main__":
    main()
