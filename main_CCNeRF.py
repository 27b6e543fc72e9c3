"""CCNeRF training / compression / composition CLI
(equivalent of reference main_CCNeRF.py)."""

import os

import jax
import numpy as np

from seal3d_tpu.config import (enable_compile_cache,
                               build_options, build_train_config,
                               common_parser, load_dataset)
from seal3d_tpu.models import ccnerf
from seal3d_tpu.models.ccnerf import CCNeRFConfig
from seal3d_tpu.train.cc_trainer import CCNeRFTrainer
from seal3d_tpu.utils.seeding import seed_everything


def main():
    parser = common_parser("seal3d-tpu CCNeRF")
    parser.add_argument("--rank_vec_density", type=int, nargs="*", default=[8, 8, 8])
    parser.add_argument("--rank_mat_density", type=int, nargs="*", default=[0, 16, 24])
    parser.add_argument("--rank_vec", type=int, nargs="*", default=[24, 24, 24])
    parser.add_argument("--rank_mat", type=int, nargs="*", default=[0, 48, 72])
    parser.add_argument("--compress", type=int, nargs=4, default=None,
                        help="(vd, md, vc, mc) top-rank slice after training")
    parser.add_argument("--compose", type=str, nargs="*", default=None,
                        help="checkpoints of other objects to compose in")
    args = parser.parse_args()
    enable_compile_cache()
    seed_everything(args.seed)

    fcfg = CCNeRFConfig(bound=args.bound,
                        rank_vec_density=tuple(args.rank_vec_density),
                        rank_mat_density=tuple(args.rank_mat_density),
                        rank_vec=tuple(args.rank_vec),
                        rank_mat=tuple(args.rank_mat))
    opts = build_options(args)
    tcfg = build_train_config(args, family="tensorf")
    ds = load_dataset(args, "trainval" if not args.test else "test")
    tr = CCNeRFTrainer(fcfg, opts, tcfg, dataset=ds,
                       key=jax.random.PRNGKey(args.seed))
    tr.init_state()

    if args.ckpt and args.ckpt != "scratch":
        from seal3d_tpu.train import checkpoint as ckpt_io

        path = args.ckpt
        if path == "latest":
            path = ckpt_io.latest_checkpoint(
                os.path.join(tcfg.workspace, "checkpoints"), "ccnerf")
        if path and os.path.exists(path):
            tr.load_checkpoint(path)
            print(f"[ckpt] loaded {path}")

    if not args.test:
        tr.train(steps=args.iters)
        tr.save_checkpoint()
        val_ds = load_dataset(args, "val")
        print(f"[eval] PSNR {tr.evaluate(dataset=val_ds):.2f} "
              f"over {len(val_ds)} val views")

    if args.compress:
        tr.state = tr.state._replace(
            params=ccnerf.compress(tr.state.params, tuple(args.compress)))
        print(f"[compress] ranks -> {args.compress}")

    if args.compose:
        from seal3d_tpu.train import checkpoint as ckpt_io

        scene_params = ccnerf.finalize(tr.state.params)
        for i, path in enumerate(args.compose):
            other_tr = CCNeRFTrainer(fcfg, opts, tcfg, dataset=ds,
                                     key=jax.random.PRNGKey(i))
            other_tr.init_state()
            other_tr.load_checkpoint(path)
            scene_params = ccnerf.compose(scene_params, other_tr.state.params,
                                          t=np.array([0.4 * (i + 1), 0, 0]))
        tr.state = tr.state._replace(params=scene_params)
        print(f"[compose] scene with {1 + len(args.compose)} objects")

    out_dir = os.path.join(tcfg.workspace, "results")
    test_ds = load_dataset(args, "test")
    from seal3d_tpu.train.video import write_test_outputs

    written = write_test_outputs(
        lambda vi: tr.render_image(test_ds.poses[vi], test_ds.h, test_ds.w,
                                   use_ema=False),
        len(test_ds), out_dir, "ccnerf")
    print(f"[test] wrote {len(test_ds)} views to {out_dir} "
          f"(video: {written['video']})")


if __name__ == "__main__":
    main()
