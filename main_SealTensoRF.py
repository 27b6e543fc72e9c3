"""Seal-3D editing CLI, TensoRF backbone
(equivalent of reference main_SealTensoRF.py)."""

import jax

from main_SealNeRF import add_seal_args, run_seal
from seal3d_tpu.config import enable_compile_cache, build_options, common_parser
from seal3d_tpu.models import tensorf
from seal3d_tpu.models.tensorf import TensoRFConfig
from seal3d_tpu.train.tensorf_trainer import TensoRFTrainer


def main():
    parser = add_seal_args(common_parser("seal3d-tpu Seal editing (TensoRF)"))
    parser.add_argument("--cp", action="store_true")
    parser.add_argument("--resolution0", type=int, default=128)
    args = parser.parse_args()
    enable_compile_cache()
    fcfg = TensoRFConfig(bound=args.bound,
                         decomposition="cp" if args.cp else "vm",
                         resolution=(args.resolution0,) * 3)

    def make_trainer(tcfg, ds, name):
        return TensoRFTrainer(fcfg, build_options(args), tcfg, dataset=ds,
                              key=jax.random.PRNGKey(args.seed), name=name,
                              upsample_steps=(), shrink_step=None,
                              use_dense=args.dense_render)

    run_seal(args, tensorf, fcfg, make_trainer, "sealtensorf", family="tensorf")


if __name__ == "__main__":
    main()
