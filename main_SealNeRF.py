"""Seal-3D interactive editing CLI, NGP backbone
(equivalent of reference main_SealNeRF.py): load/train a teacher, build the
proxy mapper from a seal_config, distill into a student with the two-stage
schedule, render results."""

import os

import jax

from seal3d_tpu.config import (enable_compile_cache,
                               build_options, build_train_config,
                               common_parser, grid_defaults, load_dataset)
from seal3d_tpu.models import ngp
from seal3d_tpu.models.ngp import NGPConfig
from seal3d_tpu.seal.mappers import build_mapper, load_mapper_config
from seal3d_tpu.seal.trainer import PretrainConfig, SealTrainer
from seal3d_tpu.train import checkpoint as ckpt_io
from seal3d_tpu.train.trainer import Trainer
from seal3d_tpu.utils.seeding import seed_everything


def add_seal_args(parser):
    parser.add_argument("--seal_config", type=str, required=True,
                        help="dir containing seal.json (json5 edit config)")
    parser.add_argument("--teacher_workspace", type=str, default="workspace")
    parser.add_argument("--teacher_ckpt", type=str, default="latest")
    parser.add_argument("--train_teacher", type=int, default=0,
                        help="train the teacher for N steps first (no ckpt)")
    parser.add_argument("--pretraining_epochs", type=int, default=100)
    parser.add_argument("--pretraining_batch_size", type=int, default=2**19)
    parser.add_argument("--pretraining_lr", type=float, default=0.05)
    parser.add_argument("--pretraining_local_point_step", type=float, default=0.005)
    parser.add_argument("--pretraining_surrounding_point_step", type=float, default=0.01)
    parser.add_argument("--pretraining_global_point_step", type=float, default=0.05)
    parser.add_argument("--extra_epochs", type=int, default=0,
                        help="finetune steps after pretraining (0 = none)")
    parser.add_argument("--pretraining_only", action="store_true")
    parser.add_argument("--custom_pose", action="store_true",
                        help="use edit-centered random poses for finetuning")
    parser.add_argument("--secondary_teacher_ckpt", type=str, default=None,
                        help="checkpoint of a second teacher model answering "
                             "mapped-region queries (cross-scene editing, "
                             "reference SealNeRF/renderer.py:306-309)")
    return parser


def run_seal(args, field_mod, fcfg, make_trainer, name, family: str = "ngp"):
    seed_everything(args.seed)
    opts = build_options(args)
    tcfg = build_train_config(args, family=family)
    ds = load_dataset(args, "trainval")

    # ---- teacher
    teacher_tcfg = build_train_config(args, family=family)
    teacher_tcfg.workspace = args.teacher_workspace
    teacher = make_trainer(teacher_tcfg, ds, name=f"{name}_teacher")
    teacher.init_state()
    loaded = False
    if args.teacher_ckpt and args.teacher_ckpt != "scratch":
        path = args.teacher_ckpt
        if path == "latest":
            path = ckpt_io.latest_checkpoint(
                os.path.join(args.teacher_workspace, "checkpoints"),
                f"{name}_teacher")
        if path and os.path.exists(path):
            if path.endswith(".pth"):
                teacher.state = teacher.state._replace(
                    params=ckpt_io.import_torch_ngp(
                        path, teacher.state.params, grid_cfg=fcfg.grid))
            else:
                teacher.load_checkpoint(path)
            loaded = True
            print(f"[teacher] loaded {path}")
    if not loaded or args.train_teacher > 0:
        steps = args.train_teacher or args.iters
        print(f"[teacher] training {steps} steps")
        teacher.train(steps=steps, blocked=not args.dense_render)
        teacher.save_checkpoint()
        print(f"[teacher] PSNR {teacher.evaluate(max_views=2):.2f}")

    # ---- mapper + student
    config = load_mapper_config(args.seal_config)
    mapper = build_mapper(config, workspace=tcfg.workspace)
    secondary = {}
    if getattr(args, "secondary_teacher_ckpt", None):
        sec = make_trainer(teacher_tcfg, ds, name=f"{name}_teacher2")
        sec.init_state()
        sec.load_checkpoint(args.secondary_teacher_ckpt)
        secondary = dict(secondary_field=field_mod, secondary_cfg=fcfg,
                         secondary_params=sec.state.params)
        print(f"[teacher2] loaded {args.secondary_teacher_ckpt}")
    student = SealTrainer(field_mod, fcfg, opts, tcfg, mapper,
                          teacher_params=teacher.state.params,
                          teacher_bitfield=teacher.state.occ.bitfield,
                          dataset=ds, key=jax.random.PRNGKey(args.seed + 1),
                          name=f"{name}_student", **secondary)
    student.init_state()
    if args.custom_pose:
        from seal3d_tpu.seal.provider import seal_random_dataset

        rnd = seal_random_dataset(mapper, 24, ds.h, ds.w, ds.intrinsics,
                                  seed=args.seed)
        student.attach_dataset(rnd)

    pcfg = PretrainConfig(
        epochs=args.pretraining_epochs,
        batch_size=args.pretraining_batch_size,
        lr=args.pretraining_lr,
        local_point_step=args.pretraining_local_point_step,
        surrounding_point_step=args.pretraining_surrounding_point_step,
        global_point_step=args.pretraining_global_point_step)
    finetune = 0 if args.pretraining_only else (args.extra_epochs or args.iters)
    timer = student.train_edit(pcfg, finetune_steps=finetune)
    print(f"[seal] pretraining {timer['pretraining_total']:.1f}s "
          f"+ finetune {timer['training_total']:.1f}s "
          f"(proxy {timer['proxy_dataset']:.1f}s)")
    student.save_checkpoint()

    # ---- results (edited-scene test video, reference nerf/utils.py:682-686)
    out_dir = os.path.join(tcfg.workspace, "results")
    from seal3d_tpu.train.video import write_test_outputs

    test_ds = load_dataset(args, "test")
    written = write_test_outputs(
        lambda vi: student.render_image(test_ds.poses[vi], test_ds.h, test_ds.w),
        len(test_ds), out_dir, name)
    print(f"[test] wrote {len(test_ds)} edited views to {out_dir} "
          f"(video: {written['video']})")

    if args.save_mesh:
        from seal3d_tpu.runtime.mesh_export import extract_geometry, save_mesh

        verts, tris = extract_geometry(
            lambda x: field_mod.density(student.state.params, fcfg, x)["sigma"],
            bound=args.bound, resolution=args.mesh_resolution,
            threshold=min(10.0, float(student.state.occ.mean_density)))
        save_mesh(os.path.join(tcfg.workspace, "meshes", f"{name}.ply"),
                  verts, tris)
    return student


def main():
    parser = add_seal_args(common_parser("seal3d-tpu Seal editing (NGP)"))
    args = parser.parse_args()
    enable_compile_cache()
    backend, log2t, gridtype = grid_defaults(args)
    fcfg = NGPConfig(bound=args.bound, log2_hashmap_size=log2t,
                     grid_backend=backend, gridtype=gridtype,
                     bg_radius=args.bg_radius)

    def make_trainer(tcfg, ds, name):
        return Trainer(ngp, fcfg, build_options(args), tcfg, dataset=ds,
                       key=jax.random.PRNGKey(args.seed), name=name,
                       use_dense=args.dense_render)

    if args.gui:
        from seal3d_tpu.gui import launch_seal_gui

        launch_seal_gui(args, ngp, fcfg, make_trainer)
        return
    run_seal(args, ngp, fcfg, make_trainer, "sealnerf")


if __name__ == "__main__":
    main()
