"""A/B the Seal teacher render operating point: flat-packed (eval_flat_frac)
vs dense [N,K] — the packed path drops trailing rays' samples on global
budget overflow, and the hacked bitfield inflates sample demand, so this
probes whether packing is safe for proxy ground-truth generation.

Usage (after scripts/recipes/run_synthetic_seal_bbox.sh trained a teacher):
    python scripts/probe_teacher_pack.py --teacher workspace_seal
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from seal3d_tpu.data.synthetic import SyntheticScene
from seal3d_tpu.models import ngp
from seal3d_tpu.models.ngp import NGPConfig
from seal3d_tpu.render.renderer import RenderOptions
from seal3d_tpu.seal.mappers import build_mapper, load_mapper_config
from seal3d_tpu.seal.trainer import SealTrainer
from seal3d_tpu.train import checkpoint as ckpt_io
from seal3d_tpu.train.trainer import TrainConfig, Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher", type=str, default="workspace_seal")
    ap.add_argument("--seal_config", type=str, default="seal_config_bbox")
    ap.add_argument("--views", type=int, default=3)
    args = ap.parse_args()

    ds = SyntheticScene().make_dataset(n_views=24, h=128, w=128, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15, grid_backend="halo",
                     gridtype="wrap")
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=48, num_candidates=256,
                         min_near=0.05, coarse_steps=64)
    tcfg = TrainConfig(lr=1e-2, num_rays=4096, random_bg=False,
                       eval_chunk=2**15, eval_budget_per_ray=48,
                       eval_flat_frac=0.375, adaptive_budget=True)
    teacher = Trainer(ngp, fcfg, opts, tcfg, dataset=ds,
                      key=jax.random.PRNGKey(0), name="seal_teacher")
    teacher.init_state()
    path = ckpt_io.latest_checkpoint(
        os.path.join(args.teacher, "checkpoints"), "sealnerf_teacher")
    assert path, f"no teacher ckpt under {args.teacher}"
    teacher.load_checkpoint(path)
    print(f"[probe] teacher {path}")

    mapper = build_mapper(load_mapper_config(args.seal_config))

    def make_student(eval_flat):
        t = TrainConfig(lr=1e-2, num_rays=4096, random_bg=False,
                        eval_chunk=2**15, eval_budget_per_ray=48,
                        eval_flat_frac=eval_flat, adaptive_budget=True)
        return SealTrainer(ngp, fcfg, opts, t, mapper,
                           teacher_params=teacher.state.params,
                           teacher_bitfield=teacher.state.occ.bitfield,
                           dataset=ds, key=jax.random.PRNGKey(1))

    sp = make_student(0.375)
    sd = make_student(None)
    for vi in range(args.views):
        t0 = time.time()
        img_p, dep_p = sp.render_teacher_view(ds.poses[vi])
        tp = time.time() - t0
        t0 = time.time()
        img_d, dep_d = sd.render_teacher_view(ds.poses[vi])
        td = time.time() - t0
        diff = np.abs(img_p - img_d)
        mse = float((diff ** 2).mean())
        psnr = -10 * np.log10(max(mse, 1e-12))
        print(f"[view {vi}] packed {tp:.2f}s dense {td:.2f}s | "
              f"maxdiff {diff.max():.4f} mean {diff.mean():.5f} "
              f"agreement {psnr:.1f} dB | "
              f"depth maxdiff {np.abs(dep_p - dep_d).max():.4f}")


if __name__ == "__main__":
    main()
