"""TensoRF-specific trainer: upsample schedule, shrink, L1 reg, dual LRs.

Equivalent of reference tensoRF/utils.py:8-130: two LR groups (tensor factors
at lr1, basis/color nets at lr2), an L1 sparsity weight that relaxes after
upsampling, a log-spaced voxel upsample schedule with optimizer re-init, and
a one-shot aabb shrink. Because factor shapes change, each resolution stage
re-jits the train step (one recompile per stage — same cadence at which the
reference rebuilds its optimizer)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seal3d_tpu.models import tensorf
from seal3d_tpu.train.trainer import TrainConfig, Trainer


def tensorf_optimizer(cfg: TrainConfig, lr_factor: float = 2e-2,
                      lr_net: float = 1e-3):
    """Per-group LRs (reference get_params(lr1, lr2), tensoRF/network.py:322)."""

    def label(params):
        return {k: ("net" if k in ("basis_mat", "color_net", "bg_net") else
                    "frozen" if k == "aabb" else "factor")
                for k in params}

    def make(lr):
        sched = lambda s: lr * (0.1 ** jnp.minimum(s / cfg.max_steps, 1.0))
        return optax.chain(optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
                           optax.scale_by_schedule(lambda s: -sched(s)))

    return optax.multi_transform(
        {"factor": make(lr_factor), "net": make(lr_net),
         "frozen": optax.set_to_zero()}, label)


class TensoRFTrainer(Trainer):
    def __init__(self, field_cfg: tensorf.TensoRFConfig, opts, cfg: TrainConfig,
                 dataset=None, key=None, mesh=None, name: str = "tensorf",
                 l1_weight: float = 1e-4, l1_weight_rest: float = 0.0,
                 lr_factor: float = 2e-2, lr_net: float = 1e-3,
                 upsample_steps: Sequence[int] = (2000, 3000, 4000, 5500, 7000),
                 n_voxel_init: int = 128**3, n_voxel_final: int = 300**3,
                 shrink_step: Optional[int] = 1000, use_dense: bool = False):
        self._l1 = {"w": l1_weight}
        self.l1_weight_rest = l1_weight_rest
        self.lr_factor = lr_factor
        self.lr_net = lr_net
        self.upsample_schedule = self._voxel_schedule(
            upsample_steps, n_voxel_init, n_voxel_final)
        self.shrink_step = shrink_step

        l1 = self._l1

        def reg(params):
            return l1["w"] * tensorf.density_loss(params, field_cfg)

        super().__init__(tensorf, field_cfg, opts, cfg, dataset=dataset,
                         key=key, mesh=mesh, use_dense=use_dense, name=name,
                         reg_fn=reg,
                         optimizer=tensorf_optimizer(cfg, lr_factor, lr_net))

    def load_checkpoint(self, path: str):
        """Resolution-aware load: .pth checkpoints (reference format) carry
        resolution metadata and are re-instantiated at checkpoint shape
        (tensoRF/utils.py:328-356 analog); .npz loads may also carry
        post-upsample/shrink factor shapes, which load_state accepts
        leaf-wise (the jit caches retrace per shape)."""
        if path.endswith(".pth"):
            from seal3d_tpu.train import checkpoint as ckpt_io

            params, res = ckpt_io.import_torch_tensorf(path, self.fcfg)
            if self.state is None:
                self.init_state()
            self.state = self.state._replace(
                params=params,
                opt_state=self.optimizer.init(params),
                ema_params=jax.tree.map(jnp.copy, params))
            print(f"[ckpt] torch tensorf checkpoint at resolution {res}")
            return self.state
        return super().load_checkpoint(path)

    @staticmethod
    def _voxel_schedule(steps, n_init, n_final):
        if not steps:
            return {}
        ns = np.round(np.exp(np.linspace(np.log(n_init), np.log(n_final),
                                         len(steps) + 1))).astype(np.int64)[1:]
        return dict(zip(steps, ns))

    def maybe_resize(self, step: int):
        """Apply shrink/upsample milestones; re-init optimizer + re-jit."""
        changed = False
        if self.shrink_step is not None and step == self.shrink_step:
            occ = self.state.occ
            params = tensorf.shrink_model(
                self.state.params, self.fcfg, np.asarray(occ.density_grid),
                float(occ.mean_density), self.cfg.density_thresh)
            self.state = self.state._replace(params=params)
            changed = True
        if step in self.upsample_schedule:
            reso = tensorf.n_to_reso(int(self.upsample_schedule[step]),
                                     self.state.params["aabb"])
            params = tensorf.upsample_model(self.state.params, self.fcfg, reso)
            self.state = self.state._replace(params=params)
            # relax L1 after first upsample (reference tensoRF/utils.py:47)
            self._l1["w"] = self.l1_weight_rest
            changed = True
        if changed:
            self.state = self.state._replace(
                params=jax.tree.map(jnp.asarray, self.state.params),
                opt_state=self.optimizer.init(self.state.params),
                ema_params=jax.tree.map(jnp.copy, self.state.params))
            self._build_steps()  # shapes changed -> fresh jit cache

    def train(self, steps=None, log_every: int = 500, silent: bool = False,
              blocked: bool = False):
        if self.state is None:
            self.init_state()
        steps = steps if steps is not None else self.cfg.max_steps
        done = 0
        milestones = sorted(set(
            [s for s in self.upsample_schedule if s < steps]
            + ([self.shrink_step] if self.shrink_step and self.shrink_step < steps else [])))
        start = int(self.state.step)
        bounds = [m - start for m in milestones if m > start] + [steps]
        for b in bounds:
            seg = b - done
            if seg > 0:
                super().train(steps=seg, log_every=log_every, silent=silent,
                              blocked=blocked)
                done = b
            if done < steps:
                self.maybe_resize(int(self.state.step))
        return done
