"""D-NeRF trainer: time-conditioned batches + time-sliced occupancy.

Equivalent of reference dnerf/utils.py: each batch carries its image's time;
the fast path marches against that time slice's bitfield; occupancy refresh
rotates over time slices every `update_grid_interval` (reference uses 100,
dnerf/renderer.py:454 & main_dnerf.py:30); an optional deformation
regularizer pulls dx toward 0 early in training."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.data.rays import get_rays
from seal3d_tpu.models import dnerf
from seal3d_tpu.parallel.mesh import shard_rays
from seal3d_tpu.render.occupancy import occupancy_t_init, occupancy_t_update
from seal3d_tpu.render.renderer import render_rays, render_rays_dense
from seal3d_tpu.train.trainer import TrainConfig, Trainer, TrainState
import optax


class DNeRFTrainer(Trainer):
    def __init__(self, field_cfg: dnerf.DNeRFConfig, opts, cfg: TrainConfig,
                 dataset=None, key=None, mesh=None, name: str = "dnerf",
                 time_size: int = 64, deform_reg: float = 0.0,
                 sigma_reg: float = 0.0,
                 slices_per_update: int = 8, use_dense: bool = False):
        self.time_size = time_size
        self.deform_reg = deform_reg
        self.sigma_reg = sigma_reg
        self.slices_per_update = slices_per_update
        super().__init__(dnerf, field_cfg, opts, cfg, dataset=dataset, key=key,
                         mesh=mesh, use_dense=use_dense, name=name)
        self._build_dnerf_steps()

    def attach_dataset(self, dataset):
        super().attach_dataset(dataset)
        if dataset.times is not None:
            self._times = jnp.asarray(dataset.times)
        else:
            self._times = jnp.linspace(0.0, 1.0, len(dataset))

    def init_state(self) -> TrainState:
        params = self.field.init(self.init_key, self.fcfg)
        opt_state = self.optimizer.init(params)
        occ = occupancy_t_init(self.time_size, self.opts.cascades)
        ema0 = jax.tree.map(jnp.copy, params)
        self.state = TrainState(params=params, opt_state=opt_state,
                                ema_params=ema0, occ=occ,
                                step=jnp.zeros((), jnp.int32), error_map=None)
        return self.state

    def _build_dnerf_steps(self):
        field, fcfg, opts, cfg = self.field, self.fcfg, self.opts, self.cfg

        def loss_fn(params, bitfield_t, batch, key):
            timed = dnerf.with_time(batch["time"])
            if self.use_dense:
                out = render_rays_dense(params, timed, fcfg, batch["rays_o"],
                                        batch["rays_d"], opts, key=key,
                                        bg_color=batch["bg"], perturb=True)
            else:
                out = render_rays(params, timed, fcfg, bitfield_t,
                                  batch["rays_o"], batch["rays_d"], opts,
                                  key=key, bg_color=batch["bg"], perturb=True)
            per_ray = ((out["image"] - batch["gt"]) ** 2).mean(-1)
            loss = per_ray.mean()
            if self.deform_reg > 0 and fcfg.variant == "deform":
                # Regularize at marched surface points (rays_o + depth*rays_d),
                # not camera origins — the reference penalizes the deformation
                # at sampled xyzs (dnerf/utils.py deform reg), and all rays of
                # a view share one origin where the field is never queried.
                xs = batch["rays_o"] + jax.lax.stop_gradient(
                    out["depth"])[:, None] * batch["rays_d"]
                dx = dnerf.deformation(params, fcfg, xs, batch["time"])
                loss = loss + self.deform_reg * jnp.abs(dx).mean()
            if self.sigma_reg > 0:
                # L1 density sparsity at uniform random points at this
                # batch's time (DVGO/Plenoxels-style): dynamic captures see
                # each time from only a few views, so unobserved floaters
                # survive the photometric loss; this pulls them to zero.
                xr = jax.random.uniform(key, (4096, 3), minval=-opts.bound,
                                        maxval=opts.bound)
                sr = dnerf.density(params, fcfg, xr, batch["time"])["sigma"]
                loss = loss + self.sigma_reg * sr.mean()
            return loss, out

        def train_step(state: TrainState, key):
            kimg, kray, kbg, kjit = jax.random.split(key, 4)
            img_idx = jax.random.randint(kimg, (), 0, self._poses.shape[0])
            pose = self._poses[img_idx]
            t = self._times[img_idx]
            h, w = self.dataset.h, self.dataset.w
            rays = get_rays(kray, pose, self._intrinsics, h, w, cfg.num_rays)
            img = self._images[img_idx].reshape(h * w, -1).astype(jnp.float32) / 255.0
            gt = jnp.take(img, rays["inds"], axis=0)
            # Random background ONLY when gt has alpha to composite onto
            # (base trainer rule, reference nerf/utils.py:465-476). RGB-only
            # gt is baked on white: training it against a random bg forces
            # the field to fill space with opaque white fog — measured as a
            # ~17 dB held-out deficit vs the NGP pipeline before this guard.
            if cfg.random_bg and gt.shape[-1] == 4:
                bg = jax.random.uniform(kbg, (cfg.num_rays, 3))
                gt = gt[:, :3] * gt[:, 3:] + bg * (1.0 - gt[:, 3:])
            else:
                bg = jnp.ones((cfg.num_rays, 3))
                if gt.shape[-1] == 4:
                    gt = gt[:, :3] * gt[:, 3:] + bg * (1.0 - gt[:, 3:])
            batch = shard_rays({"rays_o": rays["rays_o"], "rays_d": rays["rays_d"],
                                "gt": gt, "bg": bg}, self.mesh)
            batch["time"] = t
            t_slice = jnp.clip((t * self.time_size).astype(jnp.int32), 0,
                               self.time_size - 1)
            bitfield_t = state.occ.bitfield[t_slice]
            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, bitfield_t, batch, kjit)
            updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                       state.params)
            params = optax.apply_updates(state.params, updates)
            ema = jax.tree.map(
                lambda e, p: e * cfg.ema_decay + p * (1 - cfg.ema_decay),
                state.ema_params, params)
            new_state = TrainState(params=params, opt_state=opt_state,
                                   ema_params=ema, occ=state.occ,
                                   step=state.step + 1, error_map=None)
            return new_state, {"loss": loss, "num_samples": out.get(
                "num_samples", jnp.zeros(()))}

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

        def train_block(state, key, n_steps: int):
            def body(st, k):
                st, m = train_step(st, k)
                return st, m["loss"]
            keys = jax.random.split(key, n_steps)
            state, losses = jax.lax.scan(body, state, keys)
            return state, {"loss": losses[-1], "loss_mean": losses.mean(),
                           "num_samples": jnp.zeros(())}

        self._train_block = jax.jit(train_block, static_argnums=(2,),
                                    donate_argnums=(0,))

        def update_grid(state: TrainState, key, start_slice):
            def density_fn(x, t):
                return dnerf.density(state.params, fcfg, x, t)["sigma"] * opts.density_scale

            t_indices = (start_slice + jnp.arange(self.slices_per_update)) % self.time_size
            occ = occupancy_t_update(state.occ, density_fn, key, opts.bound,
                                     t_indices, density_thresh=cfg.density_thresh)
            return state._replace(occ=occ)

        self._update_grid_t = jax.jit(update_grid, donate_argnums=(0,))
        self._grid_cursor = 0

        def render_eval(params, bitfield, rays_o, rays_d, bg, key, t):
            import dataclasses

            timed = dnerf.with_time(t)
            # Inherit the full RenderOptions (like the base trainer): a
            # hand-built subset silently dropped coarse_steps, so the
            # 256-candidate eval ladder started at the AABB entry and
            # truncated everything beyond 256*dt_min (~1.7 units) — eval
            # PSNR capped ~16 dB while training was fine.
            eval_opts = dataclasses.replace(
                opts, budget_per_ray=cfg.eval_budget_per_ray,
                flat_frac=cfg.eval_flat_frac)
            if self.use_dense:
                return render_rays_dense(params, timed, fcfg, rays_o, rays_d,
                                         eval_opts, key=key, bg_color=bg)
            return render_rays(params, timed, fcfg, bitfield, rays_o, rays_d,
                               eval_opts, key=key, bg_color=bg)

        self._render_eval_t = jax.jit(render_eval)

    def train(self, steps: Optional[int] = None, log_every: int = 500,
              silent: bool = False, blocked: bool = False,
              update_interval: int = 100):
        """Reference updates the time grid every 100 steps (main_dnerf.py:30)."""
        if self.state is None:
            self.init_state()
        steps = steps if steps is not None else self.cfg.max_steps
        i = 0
        while i < steps:
            self.loop_key, k1, k2 = jax.random.split(self.loop_key, 3)
            if not self.use_dense and int(self.state.step) % update_interval == 0:
                self.state = self._update_grid_t(
                    self.state, k1, jnp.asarray(self._grid_cursor, jnp.int32))
                self._grid_cursor = (self._grid_cursor + self.slices_per_update) % self.time_size
            if blocked:
                n = min(update_interval, steps - i)
                self.state, metrics = self._train_block(self.state, k2, n)
                i += n
            else:
                self.state, metrics = self._train_step(self.state, k2)
                i += 1
            if not silent and (i % log_every < 2 or i >= steps):
                m = jax.device_get(metrics)
                print(f"[dnerf] step={int(self.state.step)} loss={m['loss']:.5f}")
        return jax.device_get(metrics)

    def render_image_t(self, pose, h, w, t: float, bg_color: float = 1.0,
                       use_ema: bool = True, chunk: Optional[int] = None):
        from seal3d_tpu.data.rays import get_full_rays

        chunk = chunk or self.cfg.eval_chunk
        params = self.state.ema_params if use_ema else self.state.params
        rays = get_full_rays(jnp.asarray(pose), self._intrinsics, h, w)
        t_slice = min(int(t * self.time_size), self.time_size - 1)
        bitfield = self.state.occ.bitfield[t_slice]
        n = h * w
        bg = jnp.full((chunk, 3), bg_color, jnp.float32)
        imgs, deps = [], []
        for i in range(0, n, chunk):
            ro = rays["rays_o"][i : i + chunk]
            rd = rays["rays_d"][i : i + chunk]
            if ro.shape[0] < chunk:
                pad = chunk - ro.shape[0]
                ro = jnp.pad(ro, ((0, pad), (0, 0)))
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            out = self._render_eval_t(params, bitfield, ro, rd, bg,
                                      jax.random.PRNGKey(0), jnp.asarray(t))
            imgs.append(out["image"][: min(chunk, n - i)])
            deps.append(out["depth"][: min(chunk, n - i)])
        return (jnp.concatenate(imgs).reshape(h, w, 3),
                jnp.concatenate(deps).reshape(h, w))

    def evaluate(self, dataset=None, max_views: Optional[int] = None,
                 bg_color: float = 1.0) -> float:
        from seal3d_tpu.train.metrics import PSNRMeter

        ds = dataset or self.dataset
        times = ds.times if ds.times is not None else np.linspace(0, 1, len(ds))
        meter = PSNRMeter()
        n = len(ds) if max_views is None else min(max_views, len(ds))
        for vi in range(n):
            img, _ = self.render_image_t(ds.poses[vi], ds.h, ds.w, float(times[vi]),
                                         bg_color=bg_color)
            gt = np.asarray(ds.images[vi], np.float32) / 255.0
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + bg_color * (1 - gt[..., 3:])
            meter.update(np.asarray(img), gt)
        return meter.measure()
