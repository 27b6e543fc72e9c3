"""Seal student trainer: two-stage teacher->student distillation.

Equivalent of reference SealNeRF/trainer.py (dynamic trainer composition
:33-54 becomes plain subclassing of the functional Trainer):

Stage 1 "local pretraining" (init_pretraining:88-263, pretrain_*:363-471):
  dense grids of points are sampled in three shells (local = edit region,
  surrounding = extended bounds minus edit region, global = whole aabb),
  ground truth sigma/color is queried ONCE from the frozen teacher through
  the proxy mapping, then the student is fitted with L1 on (sigma, color)
  at high LR with its MLPs frozen (only hash tables move — freeze_mlp:472).

Stage 2 "global finetuning": every training view is re-rendered by the
  teacher once (`proxy_dataset`) and normal image training resumes with depth
  supervision.

Timing of both stages is recorded to workspace/timer.json
(reference :314-357), along with seal.json / options.json run dumps (:291-297).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seal3d_tpu.render.renderer import RenderOptions, render_rays
from seal3d_tpu.seal import geometry as geo
from seal3d_tpu.seal.mappers import SealMapper, map_color, map_to_origin
from seal3d_tpu.seal.provider import proxy_dataset
from seal3d_tpu.seal.renderer import (cells_to_byte_masks, force_fill_cells,
                                      hack_bitfield, make_teacher_field)
from seal3d_tpu.train.trainer import Trainer, TrainConfig


@dataclass
class PretrainConfig:
    epochs: int = 100
    # Large batches matter: the reference effectively fits each shell in ONE
    # 6.1M-point batch (main_SealNeRF.py:109); small batches + Adam's stale
    # momentum on sparsely-touched hash entries destabilize the distill.
    batch_size: int = 2**19
    lr: float = 0.07
    local_point_step: float = 0.005
    local_angle_step: float = 45.0
    surrounding_point_step: float = 0.01
    surrounding_angle_step: float = 45.0
    surrounding_bounds_extend: float = 0.2
    global_point_step: float = 0.05
    global_angle_step: float = 45.0
    export_debug: bool = False
    # L1 on log1p(sigma) instead of raw sigma (improvement over the reference's
    # plain L1, SealNeRF/trainer.py:456-471: with sigma = exp(h) the raw-L1
    # gradient dL/dh = sign(sigma-gt)*sigma vanishes exactly where density
    # must be *raised* from empty space — the edit target region — making
    # convergence asymmetric. Log-space L1 is symmetric in h and converges
    # both directions. Set False for reference-parity behavior.
    sigma_log_space: bool = True


def sample_grid_points(bounds: np.ndarray, step: float, angle_step: float,
                       max_points: int = 4_000_000):
    """Regular grid over AABB(s) + euler-angle direction set
    (reference sample_points, SealNeRF/trainer.py:609-645)."""
    bounds = np.asarray(bounds, np.float32).reshape(-1, 2, 3)
    pts = []
    for lo, hi in bounds:
        counts = np.maximum(((hi - lo) / step).astype(np.int64), 1)
        # cap resolution to stay within budget
        while np.prod(counts) > max_points:
            counts = np.maximum(counts // 2, 1)
        axes = [np.linspace(lo[d], hi[d], int(counts[d])) for d in range(3)]
        g = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
        pts.append(g)
    points = np.concatenate(pts).astype(np.float32)

    angles = np.deg2rad(np.arange(0.0, 360.0, angle_step))
    dirs = []
    for a in angles:
        for b in angles[: len(angles) // 2 + 1]:
            dirs.append([np.cos(a) * np.sin(b), np.sin(a) * np.sin(b), np.cos(b)])
    dirs = np.asarray(dirs, np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12
    return points, dirs


class SealTrainer(Trainer):
    """Student trainer. The teacher is (field, params, bitfield) — frozen."""

    def __init__(self, field_mod, field_cfg, opts: RenderOptions,
                 cfg: TrainConfig, mapper: SealMapper,
                 teacher_params, teacher_bitfield,
                 dataset=None, key=None, mesh=None,
                 secondary_field=None, secondary_cfg=None, secondary_params=None,
                 name: str = "seal_student"):
        super().__init__(field_mod, field_cfg, opts, cfg, dataset=dataset,
                         key=key, mesh=mesh, name=name)
        self.mapper = mapper
        self.teacher_params = teacher_params
        self.teacher_field = make_teacher_field(
            field_mod, mapper, field_cfg, secondary_field, secondary_cfg,
            secondary_params)
        # Edit-region occupancy force-fill (precomputed host-side).
        cells = force_fill_cells(mapper.force_fill_bound, opts.cascades, opts.bound)
        byte_idx, masks = cells_to_byte_masks(cells)
        self._hack_bytes = jnp.asarray(byte_idx)
        self._hack_masks = jnp.asarray(masks)
        # march-AABB expansion covering the (initially empty) edit region
        ffb = np.asarray(mapper.force_fill_bound, np.float32).reshape(-1, 2, 3)
        self._hack_aabb = jnp.asarray(
            np.concatenate([ffb[:, 0].min(0), ffb[:, 1].max(0)]))
        self.teacher_bitfield = hack_bitfield(jnp.asarray(teacher_bitfield),
                                              self._hack_bytes, self._hack_masks)
        self.pretrain_data = {}
        self.is_pretraining = False
        self.time_inspector = {"pretraining": [], "training": []}
        self._build_seal_steps()

    # ------------------------------------------------------------ teacher side

    def _teacher_view_setup(self, pose, h, w, chunk):
        """Z-order chunk layout + padded ray stacks for one teacher view
        (shares Trainer._chunk_layout; pad slots are AABB-missing rays —
        zero demand, zero budget)."""
        from seal3d_tpu.data.rays import get_full_rays

        sel, nv, inv = self._chunk_layout(h, w, chunk)
        rays = get_full_rays(jnp.asarray(pose), self._intrinsics, h, w)
        selj = jnp.asarray(np.clip(sel, 0, None))
        ok = jnp.asarray(sel >= 0)[..., None]
        b = self.opts.bound
        ro_c = jnp.where(ok, rays["rays_o"][selj],
                         jnp.array([3.0 * b, 0.0, 0.0], jnp.float32))
        rd_c = jnp.where(ok, rays["rays_d"][selj],
                         jnp.array([1.0, 0.0, 0.0], jnp.float32))
        return ro_c, rd_c, inv

    def _covering_frac(self, need: float, chunk: int):
        """Smallest flat_frac bucket whose budget covers `need` kept samples
        (1.02 absorbs the round-to-128); None (dense fallback) when nothing
        under 1.0 covers — the proxy gt must never thin. 0.0 = the chunk has
        no occupied samples at all and the render can be skipped outright
        (constant background; gated off under a background net)."""
        if need == 0 and self.opts.bg_radius <= 0:
            return 0.0
        cap = chunk * self._teacher_opts.budget_per_ray
        for b in self.cfg.eval_buckets:
            if b < 1.0 and max(int(round(cap * b / 128)) * 128,
                               128) >= need * 1.02:
                return b
        return None

    def render_teacher_view(self, pose, h=None, w=None, chunk=None,
                            bg_color: float = 1.0, as_numpy: bool = True,
                            fracs=None):
        """Render one full view through the (mapped) teacher, Z-order
        chunked like Trainer.render_image.

        as_numpy=False returns device arrays WITHOUT a host sync, so callers
        rendering many views (proxy_datasets) can pipeline all dispatches
        and pay the tunnel round-trip once at the end. `fracs` (per chunk:
        0.0 = skip/background, float = packed at that covering flat_frac,
        None = dense) comes from a demand probe; without it each chunk
        probes and syncs itself (fine for previews, serializing for view
        stacks)."""
        h = h or self.dataset.h
        w = w or self.dataset.w
        # one dispatch per view when it fits; never pad beyond the view
        chunk = chunk or min(self.cfg.eval_chunk, h * w)
        ro_c, rd_c, inv = self._teacher_view_setup(pose, h, w, chunk)
        imgs, deps = [], []
        for ci in range(ro_c.shape[0]):
            if fracs is not None:
                frac = fracs[ci]
            elif self.opts.compaction == "topk":
                frac = self._covering_frac(
                    float(self._teacher_demand(self.teacher_bitfield,
                                               ro_c[ci], rd_c[ci])), chunk)
            else:
                frac = None
            if frac == 0.0:
                imgs.append(jnp.full((chunk, 3), bg_color, jnp.float32))
                deps.append(jnp.zeros((chunk,), jnp.float32))
                continue
            out = self._render_teacher_at(frac)(
                self.teacher_params, self.teacher_bitfield, ro_c[ci],
                rd_c[ci], jnp.float32(bg_color))
            imgs.append(out["image"])
            deps.append(out["depth"])
        invj = jnp.asarray(inv)
        img = jnp.concatenate(imgs)[invj].reshape(h, w, 3)
        dep = jnp.concatenate(deps)[invj].reshape(h, w)
        if as_numpy:
            return np.asarray(img), np.asarray(dep)
        return img, dep

    def proxy_datasets(self):
        """Replace gt of the attached dataset with teacher renders
        (reference train:275-281 -> provider.proxy_dataset). Two async
        phases, one host sync each: (1) every view-chunk's packed-march
        demand over the Z-order layout (picks, per chunk, skip / a covering
        flat_frac / dense — the field then runs on ~real occupancy instead
        of all N*K dense slots, and background chunks skip the render
        dispatch entirely), (2) every view render (a per-view np.asarray
        serialized every render on the tunnel round-trip — measured 28-37 s
        for 24 views where the pure compute is a few seconds)."""
        t0 = time.time()
        h, w = self.dataset.h, self.dataset.w
        chunk = min(self.cfg.eval_chunk, h * w)
        fracs_per_view = None
        if self.opts.compaction == "topk":
            demands = []
            per_view = None
            for vi in range(len(self.dataset)):
                ro_c, rd_c, _ = self._teacher_view_setup(
                    self.dataset.poses[vi], h, w, chunk)
                per_view = ro_c.shape[0]
                for ci in range(per_view):
                    demands.append(self._teacher_demand(
                        self.teacher_bitfield, ro_c[ci], rd_c[ci]))
            demands = np.asarray(jnp.stack(demands))  # ONE sync
            fracs_per_view = [
                [self._covering_frac(float(d), chunk)
                 for d in demands[vi * per_view:(vi + 1) * per_view]]
                for vi in range(len(self.dataset))]
        views = iter(range(len(self.dataset)))
        ds = proxy_dataset(
            self.dataset,
            lambda p: self.render_teacher_view(
                p, as_numpy=False,
                fracs=(fracs_per_view[next(views)]
                       if fracs_per_view is not None else None)),
            sync_at_end=True)
        self.attach_dataset(ds)
        return time.time() - t0

    # --------------------------------------------------------------- stage 1

    def init_pretraining(self, pcfg: PretrainConfig):
        """Sample the three point shells and cache teacher ground truth."""
        self.pcfg = pcfg
        opts = self.opts
        aabb = np.array([[-opts.bound] * 3, [opts.bound] * 3], np.float32)
        data = {}

        qchunk = 2**16

        def teacher_query(points, dirs):
            # dispatch all chunks async, sync ONCE at the end (a per-chunk
            # np.asarray would round-trip the device per 64k points)
            outs_s, outs_c, lens = [], [], []
            n = points.shape[0]
            for i in range(0, n, qchunk):
                p = jnp.asarray(points[i : i + qchunk])
                d = jnp.asarray(dirs[i : i + qchunk])
                if p.shape[0] < qchunk:
                    pad = qchunk - p.shape[0]
                    p = jnp.pad(p, ((0, pad), (0, 0)))
                    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
                s, c = self._teacher_apply(self.teacher_params, p, d)
                outs_s.append(s)
                outs_c.append(c)
                lens.append(min(qchunk, n - i))
            return (np.concatenate([np.asarray(s)[:l] for s, l in zip(outs_s, lens)]),
                    np.concatenate([np.asarray(c)[:l] for c, l in zip(outs_c, lens)]))

        # ---- local: inside edit region, mapped back to source
        if pcfg.local_point_step > 0:
            pts, dir_set = sample_grid_points(self.mapper.force_fill_bound,
                                              pcfg.local_point_step,
                                              pcfg.local_angle_step)
            probe = jnp.asarray(np.tile(np.array([[1.0, 0, 0]], np.float32),
                                        (len(pts), 1)))
            mpts, mdirs, mask = map_to_origin(self.mapper, jnp.asarray(pts), probe)
            mask = np.asarray(mask)
            if "map_source" in self.mapper.flags:
                mask = np.ones_like(mask)
            keep = np.where(mask)[0]
            pts_k = pts[keep]
            rng = np.random.default_rng(0)
            dirs_k = dir_set[rng.integers(0, len(dir_set), len(keep))]
            mpts_k = np.asarray(mpts)[keep]
            mdirs_k = np.asarray(mdirs)[keep] if mdirs is not None else dirs_k
            gt_sigma, gt_color = teacher_query(mpts_k, mdirs_k)
            gt_color = np.asarray(map_color(self.mapper, jnp.asarray(mpts_k),
                                            jnp.asarray(mdirs_k),
                                            jnp.asarray(gt_color)))
            data["local"] = dict(points=pts_k, dirs=dirs_k,
                                 sigma=gt_sigma, color=gt_color)

        # ---- surrounding: extended bounds minus edit region
        if pcfg.surrounding_point_step > 0:
            sb = np.array(self.mapper.force_fill_bound, np.float32).reshape(-1, 2, 3).copy()
            sb[:, 0] = np.maximum(sb[:, 0] - pcfg.surrounding_bounds_extend, aabb[0])
            sb[:, 1] = np.minimum(sb[:, 1] + pcfg.surrounding_bounds_extend, aabb[1])
            data.update(self._outside_shell("surrounding", sb,
                                            pcfg.surrounding_point_step,
                                            pcfg.surrounding_angle_step,
                                            teacher_query))

        # ---- global: whole scene aabb minus edit region
        if pcfg.global_point_step > 0:
            data.update(self._outside_shell("global", aabb[None],
                                            pcfg.global_point_step,
                                            pcfg.global_angle_step,
                                            teacher_query))

        # pad every shell to a batch multiple and ship to device, batched
        # [n_batches, bs, ...] so epoch loops scan without host-side slicing
        bs = pcfg.batch_size
        for k, v in data.items():
            n = len(v["points"])
            if n == 0:
                continue
            pad = (-n) % bs
            nb = (n + pad) // bs
            idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
            wgt = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
            self.pretrain_data[k] = {
                "points": jnp.asarray(v["points"][idx]).reshape(nb, bs, 3),
                "dirs": jnp.asarray(v["dirs"][idx]).reshape(nb, bs, 3),
                "sigma": jnp.asarray(v["sigma"][idx]).reshape(nb, bs),
                "color": jnp.asarray(v["color"][idx]).reshape(nb, bs, 3),
                "weight": jnp.asarray(wgt).reshape(nb, bs),
                "n_batches": nb,
            }
        self.is_pretraining = True
        self._build_pretrain_opt(pcfg.lr, pcfg.sigma_log_space)
        self._pre_opt_state = self._pre_opt.init(self.state.params if self.state
                                                 else self.init_state().params)
        if pcfg.export_debug and self.cfg.workspace:
            vis = os.path.join(self.cfg.workspace, "pretrain_vis")
            os.makedirs(vis, exist_ok=True)
            for k, v in data.items():
                geo.export_ply_points(os.path.join(vis, f"{k}.ply"),
                                      v["points"], v["color"])

    def _outside_shell(self, name, bounds, step, angle_step, teacher_query):
        pts, dir_set = sample_grid_points(bounds, step, angle_step)
        probe = jnp.asarray(np.tile(np.array([[1.0, 0, 0]], np.float32),
                                    (len(pts), 1)))
        _, _, mask = map_to_origin(self.mapper, jnp.asarray(pts), probe)
        keep = np.where(~np.asarray(mask))[0]
        pts_k = pts[keep]
        rng = np.random.default_rng(1)
        dirs_k = dir_set[rng.integers(0, len(dir_set), len(keep))]
        gt_sigma, gt_color = teacher_query(pts_k, dirs_k)
        return {name: dict(points=pts_k, dirs=dirs_k, sigma=gt_sigma,
                           color=gt_color)}

    # ------------------------------------------------------- jitted seal steps

    def _build_seal_steps(self):
        field, fcfg, opts = self.field, self.fcfg, self.opts

        # Teacher renders (proxying + previews) inherit the train options
        # (coarse tightening, occ_stride) at the eval budget. Flat packing
        # is used ONLY at a demand-proven budget: the hacked bitfield
        # inflates sample demand, and a packed buffer that OVERFLOWS thins
        # the proxy gt (round-2 measured 21-24 dB disagreement under the
        # old truncating overflow, scripts/probe_teacher_pack.py). Round 5:
        # a per-chunk march-count probe picks the smallest flat_frac whose
        # budget covers the chunk's EXACT kept-sample demand — the packed
        # stream is then bit-identical to the dense [N,K] path's kept
        # candidates (tests/test_render_paths.py::test_march_rays_flat_
        # matches_grid_then_pack) — and chunks that no fraction covers fall
        # back to the dense path. Cuts the field cost of a proxy render by
        # the chunk's real occupancy (~2-4x on the bbox recipe).
        import dataclasses

        teacher_opts = dataclasses.replace(
            opts, budget_per_ray=self.cfg.eval_budget_per_ray,
            flat_frac=None)
        self._teacher_opts = teacher_opts

        def render_teacher(params, bitfield, rays_o, rays_d, bg_color,
                           *, frac=None):
            t_opts = dataclasses.replace(teacher_opts, flat_frac=frac)
            return render_rays(params, self.teacher_field, fcfg, bitfield,
                               rays_o, rays_d, t_opts,
                               bg_color=bg_color)

        self._render_teacher_fn = render_teacher
        self._render_teacher = jax.jit(render_teacher)
        self._render_teacher_cache = {None: self._render_teacher}

        def teacher_demand(bitfield, rays_o, rays_d):
            """Exact kept-sample demand of the dense/packed teacher march
            (same per-ray stride-cap formula as compact_flat_*)."""
            from seal3d_tpu.ops.raymarch import march_candidates

            _, _, valid = march_candidates(
                rays_o, rays_d, bitfield, teacher_opts.bound,
                teacher_opts.cascades, teacher_opts.dt_gamma,
                teacher_opts.max_steps, teacher_opts.num_candidates,
                min_near=teacher_opts.min_near,
                occ_stride=teacher_opts.occ_stride,
                coarse_steps=teacher_opts.coarse_steps,
                span_adaptive=teacher_opts.span_adaptive)
            rank = jnp.cumsum(valid.astype(jnp.int32), axis=1)
            count = rank[:, -1:]
            stride = jnp.maximum(jnp.ceil(
                count / teacher_opts.budget_per_ray).astype(jnp.int32), 1)
            keep = valid & (((rank - 1) % stride) == 0)
            return keep.sum()

        self._teacher_demand = jax.jit(teacher_demand)

        def teacher_apply(params, x, d):
            return field.apply(params, fcfg, x, d)

        self._teacher_apply = jax.jit(teacher_apply)

        # Occupancy update with the bitfield re-hack + march-AABB expansion
        # FUSED into the same program: the finetune loop refreshes the grid
        # every 16 steps and the separate hack dispatch cost ~0.56 s/block
        # on the tunnel (~17 s per 500-step edit; PERFORMANCE.md round 5).
        hb, hm, ha = self._hack_bytes, self._hack_masks, self._hack_aabb

        def update_grid_and_hack(state, key, full: bool):
            st = self._update_grid_fn(state, key, full=full)
            occ = st.occ
            aabb = occ.occ_aabb
            if aabb is not None:
                aabb = jnp.concatenate([jnp.minimum(aabb[:3], ha[:3]),
                                        jnp.maximum(aabb[3:], ha[3:])])
            return st._replace(occ=occ._replace(
                bitfield=hack_bitfield(occ.bitfield, hb, hm),
                occ_aabb=aabb))

        from functools import partial as _p

        _hf = _p(update_grid_and_hack, full=True)
        _hf.__name__ = "update_grid_hacked_full"
        _hp = _p(update_grid_and_hack, full=False)
        _hp.__name__ = "update_grid_hacked_partial"
        self._update_grid_hacked_full = jax.jit(_hf, donate_argnums=(0,))
        self._update_grid_hacked_partial = jax.jit(_hp, donate_argnums=(0,))

    def _render_teacher_at(self, frac):
        """Jitted teacher render at a flat_frac bucket (None = dense)."""
        fn = self._render_teacher_cache.get(frac)
        if fn is None:
            from functools import partial as _partial

            fn = jax.jit(_partial(self._render_teacher_fn, frac=frac))
            self._render_teacher_cache[frac] = fn
        return fn

    def _build_pretrain_opt(self, lr: float, sigma_log_space: bool = True):
        """Pretrain optimizer: grid params only at constant high LR
        (freeze_mlp + set_lr, reference :472-505). What counts as "grid" is
        backbone-specific: NGP freezes its MLPs (reference freeze_mlp NGP
        branch), TensoRF-family backbones train everything except buffers
        (reference's TensoRF freeze_mlp is a no-op, :474-481)."""
        field, fcfg = self.field, self.fcfg

        def label(params):
            if "sigma_net" in params:   # NGP-like: train hash tables only
                return {k: ("encoder" if "encoder" in k else "frozen")
                        for k in params}
            # TensoRF-family: train everything except geometric buffers
            return {k: ("frozen" if k in ("aabb", "T", "R") else "encoder")
                    for k in params}

        self._pre_opt = optax.multi_transform(
            {"encoder": optax.adam(learning_rate=lr, b1=0.9, b2=0.99, eps=1e-15),
             "frozen": optax.set_to_zero()},
            label)

        def pretrain_step(params, pre_opt_state, ema, batch):
            def loss_fn(p):
                sigma, color = field.apply(p, fcfg, batch["points"], batch["dirs"])
                w = batch["weight"]
                wsum = jnp.maximum(w.sum(), 1e-6)
                if sigma_log_space:
                    diff = jnp.abs(jnp.log1p(sigma) - jnp.log1p(batch["sigma"]))
                else:
                    diff = jnp.abs(sigma - batch["sigma"])
                sl = (diff * w).sum() / wsum
                cl = (jnp.abs(color - batch["color"]) * w[:, None]).sum() / (3 * wsum)
                return sl + cl

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, pre_opt_state = self._pre_opt.update(grads, pre_opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree.map(
                lambda e, p: e * self.cfg.ema_decay + p * (1 - self.cfg.ema_decay),
                ema, params)
            return params, pre_opt_state, ema, loss

        self._pretrain_step = jax.jit(pretrain_step, donate_argnums=(0, 1, 2))

        def pretrain_block(params, pre_opt_state, ema, data, n_epochs: int):
            """`n_epochs` full shell passes fused into ONE XLA program
            (scan over epochs of scans over each shell's batch axis) — the
            per-batch/per-epoch host dispatch + loss sync of the plain loop
            cost more than the compute at these sizes on the tunnel."""

            def epoch_body(carry, _):
                params, opt, ema = carry
                losses = []
                for src in data:   # static tuple of shells
                    def batch_body(c, batch):
                        p, o, e = c
                        p, o, e, loss = pretrain_step(p, o, e, batch)
                        return (p, o, e), loss

                    (params, opt, ema), ls = jax.lax.scan(
                        batch_body, (params, opt, ema),
                        {k: src[k] for k in ("points", "dirs", "sigma",
                                             "color", "weight")})
                    losses.append(ls.mean())
                return (params, opt, ema), jnp.stack(losses).mean()

            (params, pre_opt_state, ema), losses = jax.lax.scan(
                epoch_body, (params, pre_opt_state, ema), None, length=n_epochs)
            return params, pre_opt_state, ema, losses

        # Donate only the opt state: params/ema are read straight out of
        # self.state at the call site, and a raise mid-call (retrace OOM,
        # bad shapes) would otherwise leave the trainer holding donated
        # (invalidated) param buffers (ADVICE r3 item 3).
        self._pretrain_block = jax.jit(pretrain_block, static_argnums=(4,),
                                       donate_argnums=(1,))

    # ----------------------------------------------------------- stage drivers

    def pretrain_one_epoch(self, key=None):
        """One pass over all cached shells (reference pretrain_one_epoch:363).
        Interactive/GUI granularity; batch runs use pretrain_epochs."""
        # student bitfield must include the (empty) edit region
        self.state = self.state._replace(occ=self.state.occ._replace(
            bitfield=hack_bitfield(self.state.occ.bitfield, self._hack_bytes,
                                   self._hack_masks)))
        losses = []
        params, ema = self.state.params, self.state.ema_params
        for part, src in self.pretrain_data.items():
            for b in range(src["n_batches"]):
                batch = {k: src[k][b]
                         for k in ("points", "dirs", "sigma", "color", "weight")}
                params, self._pre_opt_state, ema, loss = self._pretrain_step(
                    params, self._pre_opt_state, ema, batch)
                losses.append(loss)
        self.state = self.state._replace(params=params, ema_params=ema)
        return float(jnp.stack([jnp.asarray(l) for l in losses]).mean())

    def pretrain_epochs(self, n_epochs: int):
        """`n_epochs` shell passes in ONE device dispatch (scan-fused;
        see _build_pretrain_opt.pretrain_block). Returns per-epoch mean
        losses [n_epochs]."""
        self.state = self.state._replace(occ=self.state.occ._replace(
            bitfield=hack_bitfield(self.state.occ.bitfield, self._hack_bytes,
                                   self._hack_masks)))
        data = tuple(self.pretrain_data[k] for k in self.pretrain_data)
        try:
            params, pre_opt_state, ema, losses = self._pretrain_block(
                self.state.params, self._pre_opt_state, self.state.ema_params,
                data, n_epochs)
        except BaseException:
            # The block donates _pre_opt_state; a mid-call failure (retrace
            # OOM, transport error) may have invalidated that buffer at
            # dispatch. Rebuild it from the live params so the trainer stays
            # usable — params/ema are never donated here, so self.state is
            # intact (VERDICT r4 item 8).
            self._pre_opt_state = self._pre_opt.init(self.state.params)
            raise
        self._pre_opt_state = pre_opt_state
        self.state = self.state._replace(params=params, ema_params=ema)
        return np.asarray(losses)

    def _grid_update_fns(self):
        """The train loop's occupancy refreshes run the hack-FUSED programs
        (one dispatch per block; reference update_extra_state hook
        SealNeRF/renderer.py:50-60). restore_grid still uses the base
        un-hacked update directly."""
        return self._update_grid_hacked_full, self._update_grid_hacked_partial

    def _post_grid_update(self):
        """No-op: the re-hack is fused into _grid_update_fns' programs."""

    def update_grid_hacked(self, key, full=False):
        """Occupancy refresh + re-hack in ONE program; the march AABB is
        expanded to keep the (initially empty) edit region inside the
        candidate ladders."""
        fn = (self._update_grid_hacked_full if full
              else self._update_grid_hacked_partial)
        self.state = fn(self.state, key)

    def restore_grid(self, key=None):
        """Drop the bitfield force-fill after the edit is distilled
        (reference restore_bitfield, SealNeRF/renderer.py:71-75): one full
        occupancy refresh against the student's OWN density — which now
        covers the edit region — with no hack re-applied. Without this,
        post-edit evals/videos march the inflated hacked bitfield, and the
        packed eval path can overflow its global sample budget (dropping
        trailing rays entirely — see _build_seal_steps note)."""
        key = key if key is not None else jax.random.PRNGKey(11)
        self.state = self._update_grid_full(self.state, key)

    def _apply_hack(self):
        occ = self.state.occ
        aabb = occ.occ_aabb
        if aabb is not None:
            aabb = jnp.concatenate([
                jnp.minimum(aabb[:3], self._hack_aabb[:3]),
                jnp.maximum(aabb[3:], self._hack_aabb[3:])])
        self.state = self.state._replace(occ=occ._replace(
            bitfield=hack_bitfield(occ.bitfield, self._hack_bytes,
                                   self._hack_masks),
            occ_aabb=aabb))

    def train_edit(self, pcfg: PretrainConfig, finetune_steps: int = 1500,
                   pretrain_epochs: Optional[int] = None, proxy: bool = True,
                   log: bool = True):
        """Full two-stage edit pipeline; returns the timer dict
        (reference train:266-357)."""
        if self.state is None:
            self.init_state()
        # student starts from teacher weights (reference loads the same ckpt)
        self.state = self.state._replace(
            params=jax.tree.map(jnp.copy, self.teacher_params),
            ema_params=jax.tree.map(jnp.copy, self.teacher_params))
        self._dump_run_config(pcfg)

        t0 = time.time()
        self.init_pretraining(pcfg)
        t_init = time.time() - t0

        epochs = pcfg.epochs if pretrain_epochs is None else pretrain_epochs
        # blocks of <=10 epochs: one dispatch + one loss sync per block
        # (per-epoch wall recorded as block/len for timer.json continuity)
        e = 0
        while e < epochs:
            n = min(10, epochs - e)
            t0 = time.time()
            losses = self.pretrain_epochs(n)
            dt = (time.time() - t0) / n
            self.time_inspector["pretraining"].extend([dt] * n)
            if log:
                print(f"[pretrain] epochs {e}-{e + n - 1} "
                      f"loss={float(losses[-1]):.5f}")
            e += n
        self.is_pretraining = False

        t_proxy = 0.0
        if proxy and finetune_steps > 0:
            t_proxy = self.proxy_datasets()

        if finetune_steps > 0:
            # fresh optimizer state for stage 2 (unfreeze + restore lr)
            self.state = self.state._replace(
                opt_state=self.optimizer.init(self.state.params))
            # warm start: occupancy is sharp (teacher-derived + full refresh
            # below), so the budget retune can fire at the first measured
            # boundary instead of waiting out the full-update phase
            self.cfg.retune_warm = True
            t0 = time.time()
            # occupancy refresh keeps the hack applied
            self.update_grid_hacked(jax.random.PRNGKey(7), full=True)
            # Seed mean_count with a march-only probe and retune BEFORE the
            # first train-step compile: the hacked bitfield inflates sample
            # demand well above the default bucket, so without this the
            # finetune pays TWO remote train-step compiles (initial dense +
            # post-measurement bucket) — the march probe compiles in seconds
            # and makes the first train compile the final operating point.
            if self.cfg.adaptive_budget and self.opts.compaction == "topk":
                self._seed_mean_count_probe()
                self._retune_budget()
            self.train(steps=finetune_steps, silent=not log, blocked=True)
            self.time_inspector["training"].append(time.time() - t0)
            # the edit is baked in — march the real density from here on
            self.restore_grid()

        timer = {
            "pretraining": self.time_inspector["pretraining"],
            "pretraining_avg": float(np.mean(self.time_inspector["pretraining"]))
            if self.time_inspector["pretraining"] else 0.0,
            "pretraining_total": float(np.sum(self.time_inspector["pretraining"])),
            "training": self.time_inspector["training"],
            "training_avg": float(np.mean(self.time_inspector["training"]))
            if self.time_inspector["training"] else 0.0,
            "training_total": float(np.sum(self.time_inspector["training"])),
            "proxy_dataset": t_proxy,
            "pretrain_init": t_init,
        }
        if self.cfg.workspace:
            os.makedirs(self.cfg.workspace, exist_ok=True)
            with open(os.path.join(self.cfg.workspace, "timer.json"), "w") as f:
                json.dump(timer, f, indent=1)
        return timer

    def _dump_run_config(self, pcfg: PretrainConfig):
        """Reproducibility dump (reference :291-297: seal.json, options.json,
        run.sh)."""
        if not self.cfg.workspace:
            return
        import sys

        os.makedirs(self.cfg.workspace, exist_ok=True)
        with open(os.path.join(self.cfg.workspace, "seal.json"), "w") as f:
            json.dump(self.mapper.config, f, indent=1, default=str)
        with open(os.path.join(self.cfg.workspace, "options.json"), "w") as f:
            json.dump({"opts": asdict(self.opts), "train": asdict(self.cfg),
                       "pretrain": asdict(pcfg)}, f, indent=1, default=str)
        with open(os.path.join(self.cfg.workspace, "run.sh"), "w") as f:
            f.write("python " + " ".join(sys.argv) + "\n")
