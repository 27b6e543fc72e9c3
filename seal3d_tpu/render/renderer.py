"""Volume renderer: occupancy-compacted fast path + dense oracle path.

Functional equivalent of reference NeRFRenderer (nerf/renderer.py:61-573):
- `render_rays` replaces `run_cuda` (:256-372) for BOTH training and
  inference: one static-shape march -> compact -> field query -> flat
  composite program (no alive-ray loop; the sample budget plays that role).
- `render_rays_dense` replaces the pure-PyTorch `run` (:125-253): stratified
  sampling + PDF importance upsampling. It is the golden oracle for the fast
  path (SURVEY.md §4).

Both are pure functions of (params, occupancy bitfield, rays) and jit/vmap/
shard_map-compatible; chunking/stage dispatch lives in train/trainer.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp

from seal3d_tpu.ops.composite import composite_dense, composite_flat
from seal3d_tpu.ops.raymarch import (SQRT3, compact_flat_direct,
                                     march_candidates, march_rays,
                                     march_rays_flat, march_rays_flat_2level,
                                     march_rays_flat_grouped, march_rays_grid,
                                     near_far_from_aabb, sph_from_ray)


@dataclass(frozen=True)
class RenderOptions:
    """Static render options (the typed replacement for the reference's
    untyped `**vars(opt)` plumbing, nerf/utils.py:478)."""

    bound: float = 1.0
    dt_gamma: float = 0.0
    max_steps: int = 1024
    budget_per_ray: int = 64     # flat sample budget = N_rays * this
    num_candidates: int = 1024   # candidate ladder length for the fast path
    num_steps: int = 128         # dense path: stratified samples
    upsample_steps: int = 128    # dense path: PDF importance samples
    min_near: float = 0.2
    density_scale: float = 1.0
    bg_radius: float = -1.0
    # 'topk': per-ray [N, K] compaction via sort (fast on TPU);
    # 'flat': global-budget ray-contiguous buffer (scatter-based; exact
    #         analog of the reference's shared sample pool).
    compaction: str = "topk"
    # Occupancy tested at every s-th candidate, result repeated stride-wise
    # (see march_rays_grid). Hard-scene A/B at the recipe point: stride 4 is
    # both ~25% faster AND +1.2 dB over stride 2 (kept samples cluster into
    # contiguous runs through surfaces instead of alias-gapped singles);
    # candidate-count reduction, by contrast, collapses quality — keep 256.
    occ_stride: int = 4
    # On the topk path: sort-pack valid samples into a flat buffer of
    # flat_frac * N * K before the field query, so the network never runs on
    # invalid grid slots (the reference's mean_count pre-allocation analog,
    # raymarching.py:198-204). None/1.0 disables; the trainer adapts this to
    # the measured sample occupancy.
    flat_frac: float | None = None
    # Per-ray [near, far] tightening against a 16^3 coarse occupancy view
    # before building the candidate ladder (ops/raymarch.coarse_tighten);
    # 0 disables. Single-cascade scenes only.
    coarse_steps: int = 0
    # Packed-selection backend on the flat path: 'sort' (default) is the
    # single-array lax.sort; 'gather' inverts the packing with cumsum ranks +
    # searchsorted + one [budget, C] uint8 row gather. Identical packing
    # (parity-tested). MEASURED NEGATIVE on v5e: gather 16.2 ms vs sort
    # 9.0 ms march (42.97 vs 35.89 ms step) even with the single-uint8-row
    # variant — the sort is already near lax.sort roofline and the rank-
    # inversion's gather/argmax chain doesn't beat it. Kept as an option
    # for architectures with faster gathers.
    flat_select: str = "sort"
    # Shard the flat pack into this many contiguous ray slices with
    # per-slice budgets (ops.raymarch.compact_flat_sharded) so the packing
    # sort/cumsum stay sharded under a data mesh instead of all-gathering
    # the [N, C] candidates (probe_dp_hlo). The Trainer sets this to the
    # mesh's data-axis size; 1 = the global pack (single-chip default).
    # Applies on the single-level flat path when n divides; other paths
    # ignore it.
    pack_shards: int = 1
    # Per-ray candidate spacing max(dt_min, span/num_candidates) instead of
    # the global dt_min (dt_gamma == 0 only): the ladder always covers the
    # tightened interval, so num_candidates can halve (see candidate_ts).
    span_adaptive: bool = False
    # Transmittance-terminated marching rounds (flat path only): the
    # candidate ladder is split into `term_rounds` column slices; each round
    # packs its valid AND STILL-ALIVE samples (per-ray optical depth carried
    # between rounds, tau < -log(term_thresh)) into its own, smaller flat
    # budget before the field runs. Saturated rays stop paying field cost
    # after the round that killed them — the static-shape recast of the
    # reference's alive-list compaction + T_thresh early-out
    # (raymarching.cu:557,868; nerf/renderer.py:341-367). 1 disables.
    term_rounds: int = 1
    # Rays stop marching once transmittance < this (reference T_thresh).
    term_thresh: float = 1e-4
    # Per-round flat budgets as fractions of the single-round budget
    # (n * budget_per_ray * flat_frac); len must equal term_rounds. The sum
    # being < 1 is where the field savings come from: termination shrinks
    # the live sample population in later rounds, so later budgets shrink.
    # None -> geometric halving scaled to sum ~0.8.
    term_budget_fracs: tuple | None = None
    # Group-granular packed march (march_rays_flat_grouped): the candidate
    # ladder, bitfield gather, and packing sort run over groups of occ_stride
    # candidates instead of candidates (~s-fold smaller), exploiting that
    # occupancy is group-constant at occ_stride. Applies on the flat path
    # when dt_gamma == 0 and shapes divide; ignored otherwise.
    # Default OFF: measured at the sustained recipe point it buys only +2%
    # (92.5k vs 90.6k rays/s — the single-sort march already made the sort
    # cheap) and costs ~0.6 dB at equal steps from group-boundary padding
    # slots eating budget (A/B in PERFORMANCE.md).
    group_compact: bool = False
    # Two-level hierarchical march (ops.raymarch.march_rays_flat_2level):
    # group midpoints tested against a pooled+dilated 32^3 view, only
    # surviving groups reach the fine bitfield, packed by two small sorts
    # instead of one N*C-key sort, and a fine repack keeps pad slots out of
    # the budget (unlike group_compact). Applies on the flat path when
    # dt_gamma == 0, cascades == 1 and shapes divide; ignored otherwise.
    march_two_level: bool = False
    # Group length (candidates) for the two-level march; must divide
    # num_candidates, and (group-1)*dt_min must stay under a tl_pool cell.
    tl_group: int = 8
    # Pooled occupancy view resolution for the two-level midpoint test (32
    # or 64). 64^3 halves the dilated slab thickness around surfaces so
    # the group demand tracks fine-valid demand (requires tl_group=4 at
    # max_steps=512 to satisfy the span constraint) — see
    # ops.raymarch.pooled_dilated.
    tl_pool: int = 32
    # Fine-budget over-provisioning of the group pack (>= 1): the group
    # budget holds over * budget / group groups, so false-positive groups
    # do not displace real samples before the fine repack.
    tl_over: float = 1.5
    # Per-ray kept-group cap of the two-level march. 0 = budget_per_ray //
    # tl_group (the single-level per-ray-k policy at group granularity);
    # -1 = no per-ray cap (stride always 1; the GLOBAL Bresenham thinning
    # of pack_groups_expand_fine enforces the budgets instead); > 0 =
    # explicit cap. The round-3 val-view eval regression (~9 dB,
    # PERFORMANCE.md) was this cap: at k=48, g=8 the default kg=6 strides
    # foreground rays 4-6x, clumping samples into g-runs with ~4g*dt_min
    # gaps — far coarser than the single-level path's candidate striding.
    tl_kg: int = 0
    # Per-ray reduction mode of composite_flat: 'scatter' (exact; default,
    # used for training where gradients flow through it) or 'scan'
    # (cumsum + boundary gathers; ~1.5x faster composite on big inference
    # chunks at ~2e-3 absolute error — set by the eval/render configs).
    composite_seg: str = "scatter"
    # Fused Pallas ladder kernel for the two-level march's level 0/1
    # (ops/pallas/ladder.py): slab + coarse tighten + dilated group test in
    # one VMEM pass instead of three XLA gather ladders. Applies only when
    # the two-level path runs with tl_kg == -1, occ_stride == tl_group,
    # and no perturbation (the eval operating point); other configs use
    # the XLA group_plan. The trainer enables it on the TPU backend —
    # interpret mode is orders slower than plain XLA on CPU.
    tl_kernel: bool = False

    def tl_kernel_ok(self, k: int, jitter) -> bool:
        return (self.tl_kernel and self.two_level_ok(k)
                and self.tl_kg == -1 and jitter is None
                and self.occ_stride == self.tl_group
                and self.coarse_steps > 0)

    def two_level_ok(self, k: int) -> bool:
        """Eligibility gate for the two-level march at this config."""
        dt_min = 2.0 * SQRT3 / self.max_steps
        return (self.march_two_level and self.dt_gamma == 0.0
                and self.cascades == 1 and not self.span_adaptive
                and self.num_candidates % self.tl_group == 0
                and (self.tl_group - 1) * dt_min
                < 2.0 * self.bound / self.tl_pool)

    @cached_property
    def cascades(self) -> int:
        return 1 + math.ceil(math.log2(self.bound)) if self.bound > 1 else 1

    @cached_property
    def aabb(self):
        b = self.bound
        return (-b, -b, -b, b, b, b)


def round_budget_fracs(rounds: int) -> tuple:
    """Default per-round budget fractions: geometric halving scaled so the
    total is 0.8x the single-round budget (the first round carries most of
    the coarse-tightened ladder's valid samples; termination thins the rest).
    """
    raw = [0.5 ** r for r in range(rounds)]
    s = sum(raw)
    return tuple(0.8 * f / s for f in raw)


def _render_rounds(params, field, cfg, bitfield, rays_o, rays_d,
                   opts: RenderOptions, jitter, aabb):
    """Transmittance-terminated multi-round flat render (term_rounds > 1).

    One jitted program: the full candidate ladder is built once, then each
    round packs the valid-and-alive samples of its column slice into a
    shrinking static budget, queries the field, and composites with the
    per-ray optical depth carried from earlier rounds (composite_flat
    tau_in/tau_out). Equivalent to the single-pass composite of the
    concatenated stream — termination only drops samples whose weight is
    already < term_thresh. Static-shape analog of the reference's alive-ray
    loop (nerf/renderer.py:341-367, raymarching.cu:700-914)."""
    n = rays_o.shape[0]
    k = opts.budget_per_ray
    rounds = opts.term_rounds
    c = opts.num_candidates
    assert c % rounds == 0, "num_candidates must divide into term_rounds"
    fracs = opts.term_budget_fracs or round_budget_fracs(rounds)
    assert len(fracs) == rounds
    base = n * k * opts.flat_frac
    tau_max = -math.log(opts.term_thresh)
    k_r = max(-(-k // rounds), 1)
    cs = c // rounds

    ts, dts, valid = march_candidates(
        rays_o, rays_d, bitfield, bound=opts.bound, cascades=opts.cascades,
        dt_gamma=opts.dt_gamma, max_steps=opts.max_steps,
        num_candidates=c, perturb=jitter, min_near=opts.min_near, aabb=aabb,
        occ_stride=opts.occ_stride, coarse_steps=opts.coarse_steps,
        span_adaptive=opts.span_adaptive)

    tau = jnp.zeros((n,), jnp.float32)
    image = jnp.zeros((n, 3), jnp.float32)
    depth = jnp.zeros((n,), jnp.float32)
    wsum = jnp.zeros((n,), jnp.float32)
    num_samples = jnp.zeros((), jnp.int32)
    for r in range(rounds):
        budget = max(int(round(base * fracs[r] / 128)) * 128, 128)
        sl = slice(r * cs, (r + 1) * cs)
        alive = tau < tau_max
        v_r = valid[:, sl] & alive[:, None]
        mf = compact_flat_direct(ts[:, sl], dts[:, sl], v_r,
                                 rays_o, rays_d, k_r, budget)
        mf = jax.tree.map(jax.lax.stop_gradient, mf)
        try:
            sigma, rgb = field.apply(params, cfg, mf.xyzs, mf.dirs,
                                     valid=mf.valid)
        except TypeError:
            sigma, rgb = field.apply(params, cfg, mf.xyzs, mf.dirs)
        sigma = jnp.where(mf.valid, sigma * opts.density_scale, 0.0)
        o = composite_flat(sigma, rgb, mf.deltas, mf.ts, mf.ray_id,
                           mf.offsets, mf.valid, n, tau_in=tau,
                           seg_mode=opts.composite_seg)
        tau = o["tau_out"]
        image = image + o["image"]
        depth = depth + o["depth"]
        wsum = wsum + o["weights_sum"]
        num_samples = num_samples + mf.valid.sum()
    return {"image": image, "depth": depth, "weights_sum": wsum}, num_samples


def _render_rounds_2level(params, field, cfg, bitfield, rays_o, rays_d,
                          opts: RenderOptions, jitter, aabb):
    """Transmittance-terminated rounds on the two-level march.

    Level 1 (group midpoints vs the dilated pooled 32^3 view,
    ops.raymarch.group_plan) runs ONCE over the whole ladder; each round
    then packs only the ALIVE kept groups of its column slice, expands
    them, fine-tests just those members, and repacks the fine-valid ones
    into its shrinking budget. Dead rays stop paying for the fine bitfield
    AND the field network — the closest static-shape analog of the
    reference's alive-list DDA (raymarching.cu:700-914,
    nerf/renderer.py:341-367). Composite chaining is identical to
    _render_rounds (tau_in/tau_out)."""
    from seal3d_tpu.ops.raymarch import group_plan, pack_groups_expand_fine

    n = rays_o.shape[0]
    k = opts.budget_per_ray
    rounds = opts.term_rounds
    c = opts.num_candidates
    g = opts.tl_group
    cg = c // g
    assert cg % rounds == 0, "group columns must divide into term_rounds"
    csg = cg // rounds
    fracs = opts.term_budget_fracs or round_budget_fracs(rounds)
    assert len(fracs) == rounds
    base = n * k * opts.flat_frac
    tau_max = -math.log(opts.term_thresh)

    plan = group_plan(rays_o, rays_d, bitfield, bound=opts.bound,
                      cascades=opts.cascades, max_steps=opts.max_steps,
                      k=k, num_candidates=c, group=g, perturb=jitter,
                      min_near=opts.min_near, aabb=aabb,
                      coarse_steps=opts.coarse_steps, kg=opts.tl_kg,
                      pool=opts.tl_pool)

    tau = jnp.zeros((n,), jnp.float32)
    image = jnp.zeros((n, 3), jnp.float32)
    depth = jnp.zeros((n,), jnp.float32)
    wsum = jnp.zeros((n,), jnp.float32)
    num_samples = jnp.zeros((), jnp.int32)
    for r in range(rounds):
        budget = max(int(round(base * fracs[r] / 128)) * 128, 128)
        budget_g = max(-(-int(round(budget * opts.tl_over))
                         // (g * 16)) * 16, 16)
        alive = tau < tau_max
        keep_r = plan.keep[:, r * csg:(r + 1) * csg] & alive[:, None]
        mf = pack_groups_expand_fine(plan, keep_r, r * csg, rays_o, rays_d,
                                     bitfield, opts.bound, opts.cascades, g,
                                     budget, budget_g, opts.occ_stride)
        mf = jax.tree.map(jax.lax.stop_gradient, mf)
        try:
            sigma, rgb = field.apply(params, cfg, mf.xyzs, mf.dirs,
                                     valid=mf.valid)
        except TypeError:
            sigma, rgb = field.apply(params, cfg, mf.xyzs, mf.dirs)
        sigma = jnp.where(mf.valid, sigma * opts.density_scale, 0.0)
        o = composite_flat(sigma, rgb, mf.deltas, mf.ts, mf.ray_id,
                           mf.offsets, mf.valid, n, tau_in=tau,
                           seg_mode=opts.composite_seg)
        tau = o["tau_out"]
        image = image + o["image"]
        depth = depth + o["depth"]
        wsum = wsum + o["weights_sum"]
        num_samples = num_samples + mf.valid.sum()
    return {"image": image, "depth": depth, "weights_sum": wsum}, num_samples


def _background(field, params, cfg, opts, rays_o, rays_d, bg_color):
    if opts.bg_radius > 0 and hasattr(field, "background"):
        sph = sph_from_ray(rays_o, rays_d, opts.bg_radius)
        return field.background(params, cfg, sph, rays_d)
    return bg_color


def render_rays(params, field, cfg, bitfield, rays_o, rays_d,
                opts: RenderOptions, key=None, bg_color=1.0,
                aabb=None, perturb: bool = False):
    """Occupancy-grid fast path over a ray batch.

    Args:
      params: field params pytree.
      field: backbone module (models.ngp etc.).
      cfg: backbone config.
      bitfield: [C*H^3/8] uint8 occupancy bitfield.
      rays_o, rays_d: [N, 3] (d unit-norm).
      key: optional PRNG key; with perturb=True jitters march start offsets.
      bg_color: scalar or [3] or [N, 3].

    Returns:
      dict(image [N,3], depth [N], weights_sum [N]).
    """
    n = rays_o.shape[0]
    if aabb is None:
        aabb = jnp.array(opts.aabb, jnp.float32)
    jitter = None
    if perturb and key is not None:
        jitter = jax.random.uniform(key, (n,))
    if opts.compaction == "topk":
        k = opts.budget_per_ray
        # term_rounds eligibility includes the column-divisibility the round
        # slicing needs; like the other gates (two_level_ok), an ineligible
        # config falls back to the single-round flat path instead of
        # trace-time assert-failing (ADVICE r3 item 4).
        if (opts.term_rounds > 1 and opts.flat_frac is not None
                and opts.flat_frac < 1.0
                and opts.num_candidates % opts.term_rounds == 0):
            if (opts.two_level_ok(k)
                    and (opts.num_candidates // opts.tl_group)
                    % opts.term_rounds == 0):
                out, num_samples = _render_rounds_2level(
                    params, field, cfg, bitfield, rays_o, rays_d, opts,
                    jitter, aabb)
            else:
                out, num_samples = _render_rounds(params, field, cfg,
                                                  bitfield, rays_o, rays_d,
                                                  opts, jitter, aabb)
        elif opts.flat_frac is not None and opts.flat_frac < 1.0:
            # March straight to the packed flat layout (one argsort; the
            # [N, K] grid and its top_k never exist) — the field runs on
            # `budget` real samples instead of all N*K grid slots.
            shards = opts.pack_shards if n % max(opts.pack_shards, 1) == 0 \
                else 1
            q = 128 * max(shards, 1)
            budget = max(int(round(n * k * opts.flat_frac / q)) * q, q)
            s = opts.occ_stride
            if opts.tl_kernel_ok(k, jitter):
                from seal3d_tpu.ops.raymarch import \
                    march_rays_flat_2level_kernel

                mf = march_rays_flat_2level_kernel(
                    rays_o, rays_d, bitfield,
                    bound=opts.bound, cascades=opts.cascades,
                    max_steps=opts.max_steps, k=k, budget=budget,
                    num_candidates=opts.num_candidates,
                    min_near=opts.min_near, aabb=aabb, occ_stride=s,
                    coarse_steps=opts.coarse_steps, group=opts.tl_group,
                    over=opts.tl_over, pool=opts.tl_pool)
            elif opts.two_level_ok(k):
                mf = march_rays_flat_2level(
                    rays_o, rays_d, bitfield,
                    bound=opts.bound, cascades=opts.cascades,
                    max_steps=opts.max_steps, k=k, budget=budget,
                    num_candidates=opts.num_candidates, perturb=jitter,
                    min_near=opts.min_near, aabb=aabb, occ_stride=s,
                    coarse_steps=opts.coarse_steps, group=opts.tl_group,
                    over=opts.tl_over, kg=opts.tl_kg, pool=opts.tl_pool)
            elif (opts.group_compact and opts.dt_gamma == 0.0
                    and not opts.span_adaptive and s > 1
                    and opts.num_candidates % s == 0 and k % s == 0
                    and budget % s == 0):
                mf = march_rays_flat_grouped(
                    rays_o, rays_d, bitfield,
                    bound=opts.bound, cascades=opts.cascades,
                    max_steps=opts.max_steps, k=k, budget=budget,
                    num_candidates=opts.num_candidates, perturb=jitter,
                    min_near=opts.min_near, aabb=aabb, occ_stride=s,
                    coarse_steps=opts.coarse_steps)
            else:
                mf = march_rays_flat(
                    rays_o, rays_d, bitfield,
                    bound=opts.bound, cascades=opts.cascades,
                    dt_gamma=opts.dt_gamma, max_steps=opts.max_steps, k=k,
                    budget=budget, num_candidates=opts.num_candidates,
                    perturb=jitter, min_near=opts.min_near, aabb=aabb,
                    occ_stride=s, coarse_steps=opts.coarse_steps,
                    span_adaptive=opts.span_adaptive,
                    select=opts.flat_select, shards=shards)
            try:
                # backbones that take the packed-valid mask (NGP) let the
                # halo kernel skip table chunks only tail slots touch
                sigma, rgb = field.apply(params, cfg, mf.xyzs, mf.dirs,
                                         valid=mf.valid)
            except TypeError:
                sigma, rgb = field.apply(params, cfg, mf.xyzs, mf.dirs)
            sigma = jnp.where(mf.valid, sigma * opts.density_scale, 0.0)
            out = composite_flat(sigma, rgb, mf.deltas, mf.ts, mf.ray_id,
                                 mf.offsets, mf.valid, n,
                                 seg_mode=opts.composite_seg)
            num_samples = mf.valid.sum()
        else:
            m = march_rays_grid(
                rays_o, rays_d, bitfield,
                bound=opts.bound, cascades=opts.cascades,
                dt_gamma=opts.dt_gamma, max_steps=opts.max_steps, k=k,
                num_candidates=opts.num_candidates, perturb=jitter,
                min_near=opts.min_near, aabb=aabb, occ_stride=opts.occ_stride,
                coarse_steps=opts.coarse_steps,
                span_adaptive=opts.span_adaptive,
            )
            sigma, rgb = field.apply(params, cfg, m.xyzs.reshape(-1, 3),
                                     m.dirs.reshape(-1, 3))
            sigma = jnp.where(m.valid, sigma.reshape(n, k) * opts.density_scale,
                              0.0)
            out = composite_dense(sigma, rgb.reshape(n, k, 3), m.deltas, m.ts,
                                  m.valid)
            num_samples = m.valid.sum()
    else:
        marched = march_rays(
            rays_o, rays_d, bitfield,
            bound=opts.bound, cascades=opts.cascades, dt_gamma=opts.dt_gamma,
            max_steps=opts.max_steps, budget=n * opts.budget_per_ray,
            num_candidates=opts.num_candidates, perturb=jitter,
            min_near=opts.min_near, aabb=aabb,
        )
        sigma, rgb = field.apply(params, cfg, marched.xyzs, marched.dirs)
        sigma = jnp.where(marched.valid, sigma * opts.density_scale, 0.0)
        out = composite_flat(sigma, rgb, marched.deltas, marched.ts,
                             marched.ray_id, marched.offsets, marched.valid, n)
        num_samples = marched.valid.sum()
    bg = _background(field, params, cfg, opts, rays_o, rays_d, bg_color)
    image = out["image"] + (1.0 - out["weights_sum"])[:, None] * bg
    return {"image": image, "depth": out["depth"],
            "weights_sum": out["weights_sum"], "num_samples": num_samples}


def sample_pdf(key, bins, weights, n_samples, deterministic=False):
    """Inverse-CDF sampling of intervals (reference sample_pdf,
    nerf/renderer.py:12-58).

    Args:
      bins: [N, K+1] interval edges; weights: [N, K]; n_samples: static int.
    Returns:
      [N, n_samples] sampled positions.
    """
    n, k = weights.shape
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros((n, 1)), jnp.cumsum(pdf, -1)], -1)  # [N, K+1]
    if deterministic:
        u = jnp.linspace(0.0 + 0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (n, n_samples))
    else:
        u = jax.random.uniform(key, (n, n_samples))
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u) - 1
    idx = jnp.clip(idx, 0, k - 1)
    cdf_lo = jnp.take_along_axis(cdf, idx, 1)
    cdf_hi = jnp.take_along_axis(cdf, idx + 1, 1)
    bins_lo = jnp.take_along_axis(bins, idx, 1)
    bins_hi = jnp.take_along_axis(bins, idx + 1, 1)
    denom = jnp.where(cdf_hi - cdf_lo < 1e-5, 1.0, cdf_hi - cdf_lo)
    t = (u - cdf_lo) / denom
    return bins_lo + t * (bins_hi - bins_lo)


def render_rays_dense(params, field, cfg, rays_o, rays_d, opts: RenderOptions,
                      key=None, bg_color=1.0, aabb=None, perturb: bool = False):
    """Dense stratified + importance-sampled path (the oracle renderer)."""
    n = rays_o.shape[0]
    if aabb is None:
        aabb = jnp.array(opts.aabb, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, opts.min_near)
    nears = jnp.minimum(nears, 100.0)  # keep missed rays finite
    fars = jnp.minimum(fars, 100.1)
    k = opts.num_steps
    z = jnp.linspace(0.0, 1.0, k)
    z = nears[:, None] + (fars - nears)[:, None] * z[None, :]
    sample_dist = (fars - nears) / k
    if perturb and key is not None:
        key, sub = jax.random.split(key)
        z = z + (jax.random.uniform(sub, z.shape) - 0.5) * sample_dist[:, None]

    def query_sigma(zv):
        xyz = rays_o[:, None] + zv[..., None] * rays_d[:, None]
        xyz = jnp.clip(xyz, -opts.bound, opts.bound)
        out = field.density(params, cfg, xyz.reshape(-1, 3))
        return out["sigma"].reshape(zv.shape) * opts.density_scale

    if opts.upsample_steps > 0:
        sigma_c = query_sigma(z)
        deltas = jnp.diff(z, axis=-1)
        deltas = jnp.concatenate([deltas, sample_dist[:, None]], -1)
        comp = composite_dense(jax.lax.stop_gradient(sigma_c),
                               jnp.zeros((*z.shape, 3)), deltas, z)
        w = jax.lax.stop_gradient(comp["weights"])  # [N, K]
        mid = 0.5 * (z[:, 1:] + z[:, :-1])  # [N, K-1]
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = jax.random.PRNGKey(0)
        new_z = sample_pdf(sub, mid, w[:, 1:-1], opts.upsample_steps,
                           deterministic=not perturb)
        z = jnp.sort(jnp.concatenate([z, new_z], -1), axis=-1)

    xyz = rays_o[:, None] + z[..., None] * rays_d[:, None]
    xyz = jnp.clip(xyz, -opts.bound, opts.bound)
    dirs = jnp.broadcast_to(rays_d[:, None], xyz.shape)
    sigma, rgb = field.apply(params, cfg, xyz.reshape(-1, 3), dirs.reshape(-1, 3))
    sigma = sigma.reshape(z.shape) * opts.density_scale
    rgb = rgb.reshape(*z.shape, 3)
    deltas = jnp.diff(z, axis=-1)
    deltas = jnp.concatenate([deltas, sample_dist[:, None]], -1)
    out = composite_dense(sigma, rgb, deltas, z)
    bg = _background(field, params, cfg, opts, rays_o, rays_d, bg_color)
    image = out["image"] + (1.0 - out["weights_sum"])[:, None] * bg
    return {"image": image, "depth": out["depth"], "weights_sum": out["weights_sum"]}
