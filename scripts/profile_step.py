"""Attribute the training-step time piece by piece on the real TPU.

VERDICT round 1 flagged a ~105 ms/step unprofiled remainder; this script
times each stage of the recipe step (4096 rays, budget 48, pallas encoder)
as an independently-jitted program so PERFORMANCE.md can carry a >=90%-
attributed breakdown. Pieces overlap on purpose (full step = march + field
fwd/bwd + composite + optimizer + sampling + scan glue); the table reports
both the isolated numbers and the full-step residual.

Usage: python scripts/profile_step.py [--rays 4096] [--budget 48]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """block_until_ready lies over the axon tunnel; a device_get of one
    element is the only reliable completion barrier (device ops run in
    dispatch order, so syncing the last output syncs the queue)."""
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n * 1000.0  # ms


def timeit_state(fn, state, n=20, warmup=3):
    """Time a state -> state transition that DONATES its input."""
    for _ in range(warmup):
        state = fn(state)
    _sync(state)
    t0 = time.time()
    for _ in range(n):
        state = fn(state)
    _sync(state)
    return (time.time() - t0) / n * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--budget", type=int, default=48)
    ap.add_argument("--candidates", type=int, default=512)
    ap.add_argument("--log2t", type=int, default=14)
    ap.add_argument("--backend", type=str, default="pallas")
    ap.add_argument("--flat", type=float, default=None,
                    help="flat_frac: profile the packed train path at this "
                         "fraction (the -O operating point is 0.375)")
    ap.add_argument("--coarse", type=int, default=0,
                    help="coarse_steps for per-ray near/far tightening")
    args = ap.parse_args()

    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.ops import composite as comp
    from seal3d_tpu.ops import raymarch as rm
    from seal3d_tpu.ops.hashgrid import hashgrid_encode_stacked
    from seal3d_tpu.ops.sh import sh_encode
    from seal3d_tpu.models.mlp import mlp_apply
    from seal3d_tpu.render.renderer import RenderOptions, render_rays
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

    n, k = args.rays, args.budget
    m = n * k
    print(f"device={jax.devices()[0]}  rays={n} budget={k} "
          f"candidates={args.candidates} M={m} backend={args.backend} "
          f"T=2^{args.log2t}", file=sys.stderr)

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=12, h=256, w=256, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=args.log2t,
                     grid_backend=args.backend,
                     gridtype="wrap" if args.backend == "halo" else "hash")
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=k, num_candidates=args.candidates,
                         min_near=0.05, flat_frac=args.flat,
                         coarse_steps=args.coarse)
    tcfg = TrainConfig(lr=1e-2, max_steps=30000, num_rays=n, random_bg=False)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    # get a realistic (sparse) grid: run some steps
    tr.train(steps=64, silent=True, blocked=True)
    state = tr.state
    params = state.params
    bitfield = state.occ.bitfield
    occ_aabb = state.occ.occ_aabb

    key = jax.random.PRNGKey(7)
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, -2.5]]), (n, 1))
    d = jax.random.normal(key, (n, 3)) * 0.25 + jnp.array([0.0, 0.0, 1.0])
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    gt = jax.random.uniform(key, (n, 3))
    bg = jnp.ones((n, 3))

    results = {}

    # ---- full train step (the ground truth to attribute)
    results["full_train_step"] = timeit_state(
        lambda s: tr._train_step(s, jax.random.PRNGKey(3))[0],
        jax.tree.map(jnp.copy, state), n=20)

    # ---- sampling (ray gen + gt gather + rng)
    def sample_only(s, kk):
        from seal3d_tpu.data.rays import get_rays
        kimg, kray, kbg, kjit = jax.random.split(kk, 4)
        img_idx = jax.random.randint(kimg, (), 0, tr._poses.shape[0])
        pose = tr._poses[img_idx]
        rays = get_rays(kray, pose, tr._intrinsics, ds.h, ds.w, n)
        img = tr._images[img_idx].reshape(ds.h * ds.w, -1).astype(jnp.float32) / 255.0
        g = jnp.take(img, rays["inds"], axis=0)
        return rays["rays_o"], rays["rays_d"], g

    results["sample_batch"] = timeit(
        jax.jit(sample_only), state, jax.random.PRNGKey(3), n=20)

    # ---- march (grid/topk path), plus its sub-pieces
    march = jax.jit(lambda bf, ro, rd: rm.march_rays_grid(
        ro, rd, bf, bound=opts.bound, cascades=opts.cascades,
        dt_gamma=opts.dt_gamma, max_steps=opts.max_steps, k=k,
        num_candidates=opts.num_candidates, min_near=opts.min_near,
        occ_stride=opts.occ_stride))
    results["march_total"] = timeit(march, bitfield, rays_o, rays_d, n=20)

    aabb = jnp.array(opts.aabb, jnp.float32)

    def cand_only(ro, rd):
        nears, fars = rm.near_far_from_aabb(ro, rd, aabb, opts.min_near)
        ts, dts, valid = rm.candidate_ts(nears, fars, opts.num_candidates,
                                         opts.dt_gamma, opts.bound, opts.max_steps)
        return ts, dts, valid

    results["march_candidates"] = timeit(jax.jit(cand_only), rays_o, rays_d, n=20)

    ts, dts, valid = jax.jit(cand_only)(rays_o, rays_d)
    xyz = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]

    def occ_only(bf, xyz_s, dts_s):
        return rm.occupancy_at(xyz_s[:, ::2], dts_s[:, ::2], bf,
                               opts.cascades, opts.bound)

    results["march_bit_test"] = timeit(jax.jit(occ_only), bitfield, xyz, dts, n=20)

    occ = jax.jit(occ_only)(bitfield, xyz, dts)
    occ_full = jnp.repeat(occ, 2, axis=1)
    valid_all = valid & occ_full

    results["march_compact_topk"] = timeit(
        jax.jit(lambda t, dt, v, ro, rd: rm.compact_topk(t, dt, v, ro, rd, k)),
        ts, dts, valid_all, rays_o, rays_d, n=20)

    if args.flat:
        budget = max(int(round(n * k * args.flat / 128)) * 128, 128)
        march_flat = jax.jit(lambda bf, ro, rd: rm.march_rays_flat(
            ro, rd, bf, bound=opts.bound, cascades=opts.cascades,
            dt_gamma=opts.dt_gamma, max_steps=opts.max_steps, k=k,
            budget=budget, num_candidates=opts.num_candidates,
            min_near=opts.min_near, occ_stride=opts.occ_stride,
            coarse_steps=opts.coarse_steps))
        results["march_flat_total"] = timeit(march_flat, bitfield,
                                             rays_o, rays_d, n=20)
        results["march_flat_compact"] = timeit(
            jax.jit(lambda t, dt, v, ro, rd: rm.compact_flat_direct(
                t, dt, v, ro, rd, k, budget)),
            ts, dts, valid_all, rays_o, rays_d, n=20)

    # ---- field query on marched samples (flat path: only `budget` samples
    # reach the field — size the field pieces accordingly)
    marched = march(bitfield, rays_o, rays_d)
    if args.flat:
        flat = march_flat(bitfield, rays_o, rays_d)
        xs = flat.xyzs.reshape(-1, 3)
        dirs = flat.dirs.reshape(-1, 3)
    else:
        xs = marched.xyzs.reshape(-1, 3)
        dirs = marched.dirs.reshape(-1, 3)

    results["field_fwd"] = timeit(
        jax.jit(lambda p, x, dd: ngp.apply(p, fcfg, x, dd)), params, xs, dirs, n=20)

    def field_loss(p, x, dd):
        sigma, rgb = ngp.apply(p, fcfg, x, dd)
        return (sigma.sum() + rgb.sum())

    results["field_fwd_bwd"] = timeit(
        jax.jit(jax.grad(field_loss)), params, xs, dirs, n=20)

    # encoder alone (stacked dual-grid gather, fwd and fwd+bwd)
    xin = (xs + fcfg.bound) / (2 * fcfg.bound)
    enc_tables = (params["encoder"], params["encoder_color"])
    results["encode_fwd"] = timeit(
        jax.jit(lambda t, x: hashgrid_encode_stacked(t, x, fcfg.grid)),
        enc_tables, xin, n=20)

    def enc_loss(t, x):
        a, b = hashgrid_encode_stacked(t, x, fcfg.grid)
        return a.sum() + b.sum()

    results["encode_fwd_bwd"] = timeit(
        jax.jit(jax.grad(enc_loss)), enc_tables, xin, n=20)

    # sh + mlps alone (total field minus encoders, roughly)
    results["sh_encode"] = timeit(jax.jit(lambda dd: sh_encode(dd, 4)), dirs, n=20)

    feat = jax.jit(lambda t, x: hashgrid_encode_stacked(t, x, fcfg.grid))(
        enc_tables, xin)

    def mlps_only(p, f, ce, dd):
        h = mlp_apply(p["sigma_net"], f)
        geo = h[..., 1:]
        d_enc = sh_encode(dd, 4)
        hc = jnp.concatenate([d_enc, geo, ce], axis=-1)
        return jax.nn.sigmoid(mlp_apply(p["color_net"], hc)).sum() + h[..., 0].sum()

    results["mlps_fwd_bwd"] = timeit(
        jax.jit(jax.grad(mlps_only)), params, feat[0], feat[1], dirs, n=20)

    # ---- composite fwd+bwd
    sig = jax.random.uniform(key, (n, k)) * 5
    rgbk = jax.random.uniform(key, (n, k, 3))

    def comp_loss(s, r):
        out = comp.composite_dense(s, r, marched.deltas, marched.ts, marched.valid)
        return ((out["image"] - gt) ** 2).mean()

    results["composite_fwd_bwd"] = timeit(
        jax.jit(jax.grad(comp_loss, argnums=(0, 1))), sig, rgbk, n=20)

    # ---- render_rays end-to-end fwd (march + field + composite)
    results["render_fwd"] = timeit(
        jax.jit(lambda p, bf, ro, rd: render_rays(
            p, ngp, fcfg, bf, ro, rd, opts, bg_color=1.0)["image"]),
        params, bitfield, rays_o, rays_d, n=20)

    # ---- full loss fwd+bwd (no optimizer)
    def loss_fn(p, bf, ro, rd):
        out = render_rays(p, ngp, fcfg, bf, ro, rd, opts, bg_color=1.0)
        return ((out["image"] - gt) ** 2).mean()

    results["loss_fwd_bwd"] = timeit(
        jax.jit(jax.grad(loss_fn)), params, bitfield, rays_o, rays_d, n=20)

    # ---- optimizer + EMA alone
    grads = jax.jit(jax.grad(loss_fn))(params, bitfield, rays_o, rays_d)

    def opt_only(g, os_, p, e):
        upd, os2 = tr.optimizer.update(g, os_, p)
        import optax
        p2 = optax.apply_updates(p, upd)
        e2 = jax.tree.map(lambda a, b: a * 0.95 + b * 0.05, e, p2)
        return p2, os2, e2

    results["adam_ema"] = timeit(
        jax.jit(opt_only), grads, state.opt_state, params, state.ema_params, n=20)

    # ---- grid update (amortized over 16 steps)
    results["grid_update_partial"] = timeit_state(
        lambda s: tr._update_grid_partial(s, jax.random.PRNGKey(5)),
        jax.tree.map(jnp.copy, state), n=10)

    # ---- report
    valid_frac = float(marched.valid.mean())
    print(f"valid sample fraction in [N,K]: {valid_frac:.3f} "
          f"(M_eff={int(valid_frac*m)})", file=sys.stderr)
    full = results["full_train_step"]
    print(f"\n{'piece':32s} {'ms':>8s} {'% of step':>9s}")
    for name, ms in results.items():
        print(f"{name:32s} {ms:8.2f} {100*ms/full:8.1f}%")
    march_ms = results.get("march_flat_total", results["march_total"])
    explained = (march_ms + results["field_fwd_bwd"]
                 + results["composite_fwd_bwd"] + results["adam_ema"]
                 + results["sample_batch"])
    print(f"\nsum(march+field_fwd_bwd+composite+adam+sample) = {explained:.1f} ms "
          f"({100*explained/full:.0f}% of full step; "
          f"residual {full-explained:.1f} ms)")


if __name__ == "__main__":
    main()
