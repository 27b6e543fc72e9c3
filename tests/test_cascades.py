"""Multi-cascade (bound > 1) marching and rendering.

VERDICT r2 missing #1: cascade mips are core to the reference's unbounded
recipes (raymarching.cu:42-54, nerf/renderer.py:73; the fox config needs
bound 2) but every r2 march test pinned cascades=1. These tests exercise
mip selection, the per-mip coarse tightening, and fast-path-vs-oracle
parity on a scene with real content outside [-1, 1]^3.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.data.rays import get_full_rays
from seal3d_tpu.data.synthetic import WideSyntheticScene
from seal3d_tpu.ops.bitfield import GRID_CELLS, GRID_SIZE
from seal3d_tpu.ops.morton import morton3d
from seal3d_tpu.ops import raymarch as rm
from seal3d_tpu.render.occupancy import occupancy_init, occupancy_update
from seal3d_tpu.render.renderer import RenderOptions, render_rays


class _SceneField:
    @staticmethod
    def apply(params, cfg, x, d, valid=None):
        return cfg.density(x), cfg.color(x, d)

    @staticmethod
    def density(params, cfg, x):
        return {"sigma": cfg.density(x), "geo_feat": None}


def _occ2(scene):
    occ = occupancy_init(cascades=2, bound=2.0)
    return occupancy_update(occ, scene.density, jax.random.PRNGKey(0),
                            bound=2.0, density_thresh=0.01, full=True)


def test_occupancy_at_selects_cascade_by_position():
    """A point outside [-1,1]^3 must query cascade 1's bitfield; a point
    inside with a small dt must query cascade 0 (reference mip_from_pos /
    mip_from_dt, raymarching.cu:42-54)."""
    bf = jnp.zeros((2 * GRID_CELLS // 8,), jnp.uint8)

    def set_cell(bf, cas, x):
        cell = ((np.asarray(x) / min(2.0**cas, 2.0) * 0.5 + 0.5) * GRID_SIZE)
        cell = np.clip(cell.astype(np.int32), 0, GRID_SIZE - 1)
        code = int(np.asarray(morton3d(jnp.asarray(cell[None]))).item())
        flat = cas * GRID_CELLS + code
        return bf.at[flat >> 3].set(bf[flat >> 3] | np.uint8(1 << (flat & 7)))

    p_out = np.array([1.5, 0.2, -0.3], np.float32)
    p_in = np.array([0.4, -0.1, 0.2], np.float32)
    bf1 = set_cell(bf, 1, p_out)
    dt = jnp.full((2,), 2.0 * rm.SQRT3 / 1024)
    x = jnp.asarray(np.stack([p_out, p_in]))
    occ = rm.occupancy_at(x, dt, bf1, cascades=2, bound=2.0)
    assert bool(occ[0]) and not bool(occ[1])
    # same world point marked ONLY in cascade 0 must not satisfy an
    # out-of-unit-cube query (mip_from_pos forces cascade 1 there)
    bf0 = set_cell(bf, 0, p_in)
    occ0 = rm.occupancy_at(x, dt, bf0, cascades=2, bound=2.0)
    assert not bool(occ0[0]) and bool(occ0[1])
    # a large dt forces cascade 1 even inside the unit cube (mip_from_dt)
    dt_big = jnp.full((2,), 0.05)  # > 2*1/128 cell size of cascade 0
    occ_big = rm.occupancy_at(x, dt_big, bf0, cascades=2, bound=2.0)
    assert not bool(occ_big[1])


def test_march_flat_parity_bound2():
    """Flat march == grid march + pack at cascades=2 with per-mip coarse
    tightening and the cone ladder (dt_gamma > 0)."""
    scene = WideSyntheticScene()
    occ = _occ2(scene)
    ds = scene.make_dataset(n_views=1, h=16, w=16, seed=3)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    kw = dict(bound=2.0, cascades=2, dt_gamma=1 / 128, max_steps=512,
              num_candidates=256, min_near=0.05, occ_stride=1,
              coarse_steps=32)
    k, budget = 16, 2048
    g = rm.march_rays_grid(rays["rays_o"], rays["rays_d"], occ.bitfield,
                           k=k, **kw)
    ref = rm.compact_grid_to_flat(g, budget)
    out = rm.march_rays_flat(rays["rays_o"], rays["rays_d"], occ.bitfield,
                             k=k, budget=budget, **kw)
    assert bool(out.valid.any())
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
    v = np.asarray(out.valid)
    np.testing.assert_allclose(np.asarray(out.ts)[v], np.asarray(ref.ts)[v],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.ray_id)[v],
                                  np.asarray(ref.ray_id)[v])
    # samples in the outer shell actually exist (cascade 1 content is hit)
    outer = np.abs(np.asarray(out.xyzs)[v]).max(-1) > 1.0
    assert outer.any()


def test_coarse_tighten_multicascade_keeps_all_occupied_candidates():
    """Tightening must be conservative: every candidate the UNtightened march
    keeps must fall inside the tightened [near, far] (+1 coarse-step slack),
    for both uniform and cone ladders."""
    scene = WideSyntheticScene()
    occ = _occ2(scene)
    ds = scene.make_dataset(n_views=2, h=12, w=12, seed=1)
    for dt_gamma in (0.0, 1 / 128):
        for vi in range(2):
            rays = get_full_rays(jnp.asarray(ds.poses[vi]),
                                 jnp.asarray(ds.intrinsics), ds.h, ds.w)
            ro, rd = rays["rays_o"], rays["rays_d"]
            aabb = jnp.array([-2.0, -2, -2, 2, 2, 2], jnp.float32)
            nears, fars = rm.near_far_from_aabb(ro, rd, aabb, 0.05)
            ts, dts, valid = rm.candidate_ts(nears, fars, 512, dt_gamma,
                                             2.0, 512)
            xyz = ro[:, None, :] + ts[..., None] * rd[:, None, :]
            occ_bit = rm.occupancy_at(xyz, dts, occ.bitfield, 2, 2.0)
            kept = valid & occ_bit & (jnp.abs(xyz).max(-1) <= 2.0)
            n2, f2 = rm.coarse_tighten(ro, rd, occ.bitfield, nears, fars,
                                       cascades=2, bound=2.0, n_steps=64,
                                       dt_gamma=dt_gamma, max_steps=512)
            slack = (fars - nears) / 64 + 1e-5
            t_np, kept_np = np.asarray(ts), np.asarray(kept)
            lo = np.where(kept_np, t_np, np.inf).min(1)
            hi = np.where(kept_np, t_np, -np.inf).max(1)
            has = kept_np.any(1)
            assert (np.asarray(n2)[has] <= lo[has] + np.asarray(slack)[has]).all()
            assert (np.asarray(f2)[has] >= hi[has] - np.asarray(slack)[has]).all()


def test_render_bound2_fast_path_matches_gt_and_tighten_is_lossless():
    """Fast path at bound=2 must reproduce the analytic GT, and per-mip
    coarse tightening must not change the image."""
    scene = WideSyntheticScene()
    occ = _occ2(scene)
    ds = scene.make_dataset(n_views=1, h=32, w=32, seed=4)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    opts = RenderOptions(bound=2.0, dt_gamma=1 / 128, max_steps=512,
                         budget_per_ray=160, num_candidates=384,
                         min_near=0.05, occ_stride=1, coarse_steps=0)
    assert opts.cascades == 2
    out0 = render_rays(None, _SceneField, scene, occ.bitfield,
                       rays["rays_o"], rays["rays_d"], opts, bg_color=1.0)
    img0 = np.asarray(out0["image"]).reshape(ds.h, ds.w, 3)
    gt = np.asarray(ds.images[0], np.float32) / 255.0
    psnr = -10 * np.log10(np.mean((img0 - gt) ** 2) + 1e-12)
    assert psnr > 26.0, psnr
    out1 = render_rays(None, _SceneField, scene, occ.bitfield,
                       rays["rays_o"], rays["rays_d"],
                       dataclasses.replace(opts, coarse_steps=64),
                       bg_color=1.0)
    img1 = np.asarray(out1["image"]).reshape(ds.h, ds.w, 3)
    dpsnr = -10 * np.log10(np.mean((img1 - img0) ** 2) + 1e-12)
    assert dpsnr > 38.0, dpsnr  # tightening is visually lossless
