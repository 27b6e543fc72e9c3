"""Fused ladder-plan kernel vs the XLA reference pieces (interpret mode on
CPU): keep mask must match group_plan at kg=-1, t0/fars must match
coarse_tighten, and fine_cnt must upper-bound (tightly) the fine repack's
kept members."""

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.data.rays import get_full_rays
from seal3d_tpu.data.synthetic import SyntheticScene
from seal3d_tpu.ops.pallas.ladder import ladder_plan, pack_tables
from seal3d_tpu.ops.raymarch import group_plan, pack_groups_expand_fine
from seal3d_tpu.render.occupancy import occupancy_init, occupancy_update


def _setup():
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=24, w=24, seed=5)
    occ = occupancy_update(occupancy_init(cascades=1), scene.density,
                           jax.random.PRNGKey(0), bound=1.0,
                           density_thresh=0.01, full=True)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    return occ.bitfield, rays["rays_o"], rays["rays_d"]


def test_ladder_plan_matches_group_plan():
    bitfield, ro, rd = _setup()
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1], jnp.float32)
    kw = dict(bound=1.0, max_steps=512, num_candidates=256, group=4,
              min_near=0.05, pool=64)
    plan = group_plan(ro, rd, bitfield, cascades=1, k=48, aabb=aabb,
                      coarse_steps=32, kg=-1, **kw)
    tabs = pack_tables(bitfield, pool=64)
    t0, fars, keep, cnt = ladder_plan(ro, rd, *tabs, aabb, n_coarse=32,
                                      **kw)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(plan.t0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fars), np.asarray(plan.fars),
                               rtol=1e-6, atol=1e-6)
    mism = np.asarray(keep) != np.asarray(plan.keep)
    assert mism.mean() < 1e-3, mism.mean()  # borderline-cell float wobble only

    # fine_cnt upper-bounds the members the fine repack actually keeps,
    # and not loosely: the bound stays within ~35% of the true demand
    budget = 24 * 24 * 48
    mf = pack_groups_expand_fine(plan, plan.keep, 0, ro, rd, bitfield,
                                 1.0, 1, 4, budget, budget, 4)
    true_kept = int(np.asarray(mf.valid).sum())
    bound_cnt = float(np.asarray(cnt).sum())
    assert bound_cnt >= true_kept, (bound_cnt, true_kept)
    assert bound_cnt <= true_kept * 1.35 + 64, (bound_cnt, true_kept)


def test_ladder_plan_pad_rays_inert():
    bitfield, ro, rd = _setup()
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1], jnp.float32)
    tabs = pack_tables(bitfield, pool=64)
    # rays that miss the box entirely (the render pad convention)
    ro_p = jnp.tile(jnp.asarray([[3.0, 0, 0]], jnp.float32), (64, 1))
    rd_p = jnp.tile(jnp.asarray([[1.0, 0, 0]], jnp.float32), (64, 1))
    t0, fars, keep, cnt = ladder_plan(ro_p, rd_p, *tabs, aabb, bound=1.0,
                                      max_steps=512, num_candidates=256,
                                      group=4, min_near=0.05, n_coarse=32,
                                      pool=64)
    assert float(cnt.sum()) <= 64.0  # degenerate intervals: <=1 each


def test_kernel_render_matches_xla_two_level():
    """render_rays with tl_kernel=True must reproduce the XLA two-level
    render exactly (same plan -> same packed stream -> same image)."""
    import dataclasses

    from seal3d_tpu.render.renderer import RenderOptions, render_rays

    class _SceneField:
        @staticmethod
        def apply(params, cfg, x, d, valid=None):
            return cfg.density(x), cfg.color(x, d)

    scene = SyntheticScene()
    bitfield, ro, rd = _setup()
    # pool=32 keeps the g=4 span constraint at max_steps=256
    base = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=256,
                         budget_per_ray=32, num_candidates=64, min_near=0.05,
                         occ_stride=4, coarse_steps=32, flat_frac=0.5,
                         march_two_level=True, tl_group=4, tl_pool=32,
                         tl_kg=-1, tl_over=2.0, tl_kernel=False)
    assert base.two_level_ok(32)
    out_x = render_rays(None, _SceneField, scene, bitfield, ro, rd, base,
                        bg_color=1.0)
    kern = dataclasses.replace(base, tl_kernel=True)
    assert kern.tl_kernel_ok(32, None)
    out_k = render_rays(None, _SceneField, scene, bitfield, ro, rd, kern,
                        bg_color=1.0)
    np.testing.assert_allclose(np.asarray(out_k["image"]),
                               np.asarray(out_x["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_k["depth"]),
                               np.asarray(out_x["depth"]), atol=1e-4)
    assert int(out_k["num_samples"]) == int(out_x["num_samples"])
