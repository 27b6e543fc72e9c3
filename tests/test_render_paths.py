"""Fast-path vs oracle parity: occupancy-compacted rendering must reproduce
the dense renderer's images on the analytic scene (SURVEY.md §4: the dense
`run()` path is the golden reference for the grid-marched path)."""

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.data.synthetic import SyntheticScene
from seal3d_tpu.data.rays import get_full_rays
from seal3d_tpu.ops.bitfield import GRID_CELLS, packbits
from seal3d_tpu.ops.morton import morton3d_invert
from seal3d_tpu.render.renderer import RenderOptions, render_rays
from seal3d_tpu.render.occupancy import occupancy_init, occupancy_update, mark_untrained


class _SceneField:
    """Adapter: analytic scene -> field-module interface."""

    @staticmethod
    def apply(params, cfg, x, d):
        return cfg.density(x), cfg.color(x, d)

    @staticmethod
    def density(params, cfg, x):
        return {"sigma": cfg.density(x), "geo_feat": None}


def test_occupancy_path_matches_scene_gt():
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=40, w=40, seed=3)

    # Build an occupancy grid from the analytic density via the real update fn.
    occ = occupancy_init(cascades=1)
    occ = occupancy_update(occ, scene.density, jax.random.PRNGKey(0), bound=1.0,
                           density_thresh=0.01, full=True)
    assert float((occ.density_grid > 0.01).mean()) > 0.01

    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    opts = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=160, num_candidates=512, min_near=0.05)
    out = render_rays(None, _SceneField, scene, occ.bitfield,
                      rays["rays_o"], rays["rays_d"], opts, bg_color=1.0)
    img = np.asarray(out["image"]).reshape(ds.h, ds.w, 3)
    gt = np.asarray(ds.images[0], np.float32) / 255.0
    err = np.abs(img - gt).mean()
    psnr = -10 * np.log10(np.mean((img - gt) ** 2) + 1e-12)
    print(f"occ-path vs gt: mae={err:.4f} psnr={psnr:.2f}")
    assert psnr > 28.0, psnr


def test_mark_untrained_blocks_unseen_cells():
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=4, h=24, w=24, seed=1)
    occ = occupancy_init(cascades=1)
    occ = mark_untrained(occ, jnp.asarray(ds.poses), jnp.asarray(ds.intrinsics),
                         bound=1.0)
    frac_untrained = float((occ.density_grid < 0).mean())
    # orbit cameras at radius 2.2 with 50deg fov see the center but not all corners
    assert 0.0 < frac_untrained < 0.9, frac_untrained
    # center cells must stay trained
    coords = np.asarray(morton3d_invert(jnp.arange(GRID_CELLS, dtype=jnp.uint32)))
    center = (np.abs(coords - 63.5) < 8).all(-1)
    assert (np.asarray(occ.density_grid[0])[center] >= 0).all()


def test_flat_compaction_matches_topk_path():
    """render_rays with compaction='flat' (global scatter budget) must agree
    with the default top-k path when neither is budget-limited."""
    import dataclasses

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=24, w=24, seed=5)
    occ = occupancy_init(cascades=1)
    occ = occupancy_update(occ, scene.density, jax.random.PRNGKey(0), bound=1.0,
                           density_thresh=10.0, full=True)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    base = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=256,
                         budget_per_ray=256, num_candidates=256, min_near=0.05,
                         occ_stride=1)
    out_topk = render_rays(None, _SceneField, scene, occ.bitfield,
                           rays["rays_o"], rays["rays_d"], base)
    flat = dataclasses.replace(base, compaction="flat")
    out_flat = render_rays(None, _SceneField, scene, occ.bitfield,
                           rays["rays_o"], rays["rays_d"], flat)
    np.testing.assert_allclose(np.asarray(out_topk["image"]),
                               np.asarray(out_flat["image"]), atol=5e-3)
