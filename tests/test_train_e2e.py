"""End-to-end: NGP field + dense renderer + Trainer fit a synthetic scene.

CPU-sized smoke of the full vertical slice (SURVEY.md §7 step 3): loss must
drop and PSNR must beat the untrained baseline. The occupancy fast path gets
its own parity test in test_render_paths.py; the TPU bench exercises it at
full size.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.data.synthetic import SyntheticScene
from seal3d_tpu.models import ngp
from seal3d_tpu.models.ngp import NGPConfig
from seal3d_tpu.render.renderer import RenderOptions
from seal3d_tpu.train.trainer import TrainConfig, Trainer


def _tiny_setup(tmp_path=None):
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=6, h=48, w=48, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15)
    opts = RenderOptions(bound=1.0, num_steps=48, upsample_steps=0, min_near=0.05)
    tcfg = TrainConfig(lr=1e-2, max_steps=200, num_rays=256, eval_chunk=512,
                       random_bg=False,
                       workspace=str(tmp_path) if tmp_path else None)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, use_dense=True,
                 key=jax.random.PRNGKey(0))
    return scene, ds, tr


@pytest.mark.slow
def test_train_improves_psnr(tmp_path):
    scene, ds, tr = _tiny_setup(tmp_path)
    tr.init_state()
    psnr0 = tr.evaluate(max_views=2)
    m = tr.train(steps=150, silent=True)
    psnr1 = tr.evaluate(max_views=2)
    print(f"psnr {psnr0:.2f} -> {psnr1:.2f}")
    assert np.isfinite(m["loss"])
    assert psnr1 > psnr0 + 2.0, (psnr0, psnr1)

    # checkpoint round trip
    p = tr.save_checkpoint()
    step_before = int(tr.state.step)
    tr.init_state()
    tr.load_checkpoint(p)
    assert int(tr.state.step) == step_before
    psnr2 = tr.evaluate(max_views=1)
    assert psnr2 > psnr0


@pytest.mark.slow
def test_adaptive_budget_fast_path():
    """Occupancy fast path with adaptive_budget: mean_count EMA tracks valid
    samples, the trainer picks a flat_frac bucket at grid-update boundaries,
    and training still reduces the loss."""
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=4, h=32, w=32, seed=2)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=15)
    opts = RenderOptions(bound=1.0, budget_per_ray=32, num_candidates=128,
                         max_steps=256, min_near=0.05)
    tcfg = TrainConfig(lr=1e-2, max_steps=400, num_rays=256,
                       update_grid_interval=8, full_grid_updates=2,
                       random_bg=False, adaptive_budget=True)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(1))
    tr.init_state()
    m0 = tr.train(steps=8, silent=True)
    m1 = tr.train(steps=72, silent=True)
    assert np.isfinite(m1["loss"]) and m1["loss"] < m0["loss"]
    mc = float(tr.state.occ.mean_count)
    assert mc > 0  # EMA engaged
    # after full updates pass, a bucket should have been selected
    assert tr.opts.flat_frac is None or 0 < tr.opts.flat_frac <= 1.0
    # retune is stable: re-running doesn't thrash the cache
    n_cached = len(tr._step_cache)
    tr._retune_budget()
    tr._retune_budget()
    assert len(tr._step_cache) <= n_cached + 1


@pytest.mark.slow
def test_retune_bucket_selection_and_warm_start():
    """_retune_budget picks the smallest bucket covering mean_count*1.15 and
    the retune_warm flag lets warm starts (Seal finetune) retune during the
    full-grid-update phase instead of waiting it out."""
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=2, h=16, w=16, seed=3)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=12)
    opts = RenderOptions(bound=1.0, budget_per_ray=32, num_candidates=128,
                         max_steps=256, min_near=0.05)
    tcfg = TrainConfig(lr=1e-2, max_steps=100, num_rays=256,
                       update_grid_interval=8, full_grid_updates=4,
                       random_bg=False, adaptive_budget=True)
    tr = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, key=jax.random.PRNGKey(0))
    tr.init_state()
    cap = tcfg.num_rays * opts.budget_per_ray

    # bucket arithmetic: mean_count at 30% of cap -> 0.375 bucket (>= .3*1.15)
    tr.state = tr.state._replace(occ=tr.state.occ._replace(
        mean_count=jnp.asarray(0.30 * cap, jnp.float32)))
    tr._retune_budget()
    assert tr.opts.flat_frac == 0.375
    # near-full occupancy -> bucket 1.0 -> dense path (None)
    tr.state = tr.state._replace(occ=tr.state.occ._replace(
        mean_count=jnp.asarray(0.95 * cap, jnp.float32)))
    tr._retune_budget()
    assert tr.opts.flat_frac is None
    # unmeasured mean_count is a no-op
    tr.state = tr.state._replace(occ=tr.state.occ._replace(
        mean_count=jnp.asarray(-1.0, jnp.float32)))
    tr.opts = __import__("dataclasses").replace(tr.opts, flat_frac=0.5)
    tr._retune_budget()
    assert tr.opts.flat_frac == 0.5

    # warm start: with retune_warm the first boundary (still in the
    # full-update phase) already selects a bucket from the measured count
    tcfg_w = TrainConfig(lr=1e-2, max_steps=100, num_rays=256,
                         update_grid_interval=8, full_grid_updates=1000,
                         random_bg=False, adaptive_budget=True,
                         retune_warm=True)
    tr2 = Trainer(ngp, fcfg, opts, tcfg_w, dataset=ds,
                  key=jax.random.PRNGKey(0))
    tr2.init_state()
    calls = []
    orig = tr2._retune_budget
    tr2._retune_budget = lambda: (calls.append(1), orig())[1]
    tr2.train(steps=24, silent=True)  # 3 boundaries, all full updates
    assert float(tr2.state.occ.mean_count) > 0
    assert len(calls) >= 2  # retuned at measured boundaries despite full phase
    # and without the flag, the same schedule must NOT have retuned
    tcfg_c = TrainConfig(lr=1e-2, max_steps=100, num_rays=256,
                         update_grid_interval=8, full_grid_updates=1000,
                         random_bg=False, adaptive_budget=True)
    tr3 = Trainer(ngp, fcfg, opts, tcfg_c, dataset=ds,
                  key=jax.random.PRNGKey(0))
    tr3.init_state()
    calls3 = []
    orig3 = tr3._retune_budget
    tr3._retune_budget = lambda: (calls3.append(1), orig3())[1]
    tr3.train(steps=24, silent=True)
    assert not calls3  # untouched: still in full phase


def test_eval_adaptive_buckets_match_fixed_budget():
    """Demand-adaptive eval budgets (TrainConfig.eval_adaptive) must be
    LOSSLESS: render_image with per-chunk buckets must reproduce the fixed
    top-bucket render exactly (a bucket is only picked when the chunk's
    measured demand fits it, so no thinning ever occurs), and compiled
    bucket jits must survive a _build_steps rebuild (budget retunes)."""
    import dataclasses

    import __graft_entry__ as g

    ngp_m, fcfg, opts, tcfg, ds, TrainerCls = g._setup(n_rays=512, h=24,
                                                       w=24, log2_hashmap=12)
    opts = dataclasses.replace(opts, coarse_steps=32)
    tcfg = dataclasses.replace(tcfg, eval_flat_frac=0.5,
                               eval_budget_per_ray=16, eval_chunk=288,
                               eval_two_level=True, eval_adaptive=True)
    tr = TrainerCls(ngp_m, fcfg, opts, tcfg, dataset=ds,
                    key=jax.random.PRNGKey(0))
    tr.init_state()
    tr.state = tr._update_grid_full(tr.state, jax.random.PRNGKey(1))
    img_a, _ = tr.render_image(ds.poses[0], 24, 24)
    assert tr._eval_demand is not None
    assert len(tr._eval_cache) >= 1

    n_cache = len(tr._eval_cache)
    tr.cfg = dataclasses.replace(tr.cfg, eval_adaptive=False)
    tr._build_steps(tr._loss_override)
    assert len(tr._eval_cache) == n_cache  # rebuild kept the bucket jits

    img_f, _ = tr.render_image(ds.poses[0], 24, 24)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_f),
                               atol=1e-6)


def test_tile_chunk_layout_invariants():
    """_chunk_layout must place every pixel in exactly one slot, sort pads
    to each chunk's tail, and produce an inverse permutation that undoes
    the tiling — for tile mode, scanline fallback (non-pow2 chunk), and
    the single-chunk case."""
    import __graft_entry__ as g

    ngp_m, fcfg, opts, tcfg, ds, TrainerCls = g._setup(n_rays=64, h=16,
                                                       w=16, log2_hashmap=12)
    tr = TrainerCls(ngp_m, fcfg, opts, tcfg, dataset=ds,
                    key=jax.random.PRNGKey(0))
    for (h, w, chunk) in ((24, 24, 256), (33, 17, 64), (16, 16, 256),
                          (24, 24, 288), (100, 40, 1024)):
        sel, nv, inv = tr._chunk_layout(h, w, chunk)
        n = h * w
        flat = sel.reshape(-1)
        real = flat[flat >= 0]
        assert sorted(real.tolist()) == list(range(n)), (h, w, chunk)
        assert (nv == (sel >= 0).sum(1)).all()
        # pads strictly at each chunk's tail
        for ci in range(sel.shape[0]):
            assert (sel[ci, :nv[ci]] >= 0).all()
            assert (sel[ci, nv[ci]:] < 0).all()
        # inverse permutation round-trips pixel values
        vals = np.where(flat >= 0, flat, -1)
        assert (vals[inv] == np.arange(n)).all(), (h, w, chunk)


def test_tiled_render_matches_scanline():
    """Tile-ordered chunking must reproduce the scanline-chunked render:
    chunk membership changes which rays share a chunk budget, but with
    demand-adaptive (lossless) buckets every ray keeps the same samples,
    so the images agree to float tolerance."""
    import dataclasses

    import __graft_entry__ as g

    ngp_m, fcfg, opts, tcfg, ds, TrainerCls = g._setup(n_rays=512, h=24,
                                                       w=24, log2_hashmap=12)
    opts = dataclasses.replace(opts, coarse_steps=32)
    # budget 48 keeps every chunk's demand under the 0.5-bucket cap
    # (measured max ~4.1k vs cap 6144), so the adaptive buckets are
    # genuinely lossless and parity is float-tight; a capped budget would
    # thinning-differently per chunk membership BY DESIGN.
    tcfg = dataclasses.replace(tcfg, eval_flat_frac=0.5,
                               eval_budget_per_ray=48, eval_chunk=256,
                               eval_two_level=True, eval_adaptive=True,
                               eval_tile_chunks=True)
    tr = TrainerCls(ngp_m, fcfg, opts, tcfg, dataset=ds,
                    key=jax.random.PRNGKey(0))
    tr.init_state()
    # A realistically SPARSE occupancy (analytic scene surface, not the
    # untrained field's fog): per-ray demand then fits the sub-cap buckets,
    # so the adaptive budgets are lossless and parity is float-tight. A
    # fog-dense grid would thin differently per chunk membership by design.
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.render.occupancy import occupancy_init, occupancy_update

    occ_sharp = occupancy_update(
        occupancy_init(cascades=1), SyntheticScene().density,
        jax.random.PRNGKey(2), bound=1.0, density_thresh=0.01, full=True)
    tr.state = tr.state._replace(
        occ=tr.state.occ._replace(bitfield=occ_sharp.bitfield))
    img_t, dep_t = tr.render_image(ds.poses[0], 24, 24)
    tr.cfg = dataclasses.replace(tr.cfg, eval_tile_chunks=False)
    img_s, dep_s = tr.render_image(ds.poses[0], 24, 24)
    # different chunk membership permutes the packing/composite order ->
    # f32 association noise only (measured max ~3e-5)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_s),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(dep_t), np.asarray(dep_s),
                               atol=1e-3)
