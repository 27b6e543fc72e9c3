"""Fast-path vs oracle parity: occupancy-compacted rendering must reproduce
the dense renderer's images on the analytic scene (SURVEY.md §4: the dense
`run()` path is the golden reference for the grid-marched path)."""

import jax
import jax.numpy as jnp
import pytest
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


_OCC_CACHE = {}


def _shared_occ(thresh=0.01):
    """One full 128^3 occupancy build shared by every test that uses the
    standard grid (cascades=1, bound=1.0, thresh=0.01, PRNGKey(0), full):
    the update queries ~2M analytic densities and was repeated 16x across
    this file — the single largest CPU cost of the fast lane. OccState is
    a NamedTuple of immutable jnp arrays, so sharing is safe."""
    if thresh not in _OCC_CACHE:
        occ = occupancy_init(cascades=1)
        _OCC_CACHE[thresh] = occupancy_update(
            occ, SyntheticScene().density, jax.random.PRNGKey(0),
            bound=1.0, density_thresh=thresh, full=True)
    return _OCC_CACHE[thresh]


def test_occupancy_path_matches_scene_gt():
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=32, w=32, seed=3)

    # Build an occupancy grid from the analytic density via the real update fn.
    occ = _shared_occ()
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


@pytest.mark.slow
def test_flat_compaction_matches_topk_path():
    """[slow lane: compaction='flat' is the non-default scatter fallback;
    the production topk/flat_frac path keeps its fast-lane parity tests.]
    render_rays with compaction='flat' (global scatter budget) must agree
    with the default top-k path when neither is budget-limited."""
    import dataclasses

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=24, w=24, seed=5)
    occ = _shared_occ(thresh=10.0)
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


def test_march_rays_flat_matches_grid_then_pack():
    """march_rays_flat (one argsort straight to the packed layout) must
    produce the exact sample stream of march_rays_grid + compact_grid_to_flat
    — same kept candidates, order, deltas (incl. over-budget stride
    rescaling), offsets and counts."""
    from seal3d_tpu.ops.raymarch import (compact_grid_to_flat,
                                         march_rays_flat, march_rays_grid)

    scene = SyntheticScene()
    occ = _shared_occ()
    ds = scene.make_dataset(n_views=1, h=16, w=16, seed=3)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    kw = dict(bound=1.0, cascades=1, dt_gamma=0.0, max_steps=256,
              num_candidates=256, min_near=0.05, occ_stride=1,
              coarse_steps=32)
    # k small enough that some rays hit the stride-subsample path
    k, budget = 16, 2048
    g = march_rays_grid(rays["rays_o"], rays["rays_d"], occ.bitfield, k=k,
                        **kw)
    ref = compact_grid_to_flat(g, budget)
    out = march_rays_flat(rays["rays_o"], rays["rays_d"], occ.bitfield, k=k,
                          budget=budget, **kw)
    assert bool(out.valid.any())
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
    v = np.asarray(out.valid)
    np.testing.assert_allclose(np.asarray(out.ts)[v], np.asarray(ref.ts)[v],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.deltas)[v],
                               np.asarray(ref.deltas)[v], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.ray_id)[v],
                                  np.asarray(ref.ray_id)[v])
    np.testing.assert_allclose(np.asarray(out.xyzs)[v],
                               np.asarray(ref.xyzs)[v], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.offsets),
                                  np.asarray(ref.offsets))
    np.testing.assert_array_equal(np.asarray(out.counts),
                                  np.asarray(ref.counts))


def test_flat_frac_packed_path_matches_topk():
    """flat_frac sort-packing (field runs only on valid samples) must render
    identically to the plain [N,K] topk path when the budget holds every
    valid sample, and stay close when it clips a few."""
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=24, w=24, seed=5)
    occ = _shared_occ()
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    # group_compact off: this test pins CANDIDATE-level packing == topk
    # exactly; the grouped path differs for over-budget rays by design and
    # has its own parity tests (test_grouped_flat_march_*).
    base = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=256,
                         budget_per_ray=64, num_candidates=256, min_near=0.05,
                         group_compact=False)
    out_ref = render_rays(None, _SceneField, scene, occ.bitfield,
                          rays["rays_o"], rays["rays_d"], base, bg_color=1.0)

    import dataclasses

    full = dataclasses.replace(base, flat_frac=0.999)  # holds all valid
    out_full = render_rays(None, _SceneField, scene, occ.bitfield,
                           rays["rays_o"], rays["rays_d"], full, bg_color=1.0)
    frac_used = float(out_full["num_samples"]) / (rays["rays_o"].shape[0] * 64)
    assert frac_used < 0.9, frac_used  # packing actually has headroom
    np.testing.assert_allclose(np.asarray(out_full["image"]),
                               np.asarray(out_ref["image"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_full["depth"]),
                               np.asarray(out_ref["depth"]), atol=2e-4)

    tight = dataclasses.replace(base, flat_frac=0.25)  # clips the tail
    out_tight = render_rays(None, _SceneField, scene, occ.bitfield,
                            rays["rays_o"], rays["rays_d"], tight, bg_color=1.0)
    err = np.abs(np.asarray(out_tight["image"])
                 - np.asarray(out_ref["image"])).mean()
    assert err < 0.05, err


def test_over_budget_stride_subsampling():
    """Drive compact_topk past its budget (count > K -> per-ray stride > 1,
    deltas rescaled) and check (a) every ray's full depth range survives
    (no near-truncation), (b) the rendered image stays close to the
    unconstrained reference (the reference instead drops whole rays when
    over budget, raymarching.py:198-204 — stride-subsampling must not change
    the picture materially)."""
    import dataclasses

    from seal3d_tpu.ops.raymarch import compact_topk, march_rays_grid

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=24, w=24, seed=7)
    occ = _shared_occ()
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)

    # march with a tiny K so central rays exceed the budget
    m_tight = march_rays_grid(rays["rays_o"], rays["rays_d"], occ.bitfield,
                              bound=1.0, cascades=1, dt_gamma=0.0,
                              max_steps=256, k=16, num_candidates=256,
                              min_near=0.05, occ_stride=1)
    m_loose = march_rays_grid(rays["rays_o"], rays["rays_d"], occ.bitfield,
                              bound=1.0, cascades=1, dt_gamma=0.0,
                              max_steps=256, k=256, num_candidates=256,
                              min_near=0.05, occ_stride=1)
    counts = np.asarray(m_loose.valid.sum(1))
    over = counts > 16
    assert over.sum() > 20, over.sum()  # the scenario actually triggers
    # (a) depth coverage: last kept sample reaches the far end of the
    # unconstrained ray (stride subsampling, not truncation)
    t_far_loose = np.asarray(jnp.where(m_loose.valid, m_loose.ts, 0).max(1))
    t_far_tight = np.asarray(jnp.where(m_tight.valid, m_tight.ts, 0).max(1))
    gap = t_far_loose[over] - t_far_tight[over]
    dt = 2 * 1.7320508 / 256
    assert (gap <= 16 * dt + 1e-5).all(), gap.max()  # within one stride step
    # (b) deltas are rescaled so opacity integrates comparably
    base = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=256,
                         budget_per_ray=256, num_candidates=256,
                         min_near=0.05, occ_stride=1)
    tight_opts = dataclasses.replace(base, budget_per_ray=16)
    out_ref = render_rays(None, _SceneField, scene, occ.bitfield,
                          rays["rays_o"], rays["rays_d"], base, bg_color=1.0)
    out_tight = render_rays(None, _SceneField, scene, occ.bitfield,
                            rays["rays_o"], rays["rays_d"], tight_opts,
                            bg_color=1.0)
    err = np.abs(np.asarray(out_tight["image"])
                 - np.asarray(out_ref["image"]))[over].mean()
    assert err < 0.08, err


def test_mark_untrained_matches_corner_projection_oracle():
    """mark_untrained's frustum test vs a brute-force oracle that projects
    all 8 cell corners through every camera (the reference's exact method,
    nerf/renderer.py:379-442): no cell the oracle keeps may be marked
    untrained (over-marking loses scene content; extra kept cells only cost
    occupancy-update queries)."""
    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=3, h=24, w=24, seed=11)
    occ = occupancy_init(cascades=1)
    occ = mark_untrained(occ, jnp.asarray(ds.poses), jnp.asarray(ds.intrinsics),
                         bound=1.0)
    marked_untrained = np.asarray(occ.density_grid[0]) < 0

    # oracle: cell corners through each camera; visible if ANY corner lands
    # in ANY frustum in front of the camera
    coords = np.asarray(morton3d_invert(jnp.arange(GRID_CELLS,
                                                   dtype=jnp.uint32)))
    lo = coords / 128.0 * 2.0 - 1.0           # cell min corner, bound=1
    cell = 2.0 / 128.0
    fx, fy, cx, cy = np.asarray(ds.intrinsics)
    poses = np.asarray(ds.poses)
    vis_any = np.zeros(GRID_CELLS, bool)
    corners = np.array([[(i >> d) & 1 for d in range(3)] for i in range(8)],
                       np.float32)
    for c in corners:
        pts = lo + c * cell                    # [N, 3] world corner
        for pose in poses:
            rel = pts - pose[:3, 3]
            cam = rel @ pose[:3, :3]           # world->cam (R^T contraction)
            z = cam[:, 2]
            ok = (z > 1e-6) & (np.abs(cam[:, 0] / np.maximum(z, 1e-6)) < cx / fx) \
                & (np.abs(cam[:, 1] / np.maximum(z, 1e-6)) < cy / fy)
            vis_any |= ok
    # no oracle-visible cell may be marked untrained
    bad = vis_any & marked_untrained
    assert bad.sum() == 0, f"{bad.sum()} visible cells over-marked"
    # and the heuristic shouldn't keep dramatically more than the oracle
    kept = (~marked_untrained).sum()
    assert kept <= vis_any.sum() * 1.6 + 1000, (kept, vis_any.sum())


def test_coarse_tighten_preserves_image():
    """Per-ray coarse interval tightening must only remove empty space: the
    rendered image matches the untightened one, and rays that miss all
    content get zero valid candidates."""
    import dataclasses

    from seal3d_tpu.ops.raymarch import march_rays_grid

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=24, w=24, seed=9)
    occ = _shared_occ()
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    base = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=96, num_candidates=512, min_near=0.05)
    tight = dataclasses.replace(base, coarse_steps=64, num_candidates=256)
    out_ref = render_rays(None, _SceneField, scene, occ.bitfield,
                          rays["rays_o"], rays["rays_d"], base, bg_color=1.0)
    out_t = render_rays(None, _SceneField, scene, occ.bitfield,
                        rays["rays_o"], rays["rays_d"], tight, bg_color=1.0)
    err = np.abs(np.asarray(out_t["image"]) - np.asarray(out_ref["image"])).mean()
    assert err < 5e-3, err
    # empty rays cost nothing
    m = march_rays_grid(rays["rays_o"], rays["rays_d"], occ.bitfield,
                        bound=1.0, cascades=1, dt_gamma=0.0, max_steps=512,
                        k=96, num_candidates=256, min_near=0.05,
                        coarse_steps=64)
    per_ray = np.asarray(m.valid.sum(1))
    img_ref = np.asarray(out_ref["weights_sum"])
    assert (per_ray[img_ref < 1e-4] == 0).mean() > 0.95


def test_grouped_flat_march_matches_candidate_level():
    """march_rays_flat_grouped (sort over occ_stride-groups) must keep
    exactly the candidate-level path's valid samples when no ray is over
    budget — same (ray_id, t, delta) multiset — and its packing must stay
    ray-contiguous in ascending t with consistent offsets."""
    from seal3d_tpu.ops.raymarch import march_rays_flat, march_rays_flat_grouped

    scene = SyntheticScene()
    occ = _shared_occ()
    ds = scene.make_dataset(n_views=1, h=16, w=16, seed=3)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    kw = dict(bound=1.0, cascades=1, max_steps=256, num_candidates=256,
              min_near=0.05, occ_stride=4, coarse_steps=32)
    k, budget = 128, 16384  # under budget everywhere
    ref = march_rays_flat(rays["rays_o"], rays["rays_d"], occ.bitfield,
                          k=k, budget=budget, dt_gamma=0.0, **kw)
    out = march_rays_flat_grouped(rays["rays_o"], rays["rays_d"],
                                  occ.bitfield, k=k, budget=budget, **kw)
    assert bool(out.valid.any())

    def keyset(m):
        v = np.asarray(m.valid)
        rid = np.asarray(m.ray_id)[v]
        tq = np.round(np.asarray(m.ts)[v] / (2 * 1.7320508 / 256) * 4)
        dl = np.asarray(m.deltas)[v]
        return sorted(zip(rid.tolist(), tq.tolist(), dl.tolist()))

    assert keyset(out) == keyset(ref)
    # packing invariants: ray-major, t ascending within each kept segment
    v = np.asarray(out.valid)
    rid = np.asarray(out.ray_id)
    ts = np.asarray(out.ts)
    kept_rid = rid[v]
    assert (np.diff(kept_rid) >= 0).all()
    same_ray = np.diff(kept_rid) == 0
    assert (np.diff(ts[v])[same_ray] > 0).all()
    offs = np.asarray(out.offsets)
    counts = np.asarray(out.counts)
    for r in np.unique(kept_rid)[:20]:
        seg = np.where((rid == r) & v)[0]
        assert seg.min() >= offs[r]
        assert seg.max() < offs[r] + counts[r]


@pytest.mark.slow
def test_grouped_flat_march_render_parity():
    """[slow lane: group_compact is a default-OFF, measured-negative option
    (PERFORMANCE.md round 2); the default-path guards stay fast.]
    End-to-end render with group_compact on vs off (same budget point,
    incl. over-budget rays) must match closely; exact when under budget."""
    import dataclasses

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=24, w=24, seed=5)
    occ = _shared_occ()
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    base = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=256,
                         budget_per_ray=64, num_candidates=256, min_near=0.05,
                         occ_stride=4, flat_frac=0.9, group_compact=False)
    out_ref = render_rays(None, _SceneField, scene, occ.bitfield,
                          rays["rays_o"], rays["rays_d"], base, bg_color=1.0)
    grp = dataclasses.replace(base, group_compact=True)
    out_grp = render_rays(None, _SceneField, scene, occ.bitfield,
                          rays["rays_o"], rays["rays_d"], grp, bg_color=1.0)
    # Rays that cross the per-ray k limit subsample at group vs candidate
    # granularity (documented semantics delta), so boundary rays differ by
    # O(dt) quadrature — bound the mean and worst-pixel error instead of
    # demanding pixel-exactness (measured: mean 2.5e-4, max 0.013).
    d = np.abs(np.asarray(out_grp["image"]) - np.asarray(out_ref["image"]))
    assert d.mean() < 1e-3, d.mean()
    assert d.max() < 0.05, d.max()
    # tight budget: both paths degrade gracefully and stay close
    tight = dataclasses.replace(base, budget_per_ray=16, flat_frac=0.6)
    out_t0 = render_rays(None, _SceneField, scene, occ.bitfield,
                         rays["rays_o"], rays["rays_d"], tight, bg_color=1.0)
    out_t1 = render_rays(None, _SceneField, scene, occ.bitfield,
                         rays["rays_o"], rays["rays_d"],
                         dataclasses.replace(tight, group_compact=True),
                         bg_color=1.0)
    err = np.abs(np.asarray(out_t1["image"]) - np.asarray(out_t0["image"])).mean()
    assert err < 0.05, err


def test_flat_gather_matches_sort_selection():
    """compact_flat_gather must produce the IDENTICAL packing to
    compact_flat_direct (same kept candidates, order, deltas, ray ids,
    offsets/counts; dump-slot payloads may differ but valid masks match),
    including over-budget rays (stride subsample) and global overflow."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seal3d_tpu.ops.raymarch import (compact_flat_direct,
                                         compact_flat_gather)

    rng = np.random.default_rng(7)
    n, c, k = 64, 96, 16
    ts = np.sort(rng.uniform(0.1, 2.0, (n, c)).astype(np.float32), axis=1)
    dts = np.full((n, c), 0.01, np.float32)
    # mixed validity: some rays dense (over budget k), some sparse, some empty
    valid = rng.random((n, c)) < rng.uniform(0.0, 0.9, (n, 1))
    rays_o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rays_d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)

    for budget in (128, 384, 1024):  # overflow, mid, roomy
        a = compact_flat_direct(jnp.asarray(ts), jnp.asarray(dts),
                                jnp.asarray(valid), jnp.asarray(rays_o),
                                jnp.asarray(rays_d), k, budget)
        b = compact_flat_gather(jnp.asarray(ts), jnp.asarray(dts),
                                jnp.asarray(valid), jnp.asarray(rays_o),
                                jnp.asarray(rays_d), k, budget)
        np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
        np.testing.assert_array_equal(np.asarray(a.offsets), np.asarray(b.offsets))
        np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
        va = np.asarray(a.valid)
        for fa, fb in ((a.ts, b.ts), (a.deltas, b.deltas),
                       (a.ray_id, b.ray_id)):
            np.testing.assert_array_equal(np.asarray(fa)[va], np.asarray(fb)[va])
        np.testing.assert_allclose(np.asarray(a.xyzs)[va],
                                   np.asarray(b.xyzs)[va], rtol=1e-6)


@pytest.mark.slow
def test_term_rounds_matches_single_round():
    """[slow lane: term_rounds defaults to 1 and the default-relevant 2level
    variant keeps its fast-lane guards below.]
    Transmittance-terminated multi-round rendering (term_rounds > 1) must
    reproduce the single-round packed render: with generous budgets the only
    samples it may drop are post-saturation ones whose weight is already
    < term_thresh, so images agree to that tolerance."""
    import dataclasses

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=32, w=32, seed=7)
    occ = _shared_occ()
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    base = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=64, num_candidates=256, min_near=0.05,
                         occ_stride=4, coarse_steps=64, flat_frac=0.75)
    single = render_rays(None, _SceneField, scene, occ.bitfield,
                         rays["rays_o"], rays["rays_d"], base)
    for rounds in (2, 4):
        ropts = dataclasses.replace(
            base, term_rounds=rounds,
            term_budget_fracs=tuple([1.0 / rounds] * rounds))
        multi = render_rays(None, _SceneField, scene, occ.bitfield,
                            rays["rays_o"], rays["rays_d"], ropts)
        # Per-round subsampling (k/rounds per slice vs k over the whole
        # ladder) legitimately re-strides a handful of boundary rays; demand
        # overall agreement + near-zero outlier mass instead of exact match.
        err = np.abs(np.asarray(multi["image"]) - np.asarray(single["image"]))
        assert err.mean() < 1e-3, err.mean()
        assert (err > 2e-2).mean() < 2e-3, (err > 2e-2).mean()
        werr = np.abs(np.asarray(multi["weights_sum"])
                      - np.asarray(single["weights_sum"]))
        assert werr.mean() < 1e-3, werr.mean()


def test_term_rounds_drops_saturated_samples():
    """On an opaque scene, later rounds must run far fewer real samples than
    a termination-free multi-round render (the whole point of the rounds),
    while the image stays put."""
    import dataclasses

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=32, w=32, seed=9)
    occ = _shared_occ()
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)

    class _OpaqueField(_SceneField):
        @staticmethod
        def apply(params, cfg, x, d):
            return cfg.density(x) * 200.0, cfg.color(x, d)

    kw = dict(bound=1.0, dt_gamma=0.0, max_steps=512, budget_per_ray=64,
              num_candidates=256, min_near=0.05, occ_stride=4,
              coarse_steps=64, flat_frac=0.75, term_rounds=8,
              term_budget_fracs=tuple([1.0 / 8] * 8))
    opts_term = RenderOptions(**kw)
    opts_noterm = dataclasses.replace(RenderOptions(**kw), term_thresh=1e-30)
    out_t = render_rays(None, _OpaqueField, scene, occ.bitfield,
                        rays["rays_o"], rays["rays_d"], opts_term)
    out_n = render_rays(None, _OpaqueField, scene, occ.bitfield,
                        rays["rays_o"], rays["rays_d"], opts_noterm)
    ns_t = int(out_t["num_samples"])
    ns_n = int(out_n["num_samples"])
    # Termination is round-granular: only samples in rounds after the one
    # that saturated the ray can be dropped (measured 26% here at R=8; the
    # candidate-level ceiling on this scene is ~76%).
    assert ns_t < 0.85 * ns_n, (ns_t, ns_n)
    np.testing.assert_allclose(np.asarray(out_t["image"]),
                               np.asarray(out_n["image"]), atol=2e-3)


def test_two_level_march_matches_single_level_under_budget():
    """march_rays_flat_2level must keep EXACTLY the single-level march's
    valid samples when no ray is over budget: the dilated pooled midpoint
    test is conservative (no group containing a fine-valid member is ever
    dropped), the fine ladder/occupancy are identical (stride alignment:
    g % occ_stride == 0 means both paths test the same candidates), and the
    fine repack removes every false-positive group's members."""
    from seal3d_tpu.ops.raymarch import march_rays_flat, march_rays_flat_2level

    scene = SyntheticScene()
    occ = _shared_occ()
    ds = scene.make_dataset(n_views=1, h=16, w=16, seed=3)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    kw = dict(bound=1.0, cascades=1, max_steps=256, num_candidates=256,
              min_near=0.05, occ_stride=4, coarse_steps=32)
    k, budget = 256, 16384  # under budget everywhere (k == num_candidates)
    ref = march_rays_flat(rays["rays_o"], rays["rays_d"], occ.bitfield,
                          k=k, budget=budget, dt_gamma=0.0, **kw)
    # max_steps=256 -> dt_min too coarse for g=8 (gate rejects); g=4 fits
    out = march_rays_flat_2level(rays["rays_o"], rays["rays_d"], occ.bitfield,
                                 k=k, budget=budget, group=4, over=1.5, **kw)
    assert bool(out.valid.any())

    def keyset(m):
        v = np.asarray(m.valid)
        rid = np.asarray(m.ray_id)[v]
        tq = np.round(np.asarray(m.ts)[v] / (2 * 1.7320508 / 256) * 4)
        dl = np.asarray(m.deltas)[v]
        return sorted(zip(rid.tolist(), tq.tolist(), dl.tolist()))

    assert keyset(out) == keyset(ref)
    # packing invariants: ray-major, t ascending, offsets/counts consistent
    v = np.asarray(out.valid)
    rid = np.asarray(out.ray_id)
    ts = np.asarray(out.ts)
    kept_rid = rid[v]
    assert (np.diff(kept_rid) >= 0).all()
    same_ray = np.diff(kept_rid) == 0
    assert (np.diff(ts[v])[same_ray] > 0).all()
    offs = np.asarray(out.offsets)
    counts = np.asarray(out.counts)
    for r in np.unique(kept_rid)[:20]:
        seg = np.where((rid == r) & v)[0]
        assert seg.min() >= offs[r]
        assert seg.max() < offs[r] + counts[r]


def test_two_level_march_render_parity():
    """End-to-end render with march_two_level on vs off: exact when under
    budget; close when the per-ray k limit forces group-granular (vs
    candidate-granular) stride subsampling."""
    import dataclasses

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=24, w=24, seed=5)
    occ = _shared_occ()
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    base = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=256,
                         budget_per_ray=64, num_candidates=256, min_near=0.05,
                         occ_stride=4, flat_frac=0.9, march_two_level=False,
                         tl_group=4)
    assert dataclasses.replace(base, march_two_level=True).two_level_ok(64)
    out_ref = render_rays(None, _SceneField, scene, occ.bitfield,
                          rays["rays_o"], rays["rays_d"], base, bg_color=1.0)
    tl = dataclasses.replace(base, march_two_level=True)
    out_tl = render_rays(None, _SceneField, scene, occ.bitfield,
                         rays["rays_o"], rays["rays_d"], tl, bg_color=1.0)
    d = np.abs(np.asarray(out_tl["image"]) - np.asarray(out_ref["image"]))
    assert d.mean() < 1e-3, d.mean()
    assert d.max() < 0.05, d.max()
    # tight budget: group-stride subsampling differs by design; stay close
    tight = dataclasses.replace(base, budget_per_ray=16, flat_frac=0.6)
    out_t0 = render_rays(None, _SceneField, scene, occ.bitfield,
                         rays["rays_o"], rays["rays_d"], tight, bg_color=1.0)
    out_t1 = render_rays(None, _SceneField, scene, occ.bitfield,
                         rays["rays_o"], rays["rays_d"],
                         dataclasses.replace(tight, march_two_level=True),
                         bg_color=1.0)
    err = np.abs(np.asarray(out_t1["image"]) - np.asarray(out_t0["image"])).mean()
    assert err < 0.05, err


@pytest.mark.slow
def test_two_level_march_is_conservative_superset_prepack():
    """Every fine-valid candidate of the single-level march must appear in
    the two-level output when k and budgets are unconstrained — the dilated
    32^3 midpoint test may only ADD false-positive groups (removed by the
    fine repack), never drop a fine-valid member."""
    from seal3d_tpu.ops.raymarch import march_rays_flat, march_rays_flat_2level

    scene = SyntheticScene()
    occ = _shared_occ(thresh=10.0)
    ds = scene.make_dataset(n_views=2, h=12, w=12, seed=11)
    for view in range(2):
        rays = get_full_rays(jnp.asarray(ds.poses[view]),
                             jnp.asarray(ds.intrinsics), ds.h, ds.w)
        kw = dict(bound=1.0, cascades=1, max_steps=512, num_candidates=512,
                  min_near=0.05, occ_stride=2, coarse_steps=0)
        k, budget = 512, 36864
        ref = march_rays_flat(rays["rays_o"], rays["rays_d"], occ.bitfield,
                              k=k, budget=budget, dt_gamma=0.0, **kw)
        out = march_rays_flat_2level(rays["rays_o"], rays["rays_d"],
                                     occ.bitfield, k=k, budget=budget,
                                     group=8, over=1.5, **kw)

        def keyset(m):
            v = np.asarray(m.valid)
            rid = np.asarray(m.ray_id)[v]
            tq = np.round(np.asarray(m.ts)[v] / (2 * 1.7320508 / 512) * 4)
            return set(zip(rid.tolist(), tq.tolist()))

        missing = keyset(ref) - keyset(out)
        assert not missing, f"view {view}: {len(missing)} dropped samples"


def test_term_rounds_2level_matches_plain_rounds():
    """The two-level terminated renderer (_render_rounds_2level: per-round
    group pack + fine repack) must agree with the candidate-level rounds
    renderer AND with the single-round render at generous budgets — the
    hierarchy and the round slicing change the schedule/packing, never the
    sample stream semantics."""
    import dataclasses

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=1, h=32, w=32, seed=7)
    occ = _shared_occ()
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    base = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=512,
                         budget_per_ray=64, num_candidates=256, min_near=0.05,
                         occ_stride=4, coarse_steps=64, flat_frac=0.75,
                         march_two_level=True, tl_group=8)
    assert base.two_level_ok(64)
    # Reference: single-round render on the SAME two-level plan (identical
    # group-stride subsample), so the rounds machinery is pinned tightly.
    single_tl = render_rays(None, _SceneField, scene, occ.bitfield,
                            rays["rays_o"], rays["rays_d"], base)
    # Candidate-level single render: over-k rays subsample at candidate
    # (not group) granularity — a documented semantics delta, so loose.
    single_cand = render_rays(
        None, _SceneField, scene, occ.bitfield, rays["rays_o"],
        rays["rays_d"], dataclasses.replace(base, march_two_level=False))
    for rounds in (2, 4):
        ropts = dataclasses.replace(
            base, term_rounds=rounds,
            term_budget_fracs=tuple([1.0 / rounds] * rounds))
        out_tl = render_rays(None, _SceneField, scene, occ.bitfield,
                             rays["rays_o"], rays["rays_d"], ropts)
        err = np.abs(np.asarray(out_tl["image"])
                     - np.asarray(single_tl["image"]))
        # same sample stream, chained composite: only termination (weights
        # < term_thresh) and round-budget clipping may perturb
        assert err.mean() < 2e-4, (rounds, err.mean())
        assert (err > 2e-2).mean() < 1e-3, rounds
        err_c = np.abs(np.asarray(out_tl["image"])
                       - np.asarray(single_cand["image"]))
        assert err_c.mean() < 8e-3, (rounds, err_c.mean())

def test_flat_pack_overflow_degrades_gracefully():
    """Round-4: compact_flat_direct's global-budget overflow must thin
    EVENLY across rays with per-ray delta rescale (optical depth conserved
    to first order) instead of dropping all trailing rays' samples — the
    single-level analog of the two-level repack fix."""
    import jax.numpy as jnp
    import numpy as np

    from seal3d_tpu.ops.raymarch import compact_flat_direct

    rng = np.random.default_rng(3)
    n, c, k = 32, 64, 64
    ts = np.sort(rng.uniform(0.1, 2.0, (n, c)).astype(np.float32), axis=1)
    dts = np.full((n, c), 0.01, np.float32)
    valid = np.ones((n, c), bool)  # every ray fully dense: demand = 2048
    rays_o = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rays_d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)

    budget = 512  # 4x over-subscribed
    m = compact_flat_direct(jnp.asarray(ts), jnp.asarray(dts),
                            jnp.asarray(valid), jnp.asarray(rays_o),
                            jnp.asarray(rays_d), k, budget)
    counts = np.asarray(m.counts)
    # EVERY ray keeps samples (no trailing-ray dropout), evenly ~budget/n
    assert counts.min() >= budget // n - 1
    assert counts.max() <= budget // n + 1
    # per-ray optical depth conserved to first order by the delta rescale
    va = np.asarray(m.valid)
    rid = np.asarray(m.ray_id)[va]
    od = np.zeros(n)
    np.add.at(od, rid, np.asarray(m.deltas)[va])
    np.testing.assert_allclose(od, np.full(n, c * 0.01), rtol=0.1)

    # under budget: bit-exact to the ungated path (prefix of the keeps)
    m2 = compact_flat_direct(jnp.asarray(ts), jnp.asarray(dts),
                             jnp.asarray(valid), jnp.asarray(rays_o),
                             jnp.asarray(rays_d), k, n * c)
    assert np.asarray(m2.valid).sum() == n * c
    np.testing.assert_allclose(np.asarray(m2.deltas), 0.01, rtol=1e-6)


def test_two_level_overflow_degrades_gracefully():
    """When demand exceeds the static budgets, pack_groups_expand_fine must
    thin every ray's samples evenly (with delta rescale conserving per-ray
    optical depth to first order) instead of wiping out all trailing rays —
    the round-3 regression where a dense 256^2 val chunk overflowed the -O
    eval budget and PSNR collapsed 41.3 -> 26.2 dB."""
    from seal3d_tpu.ops.raymarch import march_rays_flat_2level

    scene = SyntheticScene()
    occ = _shared_occ()
    ds = scene.make_dataset(n_views=1, h=16, w=16, seed=13)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    kw = dict(bound=1.0, cascades=1, max_steps=512, num_candidates=512,
              min_near=0.05, occ_stride=2, coarse_steps=0, group=8, over=1.5)
    n = rays["rays_o"].shape[0]

    ref = march_rays_flat_2level(rays["rays_o"], rays["rays_d"], occ.bitfield,
                                 k=512, budget=n * 512, **kw)
    v = np.asarray(ref.valid)
    rid = np.asarray(ref.ray_id)
    ref_counts = np.bincount(rid[v], minlength=n)
    ref_depth = np.bincount(rid[v], weights=np.asarray(ref.deltas)[v],
                            minlength=n)
    demand = int(v.sum())
    assert demand > 2000  # scene must be dense enough to mean anything

    budget = max(demand // 3 // 128 * 128, 128)  # ~3x over budget
    out = march_rays_flat_2level(rays["rays_o"], rays["rays_d"], occ.bitfield,
                                 k=512, budget=budget, **kw)
    vo = np.asarray(out.valid)
    rido = np.asarray(out.ray_id)
    out_counts = np.bincount(rido[vo], minlength=n)
    out_depth = np.bincount(rido[vo], weights=np.asarray(out.deltas)[vo],
                            minlength=n)
    assert vo.sum() <= budget

    # (a) no trailing-ray wipeout: rays late in slot order with real demand
    # keep samples (slot-order truncation gave them exactly zero)
    heavy = np.where(ref_counts >= 8)[0]
    late_heavy = heavy[int(0.75 * heavy.size):]  # last quartile in slot order
    assert late_heavy.size > 0
    kept_frac = (out_counts[late_heavy] > 0).mean()
    assert kept_frac > 0.9, kept_frac

    # (b) per-ray optical depth conserved to first order by delta rescale
    sel = ref_counts >= 8
    ratio = out_depth[sel] / ref_depth[sel]
    assert np.median(ratio) > 0.8, np.median(ratio)
    assert np.median(ratio) < 1.25, np.median(ratio)
    assert (ratio > 0.5).mean() > 0.95, (ratio > 0.5).mean()


def test_pack_shards_matches_global_pack():
    """compact_flat_sharded (per-ray-slice packing for DP, ops/raymarch.py)
    must keep each ray's exact sample stream: same kept (ts, deltas,
    ray_id) per ray as the global pack under budget, and the rendered image
    must match bitwise-close — only the slot layout (inter-slice pads) may
    differ."""
    from seal3d_tpu.ops.raymarch import march_rays_flat

    scene = SyntheticScene()
    occ = _shared_occ()
    ds = scene.make_dataset(n_views=1, h=16, w=16, seed=5)
    rays = get_full_rays(jnp.asarray(ds.poses[0]), jnp.asarray(ds.intrinsics),
                         ds.h, ds.w)
    n = rays["rays_o"].shape[0]
    kw = dict(bound=1.0, cascades=1, dt_gamma=0.0, max_steps=256,
              num_candidates=256, min_near=0.05, occ_stride=2,
              coarse_steps=32)
    k, budget = 16, 4096  # generous: no thinning in either layout
    ref = march_rays_flat(rays["rays_o"], rays["rays_d"], occ.bitfield,
                          k=k, budget=budget, **kw)
    out = march_rays_flat(rays["rays_o"], rays["rays_d"], occ.bitfield,
                          k=k, budget=budget, shards=4, **kw)
    assert bool(out.valid.any())

    def per_ray(m):
        v = np.asarray(m.valid)
        rid = np.asarray(m.ray_id)[v]
        return {r: (np.asarray(m.ts)[v][rid == r],
                    np.asarray(m.deltas)[v][rid == r])
                for r in np.unique(rid)}

    pr_ref, pr_out = per_ray(ref), per_ray(out)
    assert set(pr_ref) == set(pr_out)
    for r in pr_ref:
        np.testing.assert_allclose(pr_out[r][0], pr_ref[r][0], rtol=1e-6)
        np.testing.assert_allclose(pr_out[r][1], pr_ref[r][1], rtol=1e-6)

    # end-to-end: the renderer's pack_shards option produces the same image
    opts1 = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=256,
                          budget_per_ray=16, num_candidates=256,
                          min_near=0.05, coarse_steps=32, flat_frac=0.75)
    opts4 = RenderOptions(bound=1.0, dt_gamma=0.0, max_steps=256,
                          budget_per_ray=16, num_candidates=256,
                          min_near=0.05, coarse_steps=32, flat_frac=0.75,
                          pack_shards=4)
    out1 = render_rays(None, _SceneField, scene, occ.bitfield,
                       rays["rays_o"], rays["rays_d"], opts1, bg_color=1.0)
    out4 = render_rays(None, _SceneField, scene, occ.bitfield,
                       rays["rays_o"], rays["rays_d"], opts4, bg_color=1.0)
    np.testing.assert_allclose(np.asarray(out4["image"]),
                               np.asarray(out1["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out4["weights_sum"]),
                               np.asarray(out1["weights_sum"]), atol=1e-5)
