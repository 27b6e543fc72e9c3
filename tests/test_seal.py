"""Seal editing layer tests: mapper geometry/color semantics + a tiny
end-to-end bbox edit distillation (teacher -> student) on the synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seal3d_tpu.seal import geometry as geo
from seal3d_tpu.seal.color import hsv_to_rgb, rgb_to_hsv
from seal3d_tpu.seal.mappers import build_mapper, map_color, map_mask, map_to_origin
from seal3d_tpu.seal.renderer import (cells_to_byte_masks, force_fill_cells,
                                      hack_bitfield)


def _translate(t):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = t
    return m


def _cube_points(center, half, n=5):
    g = np.linspace(-half, half, n)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    return pts + np.asarray(center)


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (256, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_points_in_mesh_box():
    verts, faces = geo.box_mesh_from_aabb(np.array([[-1, -1, -1], [1, 1, 1.0]]))
    tris = jnp.asarray(verts[faces])
    pts = jnp.array([[0.0, 0, 0], [0.5, 0.5, -0.5], [1.5, 0, 0], [0, -2, 0]])
    inside = np.asarray(geo.points_in_mesh(pts, tris))
    np.testing.assert_array_equal(inside, [True, True, False, False])


def test_bbox_mapper_translate(tmp_path):
    """Points in the target region must map back to the source region."""
    src_center = np.array([0.3, 0.0, 0.0])
    shift = np.array([0.0, 0.4, 0.0])
    config = {
        "type": "bbox",
        "raw": _cube_points(src_center, 0.15).tolist(),
        "transform": _translate(shift).tolist(),
        "scale": [1.0, 1.0, 1.0],
    }
    m = build_mapper(config, workspace=str(tmp_path))
    assert (tmp_path / "from.obj").exists() and (tmp_path / "to.obj").exists()

    tgt_pts = jnp.asarray((_cube_points(src_center + shift, 0.1)).astype(np.float32))
    far_pts = jnp.asarray(_cube_points([-0.6, -0.6, -0.6], 0.05).astype(np.float32))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (tgt_pts.shape[0], 1))

    mask_t = np.asarray(map_mask(m, tgt_pts))
    assert mask_t.mean() > 0.9, mask_t.mean()
    assert not np.asarray(map_mask(m, far_pts)).any()

    mapped, mdirs, mask = map_to_origin(m, tgt_pts, dirs)
    mapped = np.asarray(mapped)[np.asarray(mask)]
    expect = np.asarray(tgt_pts)[np.asarray(mask)] - shift
    np.testing.assert_allclose(mapped, expect, atol=1e-5)
    # identity rotation -> dirs unchanged
    np.testing.assert_allclose(np.asarray(mdirs), np.asarray(dirs), atol=1e-6)


def test_bbox_mapper_rotation_scale():
    theta = np.pi / 2
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    tf = np.eye(4)
    tf[:3, :3] = rot
    config = {
        "type": "bbox",
        "raw": _cube_points([0.0, 0.0, 0.0], 0.2).tolist(),
        "transform": tf.tolist(),
        "scale": [2.0, 1.0, 1.0],
    }
    m = build_mapper(config)
    p = jnp.array([[0.0, 0.3, 0.0]])  # rot(z,90) of (0.3, 0, 0)... in target space
    d = jnp.array([[0.0, 1.0, 0.0]])
    mapped, mdirs, mask = map_to_origin(m, p, d)
    assert bool(mask[0])
    # inverse rotate: (0.3, 0, 0); inverse scale x2 about center 0: (0.15, 0, 0)
    np.testing.assert_allclose(np.asarray(mapped[0]), [0.15, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(mdirs[0]), [1.0, 0.0, 0.0], atol=1e-5)


def test_brush_mapper_lift():
    """Points just above the painted plane map down by the pressure vector."""
    g = np.linspace(-0.2, 0.2, 9)
    gx, gz = np.meshgrid(g, g)
    pts = np.stack([gx, np.zeros_like(gx), gz], -1).reshape(-1, 3)
    config = {
        "type": "brush",
        "raw": pts.tolist(),
        "normal": [0.0, 1.0, 0.0],
        "brushType": "line",
        "brushPressure": 0.1,
        "brushDepth": 1.0,
        "attenuationDistance": 0.0,
        "attenuationMode": "linear",
    }
    m = build_mapper(config)
    q = jnp.array([[0.0, 0.1, 0.0], [0.0, -0.05, 0.0], [0.9, 0.1, 0.0]])
    mask = np.asarray(map_mask(m, q))
    assert mask[0] and mask[1] and not mask[2]
    mapped, _, _ = map_to_origin(m, q, None)
    # center points far from border: full shift down by pressure*normal
    np.testing.assert_allclose(np.asarray(mapped[0]), [0.0, 0.0, 0.0], atol=0.02)


def test_anchor_mapper_pull():
    g = np.linspace(-0.2, 0.2, 7)
    gx, gz = np.meshgrid(g, g)
    raw = np.stack([gx, np.zeros_like(gx), gz], -1).reshape(-1, 3)
    config = {
        "type": "anchor",
        "raw": raw.tolist(),
        "translation": [0.0, 0.3, 0.0],
        "radius": 0.25,
        "scale": [1.0, 1.0, 1.0],
    }
    m = build_mapper(config)
    # a point near the translated anchor tip should be mapped (back toward plane)
    tip = jnp.array([[0.0, 0.25, 0.0], [0.8, 0.8, 0.8]])
    mapped, _, mask = map_to_origin(m, tip, None)
    mask = np.asarray(mask)
    assert mask[0] and not mask[1]
    assert np.asarray(mapped)[0, 1] < 0.25  # pulled toward the source plane


def test_map_color_hsv_and_rgb():
    config = {
        "type": "bbox",
        "raw": _cube_points([0, 0, 0], 0.2).tolist(),
        "transform": np.eye(4).tolist(),
        "scale": [1.0, 1.0, 1.0],
        "rgb": [1.0, 0.0, 0.0],
    }
    m = build_mapper(config)
    pts = jnp.zeros((8, 3))
    colors = jnp.full((8, 3), 0.5)
    out = np.asarray(map_color(m, pts, None, colors))
    # recolored toward red hue
    assert (out[:, 0] > out[:, 1] + 0.2).all() and (out[:, 0] > out[:, 2] + 0.2).all()


def test_force_fill_and_hack_bitfield():
    bounds = np.array([[[-0.1, -0.1, -0.1], [0.1, 0.1, 0.1]]], np.float32)
    cells = force_fill_cells(bounds, cascades=1, bound=1.0)
    # 0.2/2 * 128 = 12.8 -> ~13^3 cells
    assert 1500 < len(cells) < 5000, len(cells)
    byte_idx, masks = cells_to_byte_masks(cells)
    bf = jnp.zeros((2**21 // 8,), jnp.uint8)
    bf2 = hack_bitfield(bf, jnp.asarray(byte_idx), jnp.asarray(masks))
    total_bits = int(jnp.unpackbits(bf2).sum())
    assert total_bits == len(cells)


@pytest.mark.slow
def test_seal_bbox_edit_e2e(tmp_path):
    """Tiny teacher->student bbox edit: pretraining must distill the proxy
    (mapped-teacher) field into the student — sigma and color errors on the
    local shell decrease, and the proxy teacher itself shows the object at
    the translated location. (Full-scale edit quality is exercised by the
    TPU edit benchmark; CPU-sized scenes are too small for absolute density
    asserts.)"""
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.seal.trainer import PretrainConfig, SealTrainer
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=2, h=16, w=16, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=19)
    opts = RenderOptions(bound=1.0, num_steps=48, upsample_steps=0,
                         min_near=0.05, budget_per_ray=24, num_candidates=96,
                         max_steps=96)
    tcfg = TrainConfig(lr=1e-2, max_steps=300, num_rays=128, eval_chunk=256,
                       eval_budget_per_ray=32, random_bg=False,
                       workspace=str(tmp_path))

    teacher = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, use_dense=True,
                      key=jax.random.PRNGKey(0))
    teacher.init_state()
    teacher.train(steps=250, silent=True)

    # edit: move the ball at [0.35, 0.1, 0] up by 0.35
    src = np.array([0.35, 0.1, 0.0], np.float32)
    shift = np.array([0.0, 0.35, 0.0], np.float32)
    config = {
        "type": "bbox",
        "raw": _cube_points(src, 0.2, n=4).tolist(),
        "transform": _translate(shift).tolist(),
        "scale": [1.0, 1.0, 1.0],
    }
    from seal3d_tpu.seal.mappers import build_mapper

    mapper = build_mapper(config, workspace=str(tmp_path))
    bitfield = jnp.full(((2**21) // 8,), 255, jnp.uint8)  # tiny test: all occupied

    student = SealTrainer(ngp, fcfg, opts, tcfg, mapper,
                          teacher_params=teacher.state.params,
                          teacher_bitfield=bitfield,
                          dataset=ds, key=jax.random.PRNGKey(1))
    student.init_state()
    student.state = student.state._replace(
        params=jax.tree.map(jnp.copy, teacher.state.params))
    pcfg = PretrainConfig(epochs=40, batch_size=32768, lr=0.05,
                          local_point_step=0.02, local_angle_step=90,
                          surrounding_point_step=0.04,
                          global_point_step=0.15)
    student.init_pretraining(pcfg)
    # shells are stored batched [n_batches, B, ...] since the scan-fused
    # pretraining (0f11305); flatten for the direct-field error probe
    loc = {k: jnp.reshape(v, (-1,) + tuple(v.shape[2:]))
           for k, v in student.pretrain_data["local"].items()
           if k != "n_batches"}

    def local_err(params):
        s, c = ngp.apply(params, fcfg, loc["points"], loc["dirs"])
        w = loc["weight"]
        serr = float((jnp.abs(s - loc["sigma"]) * w).sum() / w.sum())
        cerr = float((jnp.abs(c - loc["color"]) * w[:, None]).sum() / (3 * w.sum()))
        return serr, cerr

    s0, c0 = local_err(student.state.params)
    for _ in range(pcfg.epochs):
        loss = student.pretrain_one_epoch()
    s1, c1 = local_err(student.state.params)
    assert np.isfinite(loss)
    assert c1 < c0 * 0.9, (c0, c1)       # color error decreases
    assert s1 < s0 * 1.05, (s0, s1)      # sigma fit improves (tiny scale: lenient)

    # the proxy teacher must show the source object's density at the target
    tf = student.teacher_field
    probe = jnp.asarray((src + shift)[None])
    s_probe, _ = tf.apply(teacher.state.params, fcfg, probe,
                          jnp.array([[0.0, 0, 1.0]]))
    s_src = ngp.density(teacher.state.params, fcfg, jnp.asarray(src[None]))["sigma"]
    np.testing.assert_allclose(float(s_probe[0]), float(s_src[0]), rtol=1e-4)

    # run dumps exist (timer/seal/options/run.sh are written by train_edit;
    # here we exercise the standalone dump)
    student._dump_run_config(pcfg)
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "seal.json"))


def test_curve_brush_follows_curved_surface():
    """A stroke painted on a spherical cap: the curve brush's per-rep local
    normals must contain and correctly un-lift points all over the cap, while
    the single-plane 'line' fit demonstrably misses the cap's periphery
    (reference handles this with a kNN trimesh fit, seal_utils.py:591-627)."""
    # Spherical cap of radius 1 around +y pole, ~37 deg aperture.
    rng = np.random.default_rng(3)
    theta = np.arccos(rng.uniform(np.cos(0.65), 1.0, 400))
    phi = rng.uniform(0, 2 * np.pi, 400)
    pts = np.stack([np.sin(theta) * np.cos(phi),
                    np.cos(theta),
                    np.sin(theta) * np.sin(phi)], -1).astype(np.float32)
    pressure = 0.05

    def cfg(btype):
        return {
            "type": "brush",
            "raw": pts.tolist(),
            "normal": [0.0, 1.0, 0.0],
            "brushType": btype,
            "brushPressure": pressure,
            "brushDepth": 1.0,
            "attenuationDistance": 0.0,
            "attenuationMode": "linear",
            "simplifyVoxel": 12,
        }

    m_curve = build_mapper(cfg("curve"))
    m_line = build_mapper(cfg("line"))

    # Probe the fully-lifted sheet: surface + pressure * TRUE (radial) normal,
    # at the cap periphery where the surface bends ~0.2 below the fitted plane
    # and the radial normal is ~34 deg off the global one.
    edge = np.abs(theta - 0.6) < 0.04
    surf = pts[edge]
    normals = surf / np.linalg.norm(surf, axis=-1, keepdims=True)
    lifted = jnp.asarray(surf + pressure * normals)

    mask_curve = np.asarray(map_mask(m_curve, lifted))
    mask_line = np.asarray(map_mask(m_line, lifted))
    assert mask_curve.mean() > 0.9, mask_curve.mean()
    # The plane fit's height window sits at the pole's level; part of the
    # periphery (which bends several pressures below the plane) escapes it.
    assert mask_line.mean() < 0.9, mask_line.mean()

    # Un-lift: curve-mapped points land back ON the sphere surface (the local
    # normal undoes the radial lift)...
    mapped, _, mask = map_to_origin(m_curve, lifted, None)
    mapped = np.asarray(mapped)[np.asarray(mask)]
    err_curve = np.abs(np.linalg.norm(mapped, axis=-1) - 1.0)
    assert err_curve.mean() < 0.01, err_curve.mean()
    # ...while the plane fit displaces along the GLOBAL normal (-y), missing
    # the surface by ~pressure*|n_local - n_global| on the points it catches.
    mapped_l, _, _ = map_to_origin(m_line, lifted, None)
    caught = np.asarray(mask_line)
    err_line = np.abs(np.linalg.norm(np.asarray(mapped_l)[caught], axis=-1) - 1.0)
    assert err_line.mean() > 3.0 * max(err_curve.mean(), 1e-4), (
        err_line.mean(), err_curve.mean())


def test_teacher_opts_never_packed_and_restore_grid():
    """(a) Teacher proxy renders must not use flat packing: with the hacked
    bitfield the packed buffer overflows and drops trailing rays entirely
    (measured 21-24 dB proxy corruption — scripts/probe_teacher_pack.py).
    (b) restore_grid drops the force-fill afterwards (reference
    restore_bitfield, SealNeRF/renderer.py:71-75)."""
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.seal.mappers import build_mapper
    from seal3d_tpu.seal.trainer import SealTrainer
    from seal3d_tpu.train.trainer import TrainConfig

    ds = SyntheticScene().make_dataset(n_views=2, h=16, w=16, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=12)
    # density_scale=0 so the occupancy refresh provably clears everything
    # (a fresh random field otherwise has supra-threshold density all over)
    opts = RenderOptions(bound=1.0, min_near=0.05, budget_per_ray=24,
                         num_candidates=96, max_steps=96, flat_frac=0.5,
                         density_scale=0.0)
    tcfg = TrainConfig(lr=1e-2, num_rays=128, eval_chunk=256,
                       eval_budget_per_ray=32, eval_flat_frac=0.375,
                       random_bg=False)
    config = {
        "type": "bbox",
        "raw": _cube_points(np.array([0.3, 0.1, 0.0], np.float32), 0.2,
                            n=4).tolist(),
        "transform": _translate(np.array([0, 0.3, 0], np.float32)).tolist(),
        "scale": [1.0, 1.0, 1.0],
    }
    mapper = build_mapper(config)
    bitfield = jnp.zeros(((2**21) // 8,), jnp.uint8)  # empty scene grid
    st = SealTrainer(ngp, fcfg, opts, tcfg, mapper,
                     teacher_params=ngp.init(jax.random.PRNGKey(0), fcfg),
                     teacher_bitfield=bitfield,
                     dataset=ds, key=jax.random.PRNGKey(1))
    st.init_state()

    # (a) the jitted teacher renderer was built from unpacked options even
    # though train opts and eval_flat_frac both request packing
    import inspect

    closure = inspect.getclosurevars(st._render_teacher.__wrapped__).nonlocals
    assert closure["teacher_opts"].flat_frac is None
    # teacher bitfield carries the hack
    assert int(jnp.unpackbits(st.teacher_bitfield).sum()) > 0

    # (b) hack applied -> bits set; restore_grid refreshes from the (random,
    # ~empty) student density without re-hacking -> forced bits drop
    st._apply_hack()
    hacked_bits = int(jnp.unpackbits(st.state.occ.bitfield).sum())
    assert hacked_bits > 0
    st.restore_grid()
    restored_bits = int(jnp.unpackbits(st.state.occ.bitfield).sum())
    assert restored_bits == 0  # force-fill gone, density_scale=0 -> empty
    # whereas the hacked refresh would have kept the force-fill
    st.update_grid_hacked(jax.random.PRNGKey(3), full=True)
    assert int(jnp.unpackbits(st.state.occ.bitfield).sum()) == hacked_bits


def test_pretrain_block_failure_leaves_trainer_usable(tmp_path):
    """A mid-call failure in the scan-fused pretrain block (retrace OOM,
    transport error) must not leave the trainer holding invalidated donated
    buffers: params/ema are never donated, and the donated _pre_opt_state is
    rebuilt on the failure path, so the next pretrain call still runs
    (VERDICT r4 item 8)."""
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.seal.mappers import build_mapper
    from seal3d_tpu.seal.trainer import PretrainConfig, SealTrainer
    from seal3d_tpu.train.trainer import TrainConfig

    ds = SyntheticScene().make_dataset(n_views=2, h=16, w=16, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=12)
    opts = RenderOptions(bound=1.0, num_steps=32, upsample_steps=0,
                         min_near=0.05, budget_per_ray=16, num_candidates=64,
                         max_steps=64)
    tcfg = TrainConfig(lr=1e-2, max_steps=100, num_rays=64, eval_chunk=256,
                       eval_budget_per_ray=16, random_bg=False)
    config = {
        "type": "bbox",
        "raw": _cube_points(np.array([0.3, 0.1, 0.0]), 0.2, n=3).tolist(),
        "transform": _translate(np.array([0.0, 0.3, 0.0])).tolist(),
        "scale": [1.0, 1.0, 1.0],
    }
    mapper = build_mapper(config, workspace=str(tmp_path))
    teacher_params = ngp.init(jax.random.PRNGKey(0), fcfg)
    bitfield = jnp.full(((2**21) // 8,), 255, jnp.uint8)
    student = SealTrainer(ngp, fcfg, opts, tcfg, mapper,
                          teacher_params=teacher_params,
                          teacher_bitfield=bitfield,
                          dataset=ds, key=jax.random.PRNGKey(1))
    student.init_state()
    student.init_pretraining(PretrainConfig(
        epochs=2, batch_size=4096, lr=0.05, local_point_step=0.05,
        local_angle_step=90, surrounding_point_step=0.1,
        global_point_step=0.3))

    real_block = student._pretrain_block

    def boom(*args, **kw):
        raise RuntimeError("forced mid-call failure")

    student._pretrain_block = boom
    with pytest.raises(RuntimeError, match="forced"):
        student.pretrain_epochs(1)

    # trainer still usable: the per-batch path (uses _pre_opt_state) runs...
    loss = student.pretrain_one_epoch()
    assert np.isfinite(loss)
    # ...and so does the restored scan-fused block
    student._pretrain_block = real_block
    losses = student.pretrain_epochs(1)
    assert np.all(np.isfinite(losses))


def test_packed_teacher_render_matches_dense(tmp_path):
    """The demand-bucketed packed teacher render must reproduce the dense
    [N,K] proxy render: the covering budget keeps the packed stream equal to
    the dense path's kept candidates (round-5 replacement of the round-2
    'never flat-pack the teacher' rule — that rule predated graceful
    overflow AND the exact-demand probe)."""
    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.occupancy import occupancy_init, occupancy_update
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.seal.mappers import build_mapper
    from seal3d_tpu.seal.trainer import SealTrainer
    from seal3d_tpu.train.trainer import TrainConfig

    ds = SyntheticScene().make_dataset(n_views=2, h=24, w=24, seed=0)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=12)
    opts = RenderOptions(bound=1.0, num_steps=32, upsample_steps=0,
                         min_near=0.05, budget_per_ray=24, num_candidates=128,
                         max_steps=256, coarse_steps=32)
    tcfg = TrainConfig(lr=1e-2, max_steps=100, num_rays=64, eval_chunk=192,
                       eval_budget_per_ray=32, random_bg=False)
    config = {
        "type": "bbox",
        "raw": _cube_points(np.array([0.3, 0.1, 0.0]), 0.2, n=3).tolist(),
        "transform": _translate(np.array([0.0, 0.3, 0.0])).tolist(),
        "scale": [1.0, 1.0, 1.0],
    }
    mapper = build_mapper(config, workspace=str(tmp_path))
    # realistic sparse occupancy so covering buckets < 1.0 exist
    occ = occupancy_update(occupancy_init(cascades=1),
                           SyntheticScene().density, jax.random.PRNGKey(2),
                           bound=1.0, density_thresh=0.01, full=True)
    student = SealTrainer(ngp, fcfg, opts, tcfg, mapper,
                          teacher_params=ngp.init(jax.random.PRNGKey(0), fcfg),
                          teacher_bitfield=occ.bitfield,
                          dataset=ds, key=jax.random.PRNGKey(1))
    student.init_state()

    n_chunks = -(-24 * 24 // 192)
    img_d, dep_d = student.render_teacher_view(ds.poses[0],
                                               fracs=[None] * n_chunks)
    img_p, dep_p = student.render_teacher_view(ds.poses[0])  # probe path
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_d),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(dep_p), np.asarray(dep_d),
                               atol=1e-3)
    # the probe actually engaged packing on at least one chunk
    used = [f for f in student._render_teacher_cache if f is not None]
    assert used, "no chunk selected a packed bucket (test setup too dense?)"
