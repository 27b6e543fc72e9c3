"""Headless GUI logic: orbit camera, edit session configs, dynamic budget."""

import numpy as np

from seal3d_tpu.gui.state import DynamicBudget, EditSession, OrbitCamera, ToolState, depth_lift
from seal3d_tpu.seal.mappers import build_mapper


def test_orbit_camera_pose():
    cam = OrbitCamera(800, 800, radius=2.0, fovy=60.0)
    pose = cam.pose
    # camera sits at -z * radius looking at origin (+z forward convention)
    np.testing.assert_allclose(pose[:3, 3], [0, 0, -2], atol=1e-6)
    fwd_world = pose[:3, :3] @ np.array([0, 0, 1.0])
    np.testing.assert_allclose(fwd_world, [0, 0, 1], atol=1e-6)
    cam.orbit(100, 0)
    assert abs(cam.pose[0, 3]) > 0.1  # moved around the orbit
    np.testing.assert_allclose(np.linalg.norm(cam.pose[:3, 3]), 2.0, rtol=1e-5)
    intr = cam.intrinsics
    assert intr[2] == 400 and intr[0] > 0


def test_depth_lift():
    ro = np.array([0.0, 0, -2])
    rd = np.array([0.0, 0, 1])
    p = depth_lift(ro, rd, np.asarray(2.0))
    np.testing.assert_allclose(p, [0, 0, 0], atol=1e-6)


def test_edit_session_brush_and_anchor_configs():
    s = EditSession()
    g = np.linspace(-0.1, 0.1, 5)
    gx, gz = np.meshgrid(g, g)
    pts = np.stack([gx, np.zeros_like(gx), gz], -1).reshape(-1, 3)
    s.paint(pts)
    s.rgb = [1.0, 0.0, 0.0]
    cfg = s.brush_config(normal=[0, 1, 0])
    m = build_mapper(cfg)  # must be a valid mapper config
    assert m.kind == "brush" and "rgb" in m.flags

    s2 = EditSession()
    s2.click_anchor(np.array([0.0, 0, 0]))
    s2.click_anchor(np.array([0.1, 0, 0]))
    s2.click_anchor(np.array([0.05, 0.3, 0]))  # tip
    cfg2 = s2.anchor_config(radius=0.2)
    m2 = build_mapper(cfg2)
    assert m2.kind == "anchor"
    s2.reset()
    assert s2.state is ToolState.PREVIEW and not s2.anchor_points


def test_dynamic_budget():
    b = DynamicBudget()
    d0 = b.downscale
    b.update_preview(500.0)
    assert b.downscale == d0 + 1
    b.update_preview(10.0)
    assert b.downscale == d0
    b.update_train(1600.0)  # 100ms/step at 16 steps -> 5 steps fit in 500ms
    assert b.train_steps == 5


def test_mask_painter_and_texture_rect():
    p = __import__("seal3d_tpu.gui.state", fromlist=["MaskPainter"]).MaskPainter(64, 64, radius=4)
    p.drag(10, 10)
    p.drag(30, 10)   # fast drag: interpolated stamps, no gaps
    p.release()
    m = p.mask
    assert m[10, 10] and m[10, 20] and m[10, 30]   # the whole segment painted
    assert not m[40, 40]
    idx = p.indices()
    assert len(idx) > 50 and (idx == np.sort(idx)).all()
    p.clear()
    assert not p.any()

    from seal3d_tpu.gui.state import texture_rect_config
    corners = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    cfg = texture_rect_config(corners, "tex.png", rgb_light_offset=0.1)
    assert cfg["path"] == "tex.png" and cfg["o"] == [0, 0, 0]
    assert cfg["w"] == [1, 0, 0] and cfg["h"] == [0, 1, 0]


def test_lift_pixels_batch():
    from seal3d_tpu.gui.state import lift_pixels
    n = 16
    ro = np.tile([0.0, 0, -2], (n, 1))
    rd = np.tile([0.0, 0, 1], (n, 1))
    depth = np.full(n, 2.0)
    depth[3] = 0.0       # miss: dropped
    depth[5] = 99.0      # background: dropped
    pts = lift_pixels(ro, rd, depth, np.arange(n))
    assert pts.shape == (n - 2, 3)
    np.testing.assert_allclose(pts, 0.0, atol=1e-6)


def test_seal_controller_full_cycle(tmp_path):
    """Headless drive of the full editing interaction (VERDICT item 7):
    drag-paint a 2D mask -> batch depth lift -> brush config -> start edit
    (mapper + student + pretraining) -> train slice -> override commits the
    student into the teacher -> reset restores the original teacher."""
    import jax
    import jax.numpy as jnp

    from seal3d_tpu.data.synthetic import SyntheticScene
    from seal3d_tpu.gui.state import OrbitCamera, SealController, ToolState
    from seal3d_tpu.models import ngp
    from seal3d_tpu.models.ngp import NGPConfig
    from seal3d_tpu.render.renderer import RenderOptions
    from seal3d_tpu.train.trainer import TrainConfig, Trainer

    scene = SyntheticScene()
    ds = scene.make_dataset(n_views=2, h=16, w=16, seed=0)
    # tiny table + coarse pretrain shells: this is an interaction-logic
    # test, not a quality test — the 2^15 table + default 0.005 point
    # steps made it a 454 s CPU outlier (round-4 fast-lane budget)
    fcfg = NGPConfig(bound=1.0, log2_hashmap_size=10)
    opts = RenderOptions(bound=1.0, num_steps=32, upsample_steps=0,
                         min_near=0.05, budget_per_ray=16, num_candidates=64,
                         max_steps=64)
    tcfg = TrainConfig(lr=1e-2, max_steps=200, num_rays=128, eval_chunk=256,
                       eval_budget_per_ray=16, random_bg=False,
                       workspace=str(tmp_path))
    teacher = Trainer(ngp, fcfg, opts, tcfg, dataset=ds, use_dense=True,
                      key=jax.random.PRNGKey(0))
    teacher.init_state()
    teacher.train(steps=60, silent=True)
    teacher.state = teacher.state._replace(
        occ=teacher.state.occ._replace(
            bitfield=jnp.full_like(teacher.state.occ.bitfield, 255)))
    orig_param = np.asarray(
        jax.tree.leaves(teacher.state.params)[0]).copy()

    cam = OrbitCamera(64, 64, radius=2.2)
    ctl = SealController(teacher, ngp, fcfg, ds, workspace=str(tmp_path),
                         cam=cam, paint_res=16)

    # 1. paint: drag across the view center
    ctl.session.state = ToolState.BRUSH
    ctl.painter.radius = 2
    ctl.painter.drag(6, 8)
    ctl.painter.drag(10, 8)
    n_lifted = ctl.finish_stroke()
    assert n_lifted > 0
    assert not ctl.painter.any()  # consumed

    # 2. config from the session
    ctl.session.brush_pressure = 0.05
    cfg = ctl.session.brush_config(normal=None)
    assert cfg["type"] == "brush" and len(cfg["raw"]) == n_lifted

    # 3. start edit -> student exists, pretraining scheduled
    ctl.start_edit(cfg, pretrain_epochs=1, pretrain_batch=4096,
                   local_point_step=0.02, surrounding_point_step=0.06,
                   global_point_step=0.15, local_angle_step=90.0,
                   surrounding_angle_step=90.0, global_angle_step=90.0)
    assert ctl.student is not None and ctl.session.state is ToolState.TRAIN
    assert ctl.render_trainer is ctl.student

    # 4. one train slice runs a pretrain epoch
    assert ctl.train_slice()
    # pretrain-only stops slices once pretraining finished
    ctl.student.is_pretraining = False
    ctl.pretrain_only = True
    assert not ctl.train_slice()

    # 5. override: student params committed into the teacher
    student_param = np.asarray(jax.tree.leaves(ctl.student.state.params)[0])
    ctl.override_teacher()
    assert ctl.student is None and ctl.session.state is ToolState.PREVIEW
    now_param = np.asarray(jax.tree.leaves(teacher.state.params)[0])
    np.testing.assert_array_equal(now_param, student_param)

    # 6. reset: back to the pre-edit teacher
    ctl.reset_teacher()
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(teacher.state.params)[0]), orig_param)
