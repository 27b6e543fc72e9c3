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
