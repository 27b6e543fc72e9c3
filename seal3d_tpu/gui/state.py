"""Headless GUI state: orbit camera + edit-tool state machine.

The logic layer of the reference GUIs (nerf/gui.py:10-53 OrbitCamera,
SealNeRF/gui.py:91-95 tool states, :300-306 depth lift, :672-691 brush
config, :851-903 anchor clicks), separated from dearpygui so it is testable
without a display and reusable by any frontend."""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional

import numpy as np


class ToolState(Enum):
    PREVIEW = "preview"
    BRUSH = "brush"
    TEXTURE = "texture"
    ANCHOR = "anchor"
    TRAIN = "train"


class OrbitCamera:
    """Reference OrbitCamera (nerf/gui.py:10-53): radius/center orbit with
    +z-forward ngp pose convention."""

    def __init__(self, w: int, h: int, radius: float = 2.0, fovy: float = 60.0):
        self.w, self.h = w, h
        self.radius = radius
        self.fovy = fovy
        self.center = np.zeros(3, np.float32)
        self.rot = np.eye(3, dtype=np.float32)

    @property
    def intrinsics(self) -> np.ndarray:
        focal = self.h / (2.0 * np.tan(np.radians(self.fovy) / 2.0))
        return np.array([focal, focal, self.w / 2, self.h / 2], np.float32)

    @property
    def pose(self) -> np.ndarray:
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = self.rot
        pose[:3, 3] = self.center - self.rot @ np.array([0, 0, self.radius],
                                                        np.float32)
        return pose

    def orbit(self, dx: float, dy: float, speed: float = 0.005):
        def rot_axis(axis, angle):
            axis = axis / (np.linalg.norm(axis) + 1e-9)
            k = np.array([[0, -axis[2], axis[1]],
                          [axis[2], 0, -axis[0]],
                          [-axis[1], axis[0], 0]], np.float32)
            return np.eye(3, dtype=np.float32) + np.sin(angle) * k + \
                (1 - np.cos(angle)) * (k @ k)

        up = self.rot[:, 1]
        side = self.rot[:, 0]
        self.rot = rot_axis(up, -dx * speed) @ rot_axis(side, -dy * speed) @ self.rot

    def pan(self, dx: float, dy: float, speed: float = 0.001):
        self.center += speed * self.rot @ np.array([-dx, -dy, 0], np.float32)

    def scale(self, delta: float):
        self.radius *= 1.1 ** (-delta)


def depth_lift(rays_o: np.ndarray, rays_d: np.ndarray,
               depth: np.ndarray) -> np.ndarray:
    """Lift 2D pixels to 3D surface points via rendered depth
    (reference get_mask_pos: pos = rays_o + depth * rays_d,
    SealNeRF/gui.py:300-306 / nerf/utils.py:799)."""
    return rays_o + depth[..., None] * rays_d


@dataclass
class EditSession:
    """Accumulates tool interactions into a seal.json-style config dict."""

    state: ToolState = ToolState.PREVIEW
    brush_points: List[np.ndarray] = field(default_factory=list)
    anchor_points: List[np.ndarray] = field(default_factory=list)
    brush_pressure: float = 0.02
    brush_depth: float = 1.0
    attenuation_distance: float = 0.02
    attenuation_mode: str = "linear"
    rgb: Optional[List[float]] = None
    texture_path: Optional[str] = None

    def paint(self, surface_points: np.ndarray):
        self.brush_points.append(np.asarray(surface_points, np.float32))

    def click_anchor(self, point: np.ndarray):
        self.anchor_points.append(np.asarray(point, np.float32))

    def brush_config(self, normal=None) -> dict:
        """Reference brush config builder (SealNeRF/gui.py:672-691)."""
        assert self.brush_points, "paint first"
        cfg = {
            "type": "brush",
            "raw": [p.tolist() for p in self.brush_points]
            if len(self.brush_points) > 1 else self.brush_points[0].tolist(),
            "brushType": "line",
            "brushPressure": self.brush_pressure,
            "brushDepth": self.brush_depth,
            "attenuationDistance": self.attenuation_distance,
            "attenuationMode": self.attenuation_mode,
        }
        if normal is not None:
            cfg["normal"] = list(normal)
        if self.rgb is not None:
            cfg["rgb"] = list(self.rgb)
        if self.texture_path is not None:
            cfg["imageConfig"] = {"path": self.texture_path}
        return cfg

    def anchor_config(self, radius: float = 0.2, scale=(1, 1, 1)) -> dict:
        """Reference anchor 3-click + direction flow (SealNeRF/gui.py:851-903):
        first clicks define the plane/anchor, the last the translation tip."""
        assert len(self.anchor_points) >= 2, "need >= 2 anchor clicks"
        plane_pts = np.stack(self.anchor_points[:-1])
        if len(plane_pts) < 3:  # pad plane definition around the anchor
            jitter = np.array([[0.01, 0, 0], [0, 0.01, 0]], np.float32)
            plane_pts = np.concatenate([plane_pts,
                                        plane_pts[:1] + jitter[: 3 - len(plane_pts)]])
        anchor = plane_pts.mean(0)
        tip = self.anchor_points[-1]
        cfg = {
            "type": "anchor",
            "raw": plane_pts.tolist(),
            "translation": (tip - anchor).tolist(),
            "radius": radius,
            "scale": list(scale),
        }
        if self.rgb is not None:
            cfg["rgb"] = list(self.rgb)
        return cfg

    def reset(self):
        self.brush_points.clear()
        self.anchor_points.clear()
        self.state = ToolState.PREVIEW


class DynamicBudget:
    """The reference's interactivity scheduler (SURVEY.md §5.9): preview
    resolution adapts to hit <=200 ms/frame (SealNeRF/gui.py:348-353), train
    slice size adapts to <=500 ms (gui.py:212-217)."""

    def __init__(self, preview_ms: float = 200.0, train_ms: float = 500.0):
        self.preview_ms = preview_ms
        self.train_ms = train_ms
        self.downscale = 2
        self.train_steps = 16

    def update_preview(self, elapsed_ms: float):
        if elapsed_ms > self.preview_ms and self.downscale < 4:
            self.downscale += 1
        elif elapsed_ms < self.preview_ms * 0.5 and self.downscale > 1:
            self.downscale -= 1

    def update_train(self, elapsed_ms: float):
        per_step = elapsed_ms / max(self.train_steps, 1)
        self.train_steps = int(np.clip(self.train_ms / max(per_step, 1e-3),
                                       4, 64))
