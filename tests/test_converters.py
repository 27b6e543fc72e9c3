"""Converter pipeline tests (reference scripts/colmap2nerf.py parity).

The text-model -> transforms.json math runs against a tiny synthetic COLMAP
export; the ffmpeg/COLMAP pipeline stages are exercised with the subprocess
layer mocked (neither binary ships in CI images)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_SCRIPT = os.path.join(_HERE, "..", "scripts", "colmap2nerf.py")


def _load():
    spec = importlib.util.spec_from_file_location("colmap2nerf", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_text_model(d, n=6):
    """Tiny synthetic COLMAP TXT export: cameras on a circle looking at the
    origin, written in COLMAP's world-to-camera (qvec, tvec) convention."""
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.txt"), "w") as f:
        f.write("# cams\n1 PINHOLE 640 480 500.0 500.0 320.0 240.0\n")
    lines = []
    rng = np.random.default_rng(0)
    for i in range(n):
        a = 2 * np.pi * i / n
        c = np.array([2 * np.cos(a), 0.3, 2 * np.sin(a)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up); right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        # camera-to-world with colmap axes (x right, y down, z forward)
        rcw = np.stack([right, -up2, fwd], axis=1)
        rwc = rcw.T
        t = -rwc @ c
        # rotmat -> quaternion (w, x, y, z)
        m = rwc
        w = np.sqrt(max(1 + m[0, 0] + m[1, 1] + m[2, 2], 1e-12)) / 2
        x = (m[2, 1] - m[1, 2]) / (4 * w)
        y = (m[0, 2] - m[2, 0]) / (4 * w)
        z = (m[1, 0] - m[0, 1]) / (4 * w)
        lines.append(f"{i+1} {w} {x} {y} {z} {t[0]} {t[1]} {t[2]} 1 "
                     f"frame_{i:04d}.jpg\n\n")
    with open(os.path.join(d, "images.txt"), "w") as f:
        f.write("# images\n" + "".join(lines))


def test_text_model_conversion_with_hold_and_dynamic(tmp_path, monkeypatch):
    mod = _load()
    text = str(tmp_path / "colmap_text")
    _write_text_model(text, n=8)
    out = str(tmp_path / "transforms.json")
    monkeypatch.setattr(sys, "argv",
                        ["colmap2nerf.py", "--text", text, "--out", out,
                         "--hold", "4", "--dynamic"])
    mod.main()

    j = json.load(open(out))
    assert len(j["frames"]) == 8
    assert j["w"] == 640 and abs(j["fl_x"] - 500.0) < 1e-6
    # recentred + rescaled: camera centers near the origin at a sane radius
    cen = np.stack([np.array(fr["transform_matrix"])[:3, 3]
                    for fr in j["frames"]])
    assert np.linalg.norm(cen.mean(0)) < 1.0
    assert 1.0 < np.linalg.norm(cen, axis=1).mean() < 8.0
    # cameras look toward the scene center: -z axis (nerf convention)
    # points roughly along -position
    for fr in j["frames"]:
        m = np.array(fr["transform_matrix"])
        look = -m[:3, 2]
        toward = -m[:3, 3] / (np.linalg.norm(m[:3, 3]) + 1e-9)
        assert look @ toward > 0.7
    # dynamic: times span [0, 1] in frame order
    times = [fr["time"] for fr in j["frames"]]
    assert times[0] == 0.0 and times[-1] == 1.0
    assert times == sorted(times)
    # hold: split files with every 4th frame held out
    jt = json.load(open(str(tmp_path / "transforms_train.json")))
    jv = json.load(open(str(tmp_path / "transforms_val.json")))
    assert len(jt["frames"]) == 6 and len(jv["frames"]) == 2


def test_run_colmap_pipeline_command_sequence(tmp_path, monkeypatch):
    """--run_colmap must drive the five COLMAP stages in order with the
    reference's options (OPENCV single camera, guided matching tied to
    estimate_affine_shape, principal-point refine, TXT export)."""
    mod = _load()
    calls = []
    monkeypatch.setattr(mod.shutil, "which", lambda b: f"/usr/bin/{b}")
    monkeypatch.setattr(mod, "_run", lambda cmd: calls.append(cmd))
    text = mod.run_colmap_pipeline(str(tmp_path / "images"),
                                   str(tmp_path / "work"),
                                   matcher="sequential",
                                   estimate_affine_shape=True,
                                   overwrite=True)
    stages = [c[1] for c in calls]
    assert stages == ["feature_extractor", "sequential_matcher", "mapper",
                      "bundle_adjuster", "model_converter"]
    fe = calls[0]
    assert "--ImageReader.camera_model" in fe and "OPENCV" in fe
    assert fe[fe.index("--SiftExtraction.estimate_affine_shape") + 1] == "1"
    ba = calls[3]
    assert ba[ba.index("--BundleAdjustment.refine_principal_point") + 1] == "1"
    mc = calls[4]
    assert mc[mc.index("--output_type") + 1] == "TXT"
    assert text.endswith("colmap_text")


def test_extract_frames_ffmpeg_args(tmp_path, monkeypatch):
    mod = _load()
    calls = []
    monkeypatch.setattr(mod.shutil, "which", lambda b: f"/usr/bin/{b}")
    monkeypatch.setattr(mod, "_run", lambda cmd: calls.append(cmd))
    mod.extract_frames("in.mp4", str(tmp_path / "images"), fps=2.0,
                       time_slice="5,20", overwrite=True)
    (cmd,) = calls
    assert cmd[0] == "ffmpeg" and "in.mp4" in cmd
    vf = cmd[cmd.index("-vf") + 1]
    assert "fps=2.0" in vf and "between(t,5,20)" in vf
    assert cmd[-1].endswith("%04d.jpg")
