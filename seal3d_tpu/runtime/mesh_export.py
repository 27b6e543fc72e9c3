"""Mesh extraction + export (native marching tetrahedra over a jitted field).

Equivalent of reference `extract_geometry` + `save_mesh`
(nerf/utils.py:193-205, 583-607): query the density field on a dense grid in
device-sized chunks, then extract the iso-surface with the C++ runtime
(runtime/native/mesh_extract.cpp) and write PLY/OBJ."""

from __future__ import annotations

import ctypes
import os

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.runtime.build import load_library


def marching_tetrahedra(grid: np.ndarray, iso: float, origin, spacing):
    """grid: [nz, ny, nx] float32 -> (verts [V,3] f32, tris [T,3] i32)."""
    lib = load_library("mesh_extract")
    fn = lib.marching_tetrahedra
    fn.restype = ctypes.c_int
    grid = np.ascontiguousarray(grid, np.float32)
    nz, ny, nx = grid.shape
    max_v = max(int(grid.size // 2), 1 << 16)
    max_t = max_v * 2
    out_v = np.empty((max_v, 3), np.float32)
    out_t = np.empty((max_t, 3), np.int32)
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    origin = np.asarray(origin, np.float32)
    spacing = np.asarray(spacing, np.float32)
    truncated = fn(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(nx), ctypes.c_int(ny), ctypes.c_int(nz),
        ctypes.c_float(iso),
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(max_v),
        out_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(max_t),
        ctypes.byref(nv), ctypes.byref(nt),
    )
    if truncated:
        print("[mesh_export] warning: mesh truncated; raise resolution budget")
    return out_v[: nv.value].copy(), out_t[: nt.value].copy()


def extract_geometry(density_fn, bound: float, resolution: int = 256,
                     threshold: float = 10.0, chunk: int = 2**16):
    """Dense field sampling + iso-surface extraction.

    Args:
      density_fn: [M, 3] -> [M] sigma (jittable).
      bound: half-extent of the sampled cube.
    Returns (verts [V,3], tris [T,3]) in world coordinates.
    """
    lin = np.linspace(-bound, bound, resolution, dtype=np.float32)
    query = jax.jit(density_fn)
    # full [z, y, x] grid queried in fixed-size chunks (one dispatch each)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([xx.reshape(-1), yy.reshape(-1), zz.reshape(-1)], -1)
    n = pts.shape[0]
    pad = (-n) % chunk
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    out = []
    for i in range(0, len(pts), chunk):
        out.append(np.asarray(query(jnp.asarray(pts[i : i + chunk]))))
    vals = np.concatenate(out)[:n].reshape(resolution, resolution, resolution)
    spacing = 2 * bound / (resolution - 1)
    verts, tris = marching_tetrahedra(vals, threshold,
                                      origin=(-bound, -bound, -bound),
                                      spacing=(spacing, spacing, spacing))
    return verts, tris


def save_mesh(path: str, verts: np.ndarray, tris: np.ndarray):
    """Write .ply (binary-less ascii) or .obj by extension."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        from seal3d_tpu.seal.geometry import export_obj

        export_obj(path, verts, tris)
        return
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(tris)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
