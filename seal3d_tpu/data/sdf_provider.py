"""SDF training data: online point sampling against a mesh.

Equivalent of reference sdf/provider.py:28 (SDFDataset with pysdf): per batch,
half the points are near-surface (triangle samples + gaussian jitter), half
uniform in the bound; ground-truth signed distance comes from our own
point-triangle distance + inside test (seal3d_tpu.seal.geometry — this image
ships no pysdf). The mesh loads from OBJ/PLY ascii."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from seal3d_tpu.seal.geometry import point_triangle_distance, points_in_mesh


def load_mesh(path: str):
    """Minimal ascii OBJ/PLY loader -> (verts [V,3] f32, faces [F,3] i32)."""
    verts, faces = [], []
    if path.endswith(".obj"):
        with open(path) as f:
            for line in f:
                p = line.split()
                if not p:
                    continue
                if p[0] == "v":
                    verts.append([float(p[1]), float(p[2]), float(p[3])])
                elif p[0] == "f":
                    ids = [int(t.split("/")[0]) - 1 for t in p[1:4]]
                    faces.append(ids)
    else:  # ascii ply
        with open(path) as f:
            n_v = n_f = 0
            for line in f:
                if line.startswith("element vertex"):
                    n_v = int(line.split()[-1])
                elif line.startswith("element face"):
                    n_f = int(line.split()[-1])
                elif line.startswith("end_header"):
                    break
            for _ in range(n_v):
                verts.append([float(t) for t in f.readline().split()[:3]])
            for _ in range(n_f):
                p = f.readline().split()
                faces.append([int(p[1]), int(p[2]), int(p[3])])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


class SDFDataset:
    """Online sampler. Normalizes the mesh into [-scale, scale]^3."""

    def __init__(self, mesh_path: str = None, verts: np.ndarray = None,
                 faces: np.ndarray = None, scale: float = 0.8, seed: int = 0):
        if mesh_path is not None:
            verts, faces = load_mesh(mesh_path)
        v = np.asarray(verts, np.float32)
        center = (v.max(0) + v.min(0)) / 2
        extent = (v.max(0) - v.min(0)).max() / 2
        self.verts = (v - center) / max(extent, 1e-9) * scale
        self.faces = np.asarray(faces, np.int32)
        self.tris = jnp.asarray(self.verts[self.faces])  # [F,3,3]
        a, b, c = (self.verts[self.faces[:, i]] for i in range(3))
        self.areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
        self.areas = self.areas / max(self.areas.sum(), 1e-12)
        self.rng = np.random.default_rng(seed)
        self._sdf_jit = jax.jit(self._sdf)

    def _sdf(self, pts):
        d = point_triangle_distance(pts, self.tris)
        inside = points_in_mesh(pts, self.tris)
        return jnp.where(inside, -d, d)

    def sample_surface(self, n: int) -> np.ndarray:
        fi = self.rng.choice(len(self.faces), n, p=self.areas)
        u = self.rng.uniform(size=(n, 2)).astype(np.float32)
        flip = u.sum(-1) > 1
        u[flip] = 1 - u[flip]
        a, b, c = (self.verts[self.faces[fi, i]] for i in range(3))
        return a + u[:, :1] * (b - a) + u[:, 1:2] * (c - a)

    def batch(self, n: int):
        """Returns (points [n,3] f32, sdf [n] f32): n/2 near-surface + n/2
        uniform (reference sdf/provider.py sampling split)."""
        ns = n // 2
        surf = self.sample_surface(ns)
        surf = surf + self.rng.normal(scale=0.01, size=surf.shape).astype(np.float32)
        uni = self.rng.uniform(-1, 1, size=(n - ns, 3)).astype(np.float32)
        pts = np.concatenate([surf, uni]).astype(np.float32)
        sdf = np.asarray(self._sdf_jit(jnp.asarray(pts)))
        return pts, sdf
