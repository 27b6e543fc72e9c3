"""Geometry utilities for the editing layer.

Replaces the reference's external geometry deps (trimesh / pytorch3d /
open3d / skspatial / sklearn — seal_utils.py imports, none of which exist in
this image) with self-contained numpy (config-build time) and jnp (render
time) implementations:

- PCA oriented bounding boxes      (~ trimesh.PointCloud.bounding_box_oriented)
- least-squares plane fit          (~ skspatial Plane.best_fit)
- Moller-Trumbore ray/tri + point-in-mesh  (seal_utils.py:630-698)
- point->triangle distance         (~ pytorch3d _C.point_face_dist_forward)
- voxel-clustered surface sheet    (~ get_trimesh_fit + o3d simplify,
                                     seal_utils.py:591-627)
- OBJ/PLY export for debug meshes  (from.obj / to.obj artifacts)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# 12 triangles of a box given its 8 corners ordered by (i&1, i>>1&1, i>>2&1).
_BOX_FACES = np.array([
    [0, 2, 1], [1, 2, 3],  # z-
    [4, 5, 6], [5, 7, 6],  # z+
    [0, 1, 4], [1, 5, 4],  # y-
    [2, 6, 3], [3, 6, 7],  # y+
    [0, 4, 2], [2, 4, 6],  # x-
    [1, 3, 5], [3, 7, 5],  # x+
], dtype=np.int32)


def plane_fit(points: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Least-squares plane: returns (unit normal, centroid)."""
    pts = np.asarray(points, np.float64)
    center = pts.mean(0)
    _, _, vt = np.linalg.svd(pts - center, full_matrices=False)
    normal = vt[-1]
    return normal.astype(np.float32), center.astype(np.float32)


def obb_from_points(points: np.ndarray):
    """PCA oriented bounding box.

    Returns dict(verts [8,3], faces [12,3], center [3], axes [3,3] (rows),
    half_extents [3]). Corner i is center + sum_d (+-half[d]) * axes[d] with
    sign from bit d of i.
    """
    pts = np.asarray(points, np.float64)
    center = pts.mean(0)
    if pts.shape[0] < 3:
        axes = np.eye(3)
    else:
        cov = np.cov((pts - center).T)
        _, vecs = np.linalg.eigh(cov + 1e-12 * np.eye(3))
        axes = vecs.T[::-1]  # rows, major first
    proj = (pts - center) @ axes.T
    lo, hi = proj.min(0), proj.max(0)
    mid_local = (lo + hi) / 2
    half = np.maximum((hi - lo) / 2, 1e-6)
    center = center + mid_local @ axes
    signs = np.array([[(i >> d) & 1 for d in range(3)] for i in range(8)]) * 2 - 1
    verts = center[None] + (signs * half[None]) @ axes
    return {
        "verts": verts.astype(np.float32),
        "faces": _BOX_FACES.copy(),
        "center": center.astype(np.float32),
        "axes": axes.astype(np.float32),
        "half_extents": half.astype(np.float32),
    }


def aabb_of(points: np.ndarray) -> np.ndarray:
    """[N,3] -> [2,3] (min, max)."""
    pts = np.asarray(points, np.float32)
    return np.stack([pts.min(0), pts.max(0)])


def box_mesh_from_aabb(bound: np.ndarray):
    lo, hi = np.asarray(bound[0]), np.asarray(bound[1])
    signs = np.array([[(i >> d) & 1 for d in range(3)] for i in range(8)])
    verts = np.where(signs == 1, hi[None], lo[None]).astype(np.float32)
    return verts, _BOX_FACES.copy()


def voxel_cluster_indices(points: np.ndarray, simplify_voxel: int = 16) -> np.ndarray:
    """Indices of one representative point per occupied voxel (the voxel
    grid spans the cloud's AABB at `simplify_voxel` cells along the longest
    axis — the simplification analog of the reference's o3d
    simplify_vertex_clustering, seal_utils.py:614-620)."""
    pts = np.asarray(points, np.float64)
    lo, hi = pts.min(0), pts.max(0)
    voxel = max(float((hi - lo).max()), 1e-6) / simplify_voxel
    keys = np.floor((pts - lo) / voxel).astype(np.int64)
    _, idx = np.unique(keys, axis=0, return_index=True)
    return np.sort(idx)


def voxel_cluster_surface(points: np.ndarray, normal: np.ndarray,
                          growth=(-0.3, 1.0), simplify_voxel: int = 16):
    """Simplified double-sheet prism over a painted surface patch.

    The reference builds a kNN triangle soup then voxel-simplifies it with
    open3d (seal_utils.py:591-627); here we voxel-cluster the points directly
    and emit the two offset sheets + their cluster representatives. The mesh
    is used only for debug export; containment of curve brushes is evaluated
    parametrically (see mappers.brush_contains)."""
    pts = np.asarray(points, np.float64)
    idx = voxel_cluster_indices(pts, simplify_voxel)
    reps = pts[idx]
    n = np.asarray(normal, np.float64)
    verts = np.concatenate([reps + n * growth[0], reps + n * growth[1]])
    return reps.astype(np.float32), verts.astype(np.float32)


def knn_point_normals(points: np.ndarray, k: int = 12,
                      orient: np.ndarray = None) -> np.ndarray:
    """Per-point surface normals from local kNN plane fits.

    The curved-stroke analog of the reference's kNN trimesh fit
    (get_trimesh_fit, seal_utils.py:591-613): instead of meshing the
    neighborhoods, each point keeps the normal of its local plane so the
    stroke sheet can follow curved geometry. `orient` flips normals to a
    consistent hemisphere (the camera-facing side)."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    k = min(k, n)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    nbr = np.argsort(d2, axis=1)[:, :k]
    normals = np.empty((n, 3), np.float32)
    for i in range(n):
        nrm, _ = plane_fit(pts[nbr[i]])
        normals[i] = nrm
    if orient is not None:
        o = np.asarray(orient, np.float64)
        flip = normals @ o < 0
        normals[flip] *= -1
    return normals


def export_obj(path: str, verts: np.ndarray, faces: np.ndarray = None):
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if faces is not None:
            for face in np.asarray(faces):
                f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")


def export_ply_points(path: str, points: np.ndarray, colors: np.ndarray = None):
    pts = np.asarray(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i, p in enumerate(pts):
            line = f"{p[0]} {p[1]} {p[2]}"
            if colors is not None:
                c = (np.clip(colors[i], 0, 1) * 255).astype(np.uint8)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")


# ------------------------------------------------------------------ jnp side

def moller_trumbore_any(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                        tris: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """True where a ray hits ANY triangle (t>=0). rays [N,3], tris [F,3,3].

    Vectorized batch Moller-Trumbore (same contract as seal_utils.py:630-664),
    written structure-of-arrays: every intermediate is a plain [N, F] array.
    (The AoS form with [N,F,3] cross products crashes the XLA:TPU fusion
    pass — SIGILL in MainFusionOptimize on v5e — and small trailing dims tile
    poorly anyway.) Degenerate padding triangles never intersect.
    """
    ax, ay, az = (tris[:, 0, i] for i in range(3))             # [F]
    e1x, e1y, e1z = (tris[:, 1, i] - tris[:, 0, i] for i in range(3))
    e2x, e2y, e2z = (tris[:, 2, i] - tris[:, 0, i] for i in range(3))
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x
    ox, oy, oz = (rays_o[:, i:i + 1] for i in range(3))        # [N,1]
    dx, dy, dz = (rays_d[:, i:i + 1] for i in range(3))

    det = -(dx * nx[None] + dy * ny[None] + dz * nz[None])     # [N,F]
    invdet = 1.0 / (det + eps)
    a0x = ox - ax[None]
    a0y = oy - ay[None]
    a0z = oz - az[None]
    # da0 = a0 x d  (d broadcast per ray)
    cx = a0y * dz - a0z * dy
    cy = a0z * dx - a0x * dz
    cz = a0x * dy - a0y * dx
    u = (cx * e2x[None] + cy * e2y[None] + cz * e2z[None]) * invdet
    v = -(cx * e1x[None] + cy * e1y[None] + cz * e1z[None]) * invdet
    t = (a0x * nx[None] + a0y * ny[None] + a0z * nz[None]) * invdet
    nondeg = (nx * nx + ny * ny + nz * nz) > 1e-16
    hit = (t >= 0) & (u >= 0) & (v >= 0) & (u + v <= 1.0) & nondeg[None, :]
    return hit.any(axis=1)


def points_in_mesh(points: jnp.ndarray, tris: jnp.ndarray,
                   test_dir: jnp.ndarray = None) -> jnp.ndarray:
    """Inside test by double-sided ray parity-ish check: a point is inside iff
    rays in both +d and -d hit the mesh (reference points_in_mesh,
    seal_utils.py:667-684)."""
    if test_dir is None:
        test_dir = jnp.array([0.4395064455, 0.617598629942, 0.652231566745])
    test_dir = jnp.broadcast_to(jnp.reshape(test_dir, (-1, 3))[0], points.shape)
    fwd = moller_trumbore_any(points, test_dir, tris)
    bwd = moller_trumbore_any(points, -test_dir, tris)
    return fwd & bwd


def project_points(plane_norm: jnp.ndarray, plane_point: jnp.ndarray,
                   points: jnp.ndarray) -> jnp.ndarray:
    """Project points onto the plane (normal, point) (seal_utils.py:728-736)."""
    v = points - plane_point
    coef = (v @ plane_norm) / jnp.maximum(plane_norm @ plane_norm, 1e-12)
    return points - coef[..., None] * plane_norm


def point_triangle_distance(points: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """Min distance from each point to any triangle. points [N,3], tris [F,3,3].

    Used for brush-surface border detection and SDF supervision (replaces
    pytorch3d point_face_dist, seal_utils.py:701-723)."""
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    p = points[:, None, :]  # [N,1,3]
    ab = b - a
    ac = c - a
    ap = p - a[None]
    d1 = jnp.einsum("fd,nfd->nf", ab, ap)
    d2 = jnp.einsum("fd,nfd->nf", ac, ap)
    bp = p - b[None]
    d3 = jnp.einsum("fd,nfd->nf", ab, bp)
    d4 = jnp.einsum("fd,nfd->nf", ac, bp)
    cp = p - c[None]
    d5 = jnp.einsum("fd,nfd->nf", ab, cp)
    d6 = jnp.einsum("fd,nfd->nf", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-12)
    v = vb / denom
    w = vc / denom
    # clamp to triangle via region tests
    v = jnp.where((d1 <= 0) & (d2 <= 0), 0.0, v)
    w = jnp.where((d1 <= 0) & (d2 <= 0), 0.0, w)
    v = jnp.where((d3 >= 0) & (d4 <= d3), 1.0, v)
    w = jnp.where((d3 >= 0) & (d4 <= d3), 0.0, w)
    v = jnp.where((d6 >= 0) & (d5 <= d6), 0.0, v)
    w = jnp.where((d6 >= 0) & (d5 <= d6), 1.0, w)
    edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-12), 0, 1)
    v = jnp.where(edge_ab, t_ab, v)
    w = jnp.where(edge_ab, 0.0, w)
    edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-12), 0, 1)
    v = jnp.where(edge_ac, 0.0, v)
    w = jnp.where(edge_ac, t_ac, w)
    edge_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-12), 0, 1)
    v = jnp.where(edge_bc, 1.0 - t_bc, v)
    w = jnp.where(edge_bc, t_bc, w)
    v = jnp.clip(v, 0, 1)
    w = jnp.clip(w, 0, 1)
    closest = a[None] + v[..., None] * ab[None] + w[..., None] * ac[None]
    d = jnp.linalg.norm(p - closest, axis=-1)
    nondeg = (jnp.cross(ab, ac) ** 2).sum(-1) > 1e-16
    d = jnp.where(nondeg[None, :], d, jnp.inf)
    return d.min(axis=1)
