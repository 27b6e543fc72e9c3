"""Native mesh extraction: a sphere density must produce a sphere mesh."""

import numpy as np

from seal3d_tpu.runtime.mesh_export import extract_geometry, marching_tetrahedra, save_mesh


def test_marching_tetrahedra_sphere(tmp_path):
    r = 48
    lin = np.linspace(-1, 1, r, dtype=np.float32)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    grid = 1.0 - np.sqrt(x * x + y * y + z * z)  # >0 inside unit sphere... iso 0.5 -> r=0.5
    verts, tris = marching_tetrahedra(grid, 0.5, origin=(-1, -1, -1),
                                      spacing=(2 / (r - 1),) * 3)
    assert len(verts) > 500 and len(tris) > 500
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.03)
    assert radii.std() < 0.03
    assert tris.min() >= 0 and tris.max() < len(verts)

    p = tmp_path / "sphere.ply"
    save_mesh(str(p), verts, tris)
    head = p.read_text().splitlines()[:2]
    assert head[0] == "ply"
    save_mesh(str(tmp_path / "sphere.obj"), verts, tris)


def test_extract_geometry_field():
    import jax.numpy as jnp

    def density(x):
        return 30.0 * (0.4 - jnp.linalg.norm(x, axis=-1))

    verts, tris = extract_geometry(density, bound=1.0, resolution=40,
                                   threshold=0.0)
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.4, atol=0.05)
