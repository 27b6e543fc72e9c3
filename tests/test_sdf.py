"""SDF task: dataset sampling oracle + small fit."""

import numpy as np
import jax
import pytest

from seal3d_tpu.data.sdf_provider import SDFDataset
from seal3d_tpu.models.sdf import SDFConfig
from seal3d_tpu.seal.geometry import box_mesh_from_aabb
from seal3d_tpu.train.sdf_trainer import SDFTrainer


def _box_dataset():
    verts, faces = box_mesh_from_aabb(np.array([[-1, -1, -1], [1, 1, 1.0]]))
    return SDFDataset(verts=verts, faces=faces, scale=0.5, seed=0)


def test_sdf_dataset_signs():
    ds = _box_dataset()  # box normalized to [-0.5, 0.5]
    pts = np.array([[0.0, 0, 0], [0.9, 0.9, 0.9], [0.45, 0, 0]], np.float32)
    import jax.numpy as jnp

    sdf = np.asarray(ds._sdf_jit(jnp.asarray(pts)))
    assert sdf[0] < -0.4  # deep inside
    assert sdf[1] > 0.3   # outside
    assert abs(sdf[2]) < 0.07  # near surface


@pytest.mark.slow
def test_sdf_fit_improves():
    ds = _box_dataset()
    tr = SDFTrainer(SDFConfig(log2_hashmap_size=14), ds, num_points=2048,
                    key=jax.random.PRNGKey(0))
    e0 = tr.evaluate(2048)
    tr.train(steps=150, silent=True)
    e1 = tr.evaluate(2048)
    print(f"sdf mae {e0:.4f} -> {e1:.4f}")
    assert e1 < e0 * 0.5
