"""SDF fitting trainer (reference sdf/utils.py:83: small Trainer with MAPE
loss over online point batches)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seal3d_tpu.models import sdf as sdf_model
from seal3d_tpu.utils.losses import mape_loss


class SDFTrainer:
    def __init__(self, cfg: sdf_model.SDFConfig, dataset, lr: float = 1e-3,
                 num_points: int = 16384, key=None, workspace=None):
        self.cfg = cfg
        self.dataset = dataset
        self.num_points = num_points
        self.workspace = workspace
        key = key if key is not None else jax.random.PRNGKey(0)
        self.params = sdf_model.init(key, cfg)
        self.optimizer = optax.adam(lr)
        self.opt_state = self.optimizer.init(self.params)

        def step(params, opt_state, pts, gt):
            def loss_fn(p):
                pred = sdf_model.apply(p, cfg, pts)
                return mape_loss(pred[:, None], gt[:, None])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

    def train(self, steps: int = 1000, log_every: int = 200, silent=False):
        t0 = time.time()
        loss = None
        for i in range(steps):
            pts, gt = self.dataset.batch(self.num_points)
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, jnp.asarray(pts), jnp.asarray(gt))
            if not silent and (i % log_every == 0 or i == steps - 1):
                print(f"[sdf] step {i} loss={float(loss):.5f} "
                      f"({(i+1)/(time.time()-t0):.1f} it/s)")
        return float(loss)

    def evaluate(self, n: int = 8192) -> float:
        pts, gt = self.dataset.batch(n)
        pred = np.asarray(sdf_model.apply(self.params, self.cfg, jnp.asarray(pts)))
        return float(np.abs(pred - gt).mean())

    def save_mesh(self, path: str, resolution: int = 256):
        from seal3d_tpu.runtime.mesh_export import extract_geometry, save_mesh

        verts, tris = extract_geometry(
            lambda x: -sdf_model.apply(self.params, self.cfg, x),
            bound=1.0, resolution=resolution, threshold=0.0)
        save_mesh(path, verts, tris)
