"""CCNeRF trainer: rank-residual training loss.

The reference trains CCNeRF through the generic trainer with a [K, B, N]
loss that is meaned over K (nerf/utils.py:505-507): every rank prefix must
reconstruct the image. Here that is one dense render whose field query
returns K progressive outputs; composite_dense broadcasts over the leading
K axis."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from seal3d_tpu.models import ccnerf
from seal3d_tpu.ops.composite import composite_dense
from seal3d_tpu.ops.raymarch import near_far_from_aabb
from seal3d_tpu.train.trainer import TrainConfig, Trainer


def cc_optimizer(cfg: TrainConfig, lr_factor: float = 2e-2, lr_net: float = 1e-3):
    """U factors at lr1, S weights at lr2 (reference get_params, network_cc.py:619)."""

    def label(params):
        def obj_label(obj):
            return {k: ({"U": "factor", "S": "net"} if isinstance(v, list) and v
                        and isinstance(v[0], dict) and "U" in v[0]
                        else "frozen")
                    for k, v in obj.items()}

        out = {}
        for k in params:
            if k == "objects":
                out[k] = [
                    {fam: [{"U": "factor", "S": "net"} for _ in obj[fam]]
                     if fam in ("vec_density", "mat_density", "vec_color", "mat_color")
                     else "frozen"
                     for fam in obj}
                    for obj in params["objects"]]
            elif k == "bg_mat":
                out[k] = "factor"
            elif k == "bg_S":
                out[k] = "net"
            else:
                out[k] = "frozen"
        return out

    def make(lr):
        sched = lambda s: lr * (0.1 ** jnp.minimum(s / cfg.max_steps, 1.0))
        return optax.chain(optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
                           optax.scale_by_schedule(lambda s: -sched(s)))

    return optax.multi_transform(
        {"factor": make(lr_factor), "net": make(lr_net),
         "frozen": optax.set_to_zero()}, label)


class CCNeRFTrainer(Trainer):
    """Dense-path rank-residual training for a single CCNeRF object."""

    def __init__(self, field_cfg: ccnerf.CCNeRFConfig, opts, cfg: TrainConfig,
                 dataset=None, key=None, mesh=None, name: str = "ccnerf",
                 l1_weight: float = 1e-5):
        self.l1_weight = l1_weight
        super().__init__(ccnerf, field_cfg, opts, cfg, dataset=dataset, key=key,
                         mesh=mesh, use_dense=True, name=name,
                         optimizer=cc_optimizer(cfg))
        self._wrap_residual_loss()

    def _wrap_residual_loss(self):
        field, fcfg, opts, cfg = self.field, self.fcfg, self.opts, self.cfg

        def loss_fn(params, bitfield, batch, key, occ_aabb=None):
            rays_o, rays_d = batch["rays_o"], batch["rays_d"]
            aabb = jnp.array(opts.aabb, jnp.float32)
            nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, opts.min_near)
            nears = jnp.minimum(nears, 100.0)
            fars = jnp.minimum(fars, 100.1)
            k_steps = opts.num_steps
            z = nears[:, None] + (fars - nears)[:, None] * jnp.linspace(0, 1, k_steps)
            sample_dist = (fars - nears) / k_steps
            z = z + (jax.random.uniform(key, z.shape) - 0.5) * sample_dist[:, None]
            xyz = rays_o[:, None] + z[..., None] * rays_d[:, None]
            xyz = jnp.clip(xyz, -opts.bound, opts.bound).reshape(-1, 3)
            dirs = jnp.broadcast_to(rays_d[:, None], (z.shape[0], k_steps, 3)).reshape(-1, 3)
            sigma, rgb = ccnerf.apply_residual(params, fcfg, xyz, dirs)  # [K,M],[K,M,3]
            kk = sigma.shape[0]
            sigma = sigma.reshape(kk, *z.shape) * opts.density_scale
            rgb = rgb.reshape(kk, *z.shape, 3)
            deltas = jnp.diff(z, axis=-1)
            deltas = jnp.concatenate([deltas, sample_dist[:, None]], -1)
            out = composite_dense(sigma, rgb, deltas, z)  # broadcasts over K
            image = out["image"] + (1.0 - out["weights_sum"])[..., None] * batch["bg"]
            per_ray = ((image - batch["gt"]) ** 2).mean(-1).mean(0)  # mean over K
            loss = per_ray.mean() + self.l1_weight * ccnerf.density_loss(params, fcfg)
            return loss, (per_ray, {"image": image[-1], "depth": out["depth"][-1],
                                    "num_samples": jnp.zeros(())})

        # rebuild the jitted steps around the residual loss
        self._cc_loss_fn = loss_fn
        self._build_steps(loss_override=loss_fn)

    def load_checkpoint(self, path: str):
        """Rank/resolution-aware load: reference .pth checkpoints carry the
        cumulative rank lists + resolution, and the model is RE-INSTANTIATED
        to that structure before loading (the reference's 'very ugly'
        CCNeRF re-init, tensoRF/utils.py:330-348)."""
        if path.endswith(".pth"):
            from seal3d_tpu.train import checkpoint as ckpt_io

            params, new_cfg = ckpt_io.import_torch_ccnerf(path, self.fcfg)
            self.fcfg = new_cfg
            if self.state is None:
                self.init_state()
            self.state = self.state._replace(
                params=params,
                opt_state=self.optimizer.init(params),
                ema_params=jax.tree.map(jnp.copy, params))
            self._wrap_residual_loss()  # re-capture the new fcfg
            print(f"[ckpt] torch ccnerf checkpoint: resolution "
                  f"{new_cfg.resolution}, ranks {new_cfg.rank_vec}")
            return self.state
        return super().load_checkpoint(path)
