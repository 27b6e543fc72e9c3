"""Procedural analytic scene + ground-truth renderer.

The execution environment ships no NeRF datasets (no lego), so benchmarks and
end-to-end tests synthesize one: an analytic density/color field (colored
blobs + a box on a stand, lego-ish occupancy sparsity) rendered to
ground-truth images with the dense compositor. Training any backbone against
these images gives a real PSNR signal with zero external data.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.data.provider import NeRFDataset, rand_poses
from seal3d_tpu.data.rays import get_full_rays
from seal3d_tpu.ops.composite import composite_dense


@dataclass(frozen=True)
class SyntheticScene:
    """A fixed arrangement of soft solids inside [-bound, bound]^3."""

    bound: float = 1.0
    density_scale: float = 60.0

    def density(self, x: jnp.ndarray) -> jnp.ndarray:
        """[..., 3] -> [...] sigma (smooth indicators, VPU-only math)."""
        k = 60.0  # edge sharpness

        def ball(c, r):
            d = jnp.linalg.norm(x - jnp.asarray(c), axis=-1) - r
            return jax.nn.sigmoid(-k * d)

        def box(c, half):
            q = jnp.abs(x - jnp.asarray(c)) - jnp.asarray(half)
            d = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(q.max(-1), 0.0)
            return jax.nn.sigmoid(-k * d)

        def torus(c, R, r):
            p = x - jnp.asarray(c)
            q = jnp.stack([jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2) - R, p[..., 1]], -1)
            d = jnp.linalg.norm(q, axis=-1) - r
            return jax.nn.sigmoid(-k * d)

        occ = (
            ball([0.35, 0.1, 0.0], 0.22)
            + ball([-0.3, -0.05, 0.25], 0.18)
            + box([0.0, -0.35, 0.0], [0.45, 0.08, 0.45])
            + torus([0.0, 0.25, -0.2], 0.28, 0.09)
        )
        return self.density_scale * jnp.clip(occ, 0.0, 1.0)

    def color(self, x: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
        """[..., 3], [..., 3] -> [..., 3] albedo with mild view-dependence."""
        base = jnp.stack(
            [
                0.5 + 0.5 * jnp.sin(4.0 * x[..., 0]),
                0.5 + 0.5 * jnp.sin(5.0 * x[..., 1] + 1.0),
                0.5 + 0.5 * jnp.cos(4.0 * x[..., 2]),
            ],
            axis=-1,
        )
        sheen = 0.15 * (0.5 + 0.5 * (d * jnp.array([0.0, 1.0, 0.0])).sum(-1))
        return jnp.clip(base + sheen[..., None], 0.0, 1.0)

    def render_rays(self, rays_o, rays_d, num_steps: int = 384, bg: float = 1.0):
        near = jnp.full(rays_o.shape[:-1], 0.05)
        far = jnp.full(rays_o.shape[:-1], 2.0 * self.bound + 2.0)
        z = near[..., None] + (far - near)[..., None] * jnp.linspace(0.0, 1.0, num_steps)
        xyz = rays_o[:, None] + z[..., None] * rays_d[:, None]
        inside = (jnp.abs(xyz) <= self.bound).all(-1)
        sigma = jnp.where(inside, self.density(xyz), 0.0)
        rgb = self.color(xyz, jnp.broadcast_to(rays_d[:, None], xyz.shape))
        deltas = jnp.diff(z, axis=-1)
        deltas = jnp.concatenate([deltas, deltas[..., -1:]], -1)
        out = composite_dense(sigma, rgb, deltas, z)
        image = out["image"] + (1.0 - out["weights_sum"])[:, None] * bg
        return image, out["depth"]

    def _jitted_render(self):
        # cache the jitted renderer on the instance (object.__setattr__
        # because the dataclass is frozen) so repeated views don't recompile
        fn = getattr(self, "_render_fn", None)
        if fn is None:
            fn = jax.jit(self.render_rays)
            object.__setattr__(self, "_render_fn", fn)
        return fn

    def render_view(self, pose, intrinsics, h: int, w: int, chunk: int = 16384):
        rays = get_full_rays(jnp.asarray(pose), jnp.asarray(intrinsics), h, w)
        imgs, deps = [], []
        render = self._jitted_render()
        n = h * w
        for i in range(0, n, chunk):
            ro = rays["rays_o"][i : i + chunk]
            rd = rays["rays_d"][i : i + chunk]
            if ro.shape[0] < chunk:  # pad so every chunk shares one compile
                pad = chunk - ro.shape[0]
                ro = jnp.pad(ro, ((0, pad), (0, 0)))
                rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            img, dep = render(ro, rd)
            imgs.append(img[: min(chunk, n - i)])
            deps.append(dep[: min(chunk, n - i)])
        return (jnp.concatenate(imgs).reshape(h, w, 3),
                jnp.concatenate(deps).reshape(h, w))

    def make_dataset(self, n_views: int = 24, h: int = 128, w: int = 128,
                     radius: float = 2.2, seed: int = 0,
                     fov_deg: float = 50.0) -> NeRFDataset:
        rng = np.random.default_rng(seed)
        poses = rand_poses(rng, n_views, radius=radius, theta_range=(30, 120))
        fx = fy = 0.5 * w / np.tan(0.5 * np.deg2rad(fov_deg))
        intr = np.array([fx, fy, w / 2.0, h / 2.0], np.float32)
        images = []
        for p in poses:
            img, _ = self.render_view(p, intr, h, w)
            images.append(np.asarray(jnp.clip(img, 0, 1) * 255).astype(np.uint8))
        return NeRFDataset(poses=poses.astype(np.float32), images=np.stack(images),
                           intrinsics=intr, h=h, w=w, radius=radius)


@dataclass(frozen=True)
class HardSyntheticScene(SyntheticScene):
    """Hard-mode benchmark scene: lego-like frequency content with NO smooth
    shortcuts — a studded base plate (7x7 sphere-cap grid), four thin pillars
    with a top frame (2-4 cm struts), a thin-shell wheel, and a checker/stripe
    3D texture at ~15 cycles/unit. Small hash tables underfit this scene
    visibly, which is what the bench's capacity ablation needs (VERDICT r1:
    smooth blobs could not expose the 2^14-vs-2^19 table gap)."""

    density_scale: float = 90.0
    gt_steps: int = 768  # thin structures need a finer GT ladder

    def density(self, x: jnp.ndarray) -> jnp.ndarray:
        k = 220.0  # much sharper edges than the base scene

        def sd_box(c, half):
            q = jnp.abs(x - jnp.asarray(c)) - jnp.asarray(half)
            return (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
                    + jnp.minimum(q.max(-1), 0.0))

        def occ(d):
            return jax.nn.sigmoid(-k * d)

        # base plate
        total = occ(sd_box([0.0, -0.42, 0.0], [0.5, 0.03, 0.5]))
        # 7x7 stud grid on the plate: fold x/z into the nearest cell
        pitch = 0.125
        gx = jnp.clip(jnp.round(x[..., 0] / pitch), -3, 3) * pitch
        gz = jnp.clip(jnp.round(x[..., 2] / pitch), -3, 3) * pitch
        stud = jnp.stack([x[..., 0] - gx, x[..., 1] + 0.37, x[..., 2] - gz], -1)
        total = total + occ(jnp.linalg.norm(stud, axis=-1) - 0.040)
        # four thin pillars + top frame struts (half-width 0.022)
        for sx in (-0.38, 0.38):
            for sz in (-0.38, 0.38):
                total = total + occ(sd_box([sx, -0.05, sz], [0.022, 0.34, 0.022]))
        for sx in (-0.38, 0.38):
            total = total + occ(sd_box([sx, 0.29, 0.0], [0.022, 0.022, 0.4]))
            total = total + occ(sd_box([0.0, 0.29, sx], [0.4, 0.022, 0.022]))
        # thin-shell wheel (torus) leaning in the middle
        p = x - jnp.asarray([0.0, 0.0, 0.0])
        pr = jnp.stack([p[..., 0],
                        (p[..., 1] + p[..., 2]) * 0.70710678,
                        (p[..., 2] - p[..., 1]) * 0.70710678], -1)
        q = jnp.stack([jnp.sqrt(pr[..., 0] ** 2 + pr[..., 2] ** 2) - 0.26,
                       pr[..., 1]], -1)
        total = total + occ(jnp.linalg.norm(q, axis=-1) - 0.028)
        return self.density_scale * jnp.clip(total, 0.0, 1.0)

    def color(self, x: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
        # high-frequency 3D checker + stripes (~15 cycles/unit) over a
        # position-keyed base palette; view sheen kept from the base scene
        checker = (jnp.sin(47.0 * x[..., 0]) * jnp.sin(43.0 * x[..., 1])
                   * jnp.sin(53.0 * x[..., 2]))
        stripes = jnp.sin(89.0 * (x[..., 0] + x[..., 2]))
        base = jnp.stack(
            [
                0.5 + 0.28 * jnp.tanh(6.0 * checker),
                0.5 + 0.28 * jnp.tanh(6.0 * stripes),
                0.5 + 0.4 * jnp.sin(3.0 * x[..., 1] + 2.0),
            ],
            axis=-1,
        )
        sheen = 0.1 * (0.5 + 0.5 * (d * jnp.array([0.0, 1.0, 0.0])).sum(-1))
        return jnp.clip(base + sheen[..., None], 0.0, 1.0)

    def render_rays(self, rays_o, rays_d, num_steps: int | None = None,
                    bg: float = 1.0):
        return SyntheticScene.render_rays(
            self, rays_o, rays_d, num_steps=num_steps or self.gt_steps, bg=bg)


@dataclass(frozen=True)
class WideSyntheticScene(SyntheticScene):
    """Unbounded-style scene for multi-cascade (bound=2) benchmarks: a
    center object plus satellites OUTSIDE [-1, 1]^3, so cascade 1 carries
    real content — the shape of the reference's fox recipe (`--bound 2
    --scale 0.33`, readme.md:84; cascade mips raymarching.cu:42-54).
    Cameras must orbit wider (make_dataset radius default raised)."""

    bound: float = 2.0

    def density(self, x: jnp.ndarray) -> jnp.ndarray:
        k = 60.0

        def ball(c, r):
            d = jnp.linalg.norm(x - jnp.asarray(c), axis=-1) - r
            return jax.nn.sigmoid(-k * d)

        def box(c, half):
            q = jnp.abs(x - jnp.asarray(c)) - jnp.asarray(half)
            d = (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
                 + jnp.minimum(q.max(-1), 0.0))
            return jax.nn.sigmoid(-k * d)

        occ = (
            ball([0.0, 0.05, 0.0], 0.3)                      # cascade-0 core
            + box([0.0, -0.5, 0.0], [0.6, 0.08, 0.6])        # base, cascade 0
            + ball([1.45, 0.1, 0.2], 0.28)                   # cascade-1 satellite
            + ball([-1.3, -0.15, -0.9], 0.25)                # cascade-1 satellite
            + box([0.2, 0.1, 1.5], [0.3, 0.25, 0.12])        # cascade-1 slab
        )
        return self.density_scale * jnp.clip(occ, 0.0, 1.0)

    def make_dataset(self, n_views: int = 24, h: int = 128, w: int = 128,
                     radius: float = 4.0, seed: int = 0,
                     fov_deg: float = 58.0) -> NeRFDataset:
        return SyntheticScene.make_dataset(self, n_views=n_views, h=h, w=w,
                                           radius=radius, seed=seed,
                                           fov_deg=fov_deg)


@dataclass(frozen=True)
class DynamicSyntheticScene(SyntheticScene):
    """Time-varying variant: one blob swings on an arc over t in [0,1]
    (ground truth for D-NeRF tests/benchmarks).

    The motion is an oscillation (+-0.9 rad arc), not a full revolution: the
    reference's D-NeRF scenes (jumpingjacks, mutant, ...) all have bounded
    part motion, and a 360-degree orbit is geometrically unidentifiable from
    monocular one-view-per-time data (verified: train views fit to ~24 dB
    while held-out views stall at ~15 dB on the orbiting variant)."""

    orbit_radius: float = 0.4

    def density_t(self, x: jnp.ndarray, t) -> jnp.ndarray:
        k = 60.0
        ang = 0.9 * jnp.sin(2.0 * jnp.pi * jnp.asarray(t))
        c = jnp.stack([self.orbit_radius * jnp.cos(ang),
                       jnp.zeros_like(ang) + 0.1,
                       self.orbit_radius * jnp.sin(ang)], -1)
        d = jnp.linalg.norm(x - c, axis=-1) - 0.22
        moving = jax.nn.sigmoid(-k * d)
        q = jnp.abs(x - jnp.array([0.0, -0.35, 0.0])) - jnp.array([0.45, 0.08, 0.45])
        dbox = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(q.max(-1), 0.0)
        static = jax.nn.sigmoid(-k * dbox)
        return self.density_scale * jnp.clip(moving + static, 0.0, 1.0)

    def render_rays_t(self, rays_o, rays_d, t, num_steps: int = 256, bg: float = 1.0):
        near = jnp.full(rays_o.shape[:-1], 0.05)
        far = jnp.full(rays_o.shape[:-1], 2.0 * self.bound + 2.0)
        z = near[..., None] + (far - near)[..., None] * jnp.linspace(0.0, 1.0, num_steps)
        xyz = rays_o[:, None] + z[..., None] * rays_d[:, None]
        inside = (jnp.abs(xyz) <= self.bound).all(-1)
        sigma = jnp.where(inside, self.density_t(xyz, t), 0.0)
        rgb = self.color(xyz, jnp.broadcast_to(rays_d[:, None], xyz.shape))
        deltas = jnp.diff(z, axis=-1)
        deltas = jnp.concatenate([deltas, deltas[..., -1:]], -1)
        out = composite_dense(sigma, rgb, deltas, z)
        return out["image"] + (1.0 - out["weights_sum"])[:, None] * bg, out["depth"]

    def make_dataset(self, n_views: int = 24, h: int = 128, w: int = 128,
                     radius: float = 2.2, seed: int = 0,
                     fov_deg: float = 50.0,
                     views_per_time: int = 2) -> NeRFDataset:
        rng = np.random.default_rng(seed)
        poses = rand_poses(rng, n_views, radius=radius, theta_range=(30, 120))
        fx = fy = 0.5 * w / np.tan(0.5 * np.deg2rad(fov_deg))
        intr = np.array([fx, fy, w / 2.0, h / 2.0], np.float32)
        # >= 2 poses per time step: strictly one-view-per-time data leaves
        # the per-time geometry unconstrained (the deformation net can
        # fabricate a different 3D scene for every frame and fit each single
        # view — measured: train 24 dB / held-out 15 dB). The reference's
        # D-NeRF scenes avoid this through densely-sampled slow motion;
        # simultaneous views are this benchmark's equivalent constraint
        # (views_per_time=4 is the convergence-run setting, see
        # PERFORMANCE.md D-NeRF section).
        vpt = max(views_per_time, 1)
        n_times = max(n_views // vpt, 1)
        times = np.repeat(np.linspace(0.0, 1.0, n_times), vpt)[:n_views]
        if len(times) < n_views:  # n_views not divisible by vpt
            times = np.concatenate([times, np.ones(n_views - len(times))])
        times = times.astype(np.float32)
        render = jax.jit(self.render_rays_t)
        images = []
        for p, t in zip(poses, times):
            rays = get_full_rays(jnp.asarray(p), jnp.asarray(intr), h, w)
            imgs = []
            chunk = 16384
            n = h * w
            for i in range(0, n, chunk):
                ro = rays["rays_o"][i : i + chunk]
                rd = rays["rays_d"][i : i + chunk]
                if ro.shape[0] < chunk:
                    pad = chunk - ro.shape[0]
                    ro = jnp.pad(ro, ((0, pad), (0, 0)))
                    rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
                img, _ = render(ro, rd, jnp.asarray(t))
                imgs.append(img[: min(chunk, n - i)])
            img = jnp.concatenate(imgs).reshape(h, w, 3)
            images.append(np.asarray(jnp.clip(img, 0, 1) * 255).astype(np.uint8))
        return NeRFDataset(poses=poses.astype(np.float32), images=np.stack(images),
                           intrinsics=intr, h=h, w=w, radius=radius, times=times)
