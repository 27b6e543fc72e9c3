"""Quality metrics.

PSNR mirrors reference PSNRMeter (nerf/utils.py:208-242). SSIM is provided as
a self-contained secondary metric. LPIPS requires pretrained AlexNet weights
(the reference uses the `lpips` package, nerf/utils.py:244-278); this image
has no network egress and no lpips wheel, so `LPIPSMeter` degrades to None
unless weights are supplied locally.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def psnr(pred, truth) -> float:
    mse = float(np.mean((np.asarray(pred) - np.asarray(truth)) ** 2))
    if mse <= 1e-12:
        return 99.0
    return -10.0 * np.log10(mse)


class PSNRMeter:
    def __init__(self):
        self.v = 0.0
        self.n = 0

    def update(self, pred, truth):
        self.v += psnr(pred, truth)
        self.n += 1

    def measure(self) -> float:
        return self.v / max(self.n, 1)

    def clear(self):
        self.v, self.n = 0.0, 0

    def report(self) -> str:
        return f"PSNR = {self.measure():.4f}"


def ssim(pred, truth, window: int = 7, c1: float = 0.01**2, c2: float = 0.03**2) -> float:
    """Mean SSIM with a uniform window, grayscale-averaged channels."""
    p = jnp.asarray(pred, jnp.float32)
    t = jnp.asarray(truth, jnp.float32)
    if p.ndim == 3:
        p = p.mean(-1)
        t = t.mean(-1)

    def box(x):
        k = window
        c = jnp.cumsum(jnp.cumsum(jnp.pad(x, ((1, 0), (1, 0))), 0), 1)
        s = c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]
        return s / (k * k)

    mp, mt = box(p), box(t)
    vp = box(p * p) - mp * mp
    vt = box(t * t) - mt * mt
    cov = box(p * t) - mp * mt
    s = ((2 * mp * mt + c1) * (2 * cov + c2)) / ((mp * mp + mt * mt + c1) * (vp + vt + c2))
    return float(s.mean())


def lpips_proxy(pred, truth, scales: int = 4) -> float:
    """Self-contained perceptual distance (NO pretrained weights).

    The reference scores eval with AlexNet-LPIPS (nerf/utils.py:244-278);
    this image has no egress, so we substitute a weight-free multi-scale
    contrast-normalized gradient distance: at each dyadic scale, compare
    local-contrast-normalized image gradients (structure, like LPIPS's early
    conv features) rather than raw pixels. 0 = identical; larger = more
    perceptually different. Reported as `lpips_proxy` everywhere — it is NOT
    numerically comparable to true LPIPS, only rank-correlated.
    """
    p = np.asarray(pred, np.float32)
    t = np.asarray(truth, np.float32)
    if p.ndim == 3:
        p = p.mean(-1)
        t = t.mean(-1)
    total = 0.0
    for s in range(scales):
        if min(p.shape) < 8:
            break

        def feats(x):
            gx = np.diff(x, axis=0)[:, :-1]
            gy = np.diff(x, axis=1)[:-1, :]
            mag = np.sqrt(gx * gx + gy * gy)
            # local contrast normalization (5x5 box of |grad|)
            k = 5
            pad = np.pad(mag, ((1, k - 1), (1, k - 1)), mode="edge")
            c = np.cumsum(np.cumsum(pad, 0), 1)
            local = (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]) / (k * k)
            local = local[: gx.shape[0], : gx.shape[1]]
            n = local + 0.01
            return gx / n, gy / n

        pgx, pgy = feats(p)
        tgx, tgy = feats(t)
        total += float(np.mean((pgx - tgx) ** 2 + (pgy - tgy) ** 2)) / scales
        p = 0.25 * (p[::2, ::2] + p[1::2, ::2] + p[::2, 1::2] + p[1::2, 1::2]) \
            if p.shape[0] % 2 == 0 and p.shape[1] % 2 == 0 else p[::2, ::2]
        t = 0.25 * (t[::2, ::2] + t[1::2, ::2] + t[::2, 1::2] + t[1::2, 1::2]) \
            if t.shape[0] % 2 == 0 and t.shape[1] % 2 == 0 else t[::2, ::2]
    return total


class PerceptualMeter:
    """LPIPS when local weights exist, else the self-contained proxy.
    `kind` says which one actually ran."""

    def __init__(self, weights_path=None):
        self._lpips = LPIPSMeter(weights_path)
        self.kind = "lpips" if self._lpips.available else "lpips_proxy"
        self.v, self.n = 0.0, 0

    def update(self, pred, truth):
        if self._lpips.available:
            self._lpips.update(pred, truth)
        else:
            self.v += lpips_proxy(pred, truth)
            self.n += 1

    def measure(self) -> float:
        if self._lpips.available:
            return self._lpips.measure()
        return self.v / max(self.n, 1)

    def report(self) -> str:
        return f"{self.kind} = {self.measure():.4f}"


class LPIPSMeter:  # pragma: no cover - needs external weights
    """Gated LPIPS: active only if a local torch checkpoint of AlexNet-LPIPS
    is provided (no egress in this environment)."""

    def __init__(self, weights_path=None):
        self.available = False
        self.v, self.n = 0.0, 0
        if weights_path:
            try:
                import lpips  # type: ignore

                self.fn = lpips.LPIPS(net="alex", model_path=weights_path)
                self.available = True
            except Exception:
                self.available = False

    def update(self, pred, truth):
        if not self.available:
            return
        import torch

        p = torch.from_numpy(np.asarray(pred)).permute(2, 0, 1)[None] * 2 - 1
        t = torch.from_numpy(np.asarray(truth)).permute(2, 0, 1)[None] * 2 - 1
        self.v += float(self.fn(p, t).item())
        self.n += 1

    def measure(self):
        return self.v / max(self.n, 1) if self.available else None
