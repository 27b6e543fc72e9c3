"""Time composite_flat seg_mode='scan' vs 'scatter' at the eval chunk size.

The scatter variant measured 38 ms of the 151 ms render chunk (round-3
attribution, /tmp/profile_render.log); the scan variant replaces the
[M]-row scatter-adds with a compensated cumsum + 2 boundary gathers per
ray. This probe checks compile time + steady-state, fwd and fwd+bwd, at
the real eval point (M=589824, N=32768) and the train point (M=49152,
N=4096).

Run: timeout 590 python -u scripts/probe_composite.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.ops.composite import composite_flat


def _sync(out):
    jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0])


def timeit(fn, *args, n=10):
    t0 = time.time()
    out = fn(*args)
    _sync(out)
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return t_compile, (time.time() - t0) / n * 1e3


def make_inputs(n, m, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 2 * m // n, n)
    offsets = np.zeros(n, np.int32)
    offsets[1:] = np.cumsum(counts)[:-1].astype(np.int32)
    ray_id = np.clip(np.searchsorted(offsets, np.arange(m), side="right") - 1,
                     0, n - 1).astype(np.int32)
    ends = np.concatenate([offsets[1:], [m]])
    valid = np.arange(m) < ends[ray_id]
    sig = rng.uniform(0, 50, m).astype(np.float32)
    rgb = rng.uniform(0, 1, (m, 3)).astype(np.float32)
    dts = np.full(m, 0.005, np.float32)
    ts = rng.uniform(0.1, 2.0, m).astype(np.float32)
    return (jnp.asarray(sig), jnp.asarray(rgb), jnp.asarray(dts),
            jnp.asarray(ts), jnp.asarray(ray_id),
            jnp.asarray(np.minimum(offsets, m)), jnp.asarray(valid))


def main():
    for n, m, tag in ((4096, 49152, "train"), (32768, 589824, "eval")):
        args = make_inputs(n, m)
        for mode in ("scan", "scatter"):
            f = jax.jit(lambda *a, _m=mode: composite_flat(
                *a, num_rays=n, seg_mode=_m)["image"].sum())
            tc, tr = timeit(f, *args)
            g = jax.jit(jax.grad(lambda *a, _m=mode: composite_flat(
                *a, num_rays=n, seg_mode=_m)["image"].sum()))
            tcg, trg = timeit(g, *args)
            print(f"{tag:5s} {mode:7s}: fwd compile {tc:6.1f}s run {tr:7.2f} ms"
                  f"   bwd compile {tcg:6.1f}s run {trg:7.2f} ms", flush=True)
        # parity
        a = composite_flat(*args, num_rays=n, seg_mode="scan")
        b = composite_flat(*args, num_rays=n, seg_mode="scatter")
        for kk in ("image", "weights_sum", "depth"):
            err = float(jnp.abs(a[kk] - b[kk]).max())
            print(f"  parity {kk}: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
