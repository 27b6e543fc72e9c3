"""A/B the halo-encode kernel restructures on the real TPU.

Round-2 attribution: encode fwd+bwd = 16.3 ms of the 36.2 ms step, with
~3 ms suspected in the backward's read-modify-write chain (VERDICT r3
item 1: "restructure the halo backward's RMW chain"). Two candidate
restructures, both semantics-preserving:

  ck=512    one one-hot matmul over ALL n_rows per level instead of 4
            chunked ones (fewer, larger MXU ops; 1 RMW per level in bwd
            instead of 4)
  unroll    static Python level loop instead of lax.fori_loop (static `l`
            lets Mosaic disambiguate the per-level gtab slices and
            pipeline across levels; 16x kernel body)

Times the fused STACKED encode (dual grid, f_dim=4, fw=512) at the recipe
operating point M=49152 (=4096 rays x 48 budget x 0.25 flat), fwd alone and
fwd+bwd through halo_expand (the real train path).

Run:  timeout 590 python -u scripts/probe_halo_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from seal3d_tpu.ops import hashgrid
from seal3d_tpu.ops.pallas import halo_encode as he


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n * 1e3


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    cfg = hashgrid.HashGridConfig(
        num_levels=16, level_dim=4, base_resolution=16,
        log2_hashmap_size=15, desired_resolution=2048,
        backend="halo", gridtype="wrap")
    key = jax.random.PRNGKey(0)
    master = jax.random.normal(key, (16 * 2**15, 4), jnp.float32) * 1e-2
    x = jax.random.uniform(jax.random.PRNGKey(1), (m, 3))
    valid = jnp.ones((m,), jnp.bool_)

    def fwd(mast, xx):
        stored = he.halo_expand(mast, cfg)
        return he.halo_encode_fused(stored, xx, valid, cfg).sum()

    grad = jax.grad(fwd)

    base = None
    for tag, ckf, ckb, unroll in (
            ("base  ck128/128 fori", 128, 128, False),
            ("ck512 fwd+bwd   fori", 512, 512, False),
            ("ck512 bwd only  fori", 128, 512, False),
            ("ck512 fwd+bwd unroll", 512, 512, True),
            ("base ck128    unroll", 128, 128, True)):
        he._CK_FWD, he._CK_BWD, he._UNROLL_LEVELS = ckf, ckb, unroll
        f_j = jax.jit(fwd)
        g_j = jax.jit(grad)
        # correctness pin vs base variant
        gv = g_j(master, x)
        if base is None:
            base = np.asarray(gv)
        else:
            err = float(np.abs(np.asarray(gv) - base).max())
            assert err < 1e-4, (tag, err)
        t_f = timeit(f_j, master, x)
        t_g = timeit(g_j, master, x)
        print(f"{tag}:  fwd {t_f:6.2f} ms   fwd+bwd {t_g:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
