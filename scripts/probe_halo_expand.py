"""Is the per-step halo_expand (master -> stored stack) a real cost?

hashgrid.py:331 re-expands the [L*T, F] master table into the [L, B, F*128]
halo-stored stack inside EVERY encode call (so every train-step fwd pays the
125-strided-slice expansion and every bwd pays its transpose fold). The
stack is only 16 MB at the -O point, so on paper this is sub-ms data
movement — this probe measures fwd, fwd+bwd, and the encode with/without
the expansion amortized, to decide whether hoisting it (expand once per
step across the dual grids / caching in the train state) is worth the
complexity.

Usage: python scripts/probe_halo_expand.py [--log2t 15] [--m 73728]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2t", type=int, default=15)
    ap.add_argument("--m", type=int, default=73728)
    ap.add_argument("--f", type=int, default=4, help="stacked feature dim")
    args = ap.parse_args()

    from seal3d_tpu.ops.hashgrid import HashGridConfig
    from seal3d_tpu.ops.pallas.halo_encode import halo_encode_fused, halo_expand

    cfg = HashGridConfig(num_levels=16, level_dim=args.f,
                         log2_hashmap_size=args.log2t, gridtype="wrap",
                         backend="halo")
    t = 2 ** args.log2t
    key = jax.random.PRNGKey(0)
    master = jax.random.normal(key, (16 * t, args.f), jnp.float32) * 1e-2
    x = jax.random.uniform(jax.random.PRNGKey(1), (args.m, 3))

    expand_j = jax.jit(lambda m: halo_expand(m, cfg))
    ms_expand = timeit(expand_j, master)

    def expand_loss(m):
        return jnp.sum(halo_expand(m, cfg) ** 2)

    ms_expand_vjp = timeit(jax.jit(jax.grad(expand_loss)), master)

    stored = expand_j(master)

    def enc_from_master(m, xx):
        return jnp.sum(halo_encode_fused(halo_expand(m, cfg), xx, None, cfg))

    def enc_from_stored(s, xx):
        return jnp.sum(halo_encode_fused(s, xx, None, cfg))

    ms_fwd_master = timeit(jax.jit(enc_from_master), master, x)
    ms_fwd_stored = timeit(jax.jit(enc_from_stored), stored, x)
    ms_bwd_master = timeit(jax.jit(jax.grad(enc_from_master)), master, x)
    ms_bwd_stored = timeit(jax.jit(jax.grad(enc_from_stored)), stored, x)

    print(f"halo_expand fwd            : {ms_expand:7.2f} ms")
    print(f"halo_expand fwd+fold (vjp) : {ms_expand_vjp:7.2f} ms")
    print(f"encode fwd  from master    : {ms_fwd_master:7.2f} ms")
    print(f"encode fwd  from stored    : {ms_fwd_stored:7.2f} ms")
    print(f"encode f+b  from master    : {ms_bwd_master:7.2f} ms")
    print(f"encode f+b  from stored    : {ms_bwd_stored:7.2f} ms")
    print(f"-> expansion overhead fwd  : {ms_fwd_master - ms_fwd_stored:7.2f} ms")
    print(f"-> expansion overhead f+b  : {ms_bwd_master - ms_bwd_stored:7.2f} ms")


if __name__ == "__main__":
    main()
