"""Micro-benchmark of hash-encode gather strategies on the real TPU.

The round-2 profile (scripts/profile_step.py) showed the fused one-hot
encoder is 86% of the train step; this script measures the design
alternatives at the recipe operating point (M=196608 samples, L=16, F=4
stacked dual grid) so kernel work targets the right one:

  pallas@14   current fused one-hot kernel, T=2^14
  xla@14/19   jnp.take gather backend at both table sizes
  take-raw    the bare fused [M*L*8] jnp.take (no index math)
  lane-gather pltpu take_along_axis probe (is the 128-wide row gather real?)

Usage: python scripts/bench_encode.py [--m 196608]
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
    """block_until_ready lies over the axon tunnel; a device_get of one
    element is the only reliable completion barrier (device ops run in
    dispatch order, so syncing the last output syncs the queue)."""
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=10, warmup=2):
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
    ap.add_argument("--m", type=int, default=196608)
    args = ap.parse_args()
    m = args.m

    from seal3d_tpu.ops.hashgrid import (HashGridConfig, hashgrid_encode,
                                         hashgrid_init)

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (m, 3))
    print(f"device={jax.devices()[0]} M={m}", file=sys.stderr)
    results = {}

    for backend, log2t in (("pallas", 14), ("xla", 14), ("xla", 19)):
        cfg = HashGridConfig(log2_hashmap_size=log2t, backend=backend)
        # stacked dual grid = F=4 fused table
        tab = jnp.concatenate(
            [hashgrid_init(jax.random.PRNGKey(i), cfg) for i in range(2)], -1)
        name = f"{backend}@{log2t}"
        fwd = jax.jit(lambda t, xx, c=cfg: hashgrid_encode(t, xx, c))
        results[f"{name} fwd"] = timeit(fwd, tab, x)

        def loss(t, xx, c=cfg):
            return hashgrid_encode(t, xx, c).sum()

        results[f"{name} fwd+bwd"] = timeit(jax.jit(jax.grad(loss)), tab, x)

    # Raw fused take: 25.2M row gathers of width 4 from the full level stack.
    n_idx = m * 16 * 8
    big_tab = jax.random.normal(key, (2**19, 4))
    idx = jax.random.randint(key, (n_idx,), 0, 2**19)
    results["raw take 25.2M rows w4 from 2^19"] = timeit(
        jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(0)), big_tab, idx)
    idx14 = jax.random.randint(key, (n_idx,), 0, 2**14)
    small_tab = jax.random.normal(key, (2**14, 4))
    results["raw take 25.2M rows w4 from 2^14"] = timeit(
        jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(0)), small_tab, idx14)
    # and the scatter transpose (the backward)
    g = jax.random.normal(key, (n_idx, 4))
    results["raw scatter-add 25.2M rows w4 to 2^19"] = timeit(
        jax.jit(lambda gg, i: jnp.zeros((2**19, 4)).at[i].add(gg)), g, idx)
    # row-block gather: 128-wide rows (is take bandwidth-bound or row-bound?)
    rows_tab = jax.random.normal(key, (2**12, 128))
    ridx = jax.random.randint(key, (n_idx // 8,), 0, 2**12)  # per (s,l): 1 block
    results["take 3.15M rows w128 from 4096"] = timeit(
        jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(0)), rows_tab, ridx)

    # lane gather probe: take_along_axis on 128-wide rows inside pallas
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def lane_kernel(rows_ref, lo_ref, out_ref):
        rows = rows_ref[:]          # [R, 128]
        lo = lo_ref[:]              # [R, 128] broadcast lane index
        # Mosaic gather lowering wants indices shaped in.shape + (1,)
        out_ref[:] = jnp.take_along_axis(rows, lo[..., None], axis=1)[..., 0]

    r = 8192
    rows = jax.random.normal(key, (r, 128))
    lo = jax.random.randint(key, (r, 1), 0, 128)
    lo = jnp.broadcast_to(lo, (r, 128))

    def lane_gather(rows, lo):
        return pl.pallas_call(
            lane_kernel,
            out_shape=jax.ShapeDtypeStruct((r, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(rows, lo)

    try:
        results[f"pallas lane-gather {r} rows"] = timeit(
            jax.jit(lane_gather), rows, lo)
    except Exception:
        import traceback

        results[f"pallas lane-gather {r} rows"] = float("nan")
        traceback.print_exc()

    print(f"\n{'variant':44s} {'ms':>8s}")
    for k, v in results.items():
        print(f"{k:44s} {v:8.2f}")


if __name__ == "__main__":
    main()
