"""Tunnel characterization: transfer bandwidth, dispatch latency, eager-op
cost, and persistent-compile-cache hit latency on the axon TPU relay.

These numbers decide how the seal pretrain pipeline should be structured
(host-side numpy vs device-resident) and whether the JAX persistent
compilation cache can cut the bbox-edit wall clock (VERDICT r2 item 2).

Run twice to see the cache effect:
  timeout 590 python -u scripts/probe_tunnel.py 2>/dev/null
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = "/root/repo/.jax_cache_probe"

import jax

jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def _sync(x):
    jax.device_get(jnp.ravel(jax.tree.leaves(x)[0])[0])


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # 1. host->device transfer bandwidth (48 MB, the size of a 4M-point shell)
    host = np.random.rand(4_000_000, 3).astype(np.float32)
    t0 = time.time()
    d = jax.device_put(host)
    _sync(d)
    t = time.time() - t0
    print(f"h2d 48MB: {t*1e3:.0f} ms ({48/t:.0f} MB/s)", flush=True)

    # 2. device->host
    t0 = time.time()
    back = jax.device_get(d)
    t = time.time() - t0
    print(f"d2h 48MB: {t*1e3:.0f} ms ({48/t:.0f} MB/s)", flush=True)

    # 3. small-dispatch latency: 50 sequential tiny jitted calls w/ data dep
    f = jax.jit(lambda x: x * 1.0001 + 0.1)
    x = jnp.ones((128,))
    x = f(x)
    _sync(x)
    t0 = time.time()
    for _ in range(50):
        x = f(x)
    _sync(x)
    print(f"dispatch chain x50: {(time.time()-t0)/50*1e3:.2f} ms/call", flush=True)

    # 4. eager-op grid generation on device (the init_pretraining question)
    t0 = time.time()
    ax = [jnp.linspace(-0.5, 0.5, n) for n in (158, 158, 158)]
    g = jnp.stack(jnp.meshgrid(*ax, indexing="ij"), -1).reshape(-1, 3)
    _sync(g)
    print(f"eager 158^3 meshgrid on device: {(time.time()-t0)*1e3:.0f} ms",
          flush=True)

    # 5. compile-cache: a distinctive program; run the script twice and
    #    compare. Entry presence is printed either way.
    @jax.jit
    def probe_fn(a, b):
        for _ in range(5):
            a = jnp.tanh(a @ b) + jnp.cos(a) * 0.3219
        return a.sum()

    a = jnp.ones((384, 384), jnp.bfloat16)
    t0 = time.time()
    out = probe_fn(a, a)
    _sync(out)
    print(f"probe_fn compile+run: {time.time()-t0:.1f} s", flush=True)
    ents = [e for e in os.listdir(CACHE_DIR)] if os.path.isdir(CACHE_DIR) else []
    print(f"cache entries now: {len(ents)}", flush=True)


if __name__ == "__main__":
    main()
