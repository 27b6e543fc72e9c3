"""Probe: does JAX's persistent compilation cache work over the axon tunnel?

VERDICT r2 item 2 attributes >=60% of the 345 s bbox-edit wall-clock to
compile/tunnel latency. If the persistent cache serves executables across
processes, every CLI run and probe gets faster for free. This script times
a distinctive jit compile twice in subprocesses sharing one cache dir.

Usage: python scripts/probe_compile_cache.py
"""

import os
import subprocess
import sys
import tempfile
import time

CHILD = r"""
import os, sys, time
import jax, jax.numpy as jnp

cache_dir = sys.argv[1]
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

@jax.jit
def f(x, y):
    # distinctive enough to not be pre-cached
    for _ in range(6):
        x = jnp.tanh(x @ y) + jnp.sin(x) * 0.12345
    return x.sum()

x = jnp.ones((512, 512), jnp.bfloat16)
t0 = time.time()
out = f(x, x)
jax.device_get(out)
print(f"compile+run: {time.time()-t0:.2f}s", flush=True)
"""


def main():
    cache_dir = tempfile.mkdtemp(prefix="jaxcache_probe_")
    for i in range(2):
        t0 = time.time()
        r = subprocess.run([sys.executable, "-u", "-c", CHILD, cache_dir],
                           capture_output=True, text=True, timeout=300)
        print(f"run {i}: wall={time.time()-t0:.2f}s  child: "
              f"{r.stdout.strip()}  rc={r.returncode}", flush=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], flush=True)
            return
    entries = os.listdir(cache_dir)
    print(f"cache entries: {len(entries)}", flush=True)


if __name__ == "__main__":
    main()
