"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the TPU plugin at
interpreter start (before conftest), so env-var routing is too late; we must
flip the platform via jax.config. XLA_FLAGS is still read lazily at first
backend init, so setting it here works as long as no test touched a device
before conftest import (pytest imports conftest first).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for the fast lane. The suite is eager-op
# COMPILE bound (a 24x24 render's first eager call is ~11 s of per-op
# compiles, the second 0.0 s), and the in-process op cache resets every
# pytest run; persisting it makes warm runs 2.4x faster (test_render_paths
# measured 230 s cold -> 97 s warm). min_compile_time=0 is required — the
# individual eager ops each compile in <1 s. Same-box only by layout
# (~/.cache), which is also what makes CPU AOT reload safe here.
# SEAL3D_NO_CACHE=1 opts out (e.g. when bisecting a compiler issue).
if not os.environ.get("SEAL3D_NO_CACHE"):
    _cache = os.path.join(os.path.expanduser("~"), ".cache", "seal3d_tpu",
                          "xla-cpu-tests")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
