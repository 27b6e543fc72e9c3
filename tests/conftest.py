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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
