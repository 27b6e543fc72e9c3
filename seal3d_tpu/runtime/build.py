"""Build-on-demand for the native C++ runtime pieces (ctypes, no pybind11).

Mirrors the reference's JIT extension loading (raymarching/backend.py:33-40
`torch.utils.cpp_extension.load`) with a plain g++ invocation cached next to
the sources."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LOCK = threading.Lock()
_CACHE = {}


def load_library(name: str) -> ctypes.CDLL:
    """Compile (once) and dlopen native/<name>.cpp -> lib<name>.so."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
        lib = os.path.join(_NATIVE_DIR, f"lib{name}.so")
        if (not os.path.exists(lib)
                or os.path.getmtime(lib) < os.path.getmtime(src)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", lib]
            subprocess.run(cmd, check=True, capture_output=True)
        _CACHE[name] = ctypes.CDLL(lib)
        return _CACHE[name]
