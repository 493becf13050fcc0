"""Lazy in-tree builder for the native components.

Compiles ``<name>.cpp`` into ``_lib/lib<name>.so`` with the system g++ the
first time it is needed (or when the source is newer than the binary), then
loads it with ctypes.  No packaging machinery required; mirrors how JAX
itself ships prebuilt XLA while the thin native shims build on demand.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_DIR = os.path.join(_HERE, "_lib")
_LOCK = threading.Lock()
_CACHE = {}


def load_library(name: str) -> ctypes.CDLL:
    """Build (if stale) and load ``lib<name>.so`` from this directory."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_HERE, f"{name}.cpp")
        out = os.path.join(_LIB_DIR, f"lib{name}.so")
        if not os.path.isfile(src):
            raise FileNotFoundError(src)
        if (
            not os.path.isfile(out)
            or os.path.getmtime(out) < os.path.getmtime(src)
        ):
            os.makedirs(_LIB_DIR, exist_ok=True)
            tmp = out + ".tmp"
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-std=c++17", src, "-o", tmp,
                ],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, out)
        lib = ctypes.CDLL(out)
        _CACHE[name] = lib
        return lib
