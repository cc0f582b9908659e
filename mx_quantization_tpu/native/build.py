"""Lazy g++ build + ctypes load for the native components."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_LOCK = threading.Lock()
_CACHE = {}


def build_and_load(name: str, sources, libs=()) -> ctypes.CDLL:
    """Compile ``sources`` into lib<name>.so (if stale) and dlopen it."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        so = os.path.join(_DIR, f"lib{name}.so")
        srcs = [os.path.join(_DIR, s) for s in sources]
        stale = (not os.path.exists(so) or
                 any(os.path.getmtime(s) > os.path.getmtime(so)
                     for s in srcs))
        if stale:
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   *srcs, "-o", so, "-lpthread"]
            cmd += [f"-l{l}" for l in libs]
            subprocess.run(cmd, check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        _CACHE[name] = lib
        return lib
