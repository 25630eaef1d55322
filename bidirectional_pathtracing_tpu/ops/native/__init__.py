"""ctypes bindings for the native (C++) host runtime components.

The shared library is compiled on demand with g++ (no pybind11 needed) and
cached next to this package.  Python/numpy fallbacks exist for every native
entry point, so the renderer works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_native.so")
_SRC = [os.path.join(_HERE, "bvh_builder.cpp")]
_lock = threading.Lock()
_lib = None


def _build_lib():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO] + _SRC
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        newest_src = max(os.path.getmtime(s) for s in _SRC)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
            _build_lib()
        lib = ctypes.CDLL(_SO)
        sig = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bvh_build.restype = ctypes.c_int64
        lib.bvh_build.argtypes = sig
        lib.bvh_build_sah.restype = ctypes.c_int64
        lib.bvh_build_sah.argtypes = sig
        _lib = lib
        return lib


def bvh_build_native(lo: np.ndarray, hi: np.ndarray, max_leaf: int,
                     sah: bool = False):
    """Build a flattened pre-order BVH; see bvh_builder.cpp.  sah=True
    uses the binned surface-area-heuristic split (bvh_build_sah) instead
    of the reference's midpoint split."""
    lib = get_lib()
    n = lo.shape[0]
    cap = 2 * n + 2
    lo = np.ascontiguousarray(lo, np.float64)
    hi = np.ascontiguousarray(hi, np.float64)
    bounds_lo = np.zeros((cap, 3), np.float32)
    bounds_hi = np.zeros((cap, 3), np.float32)
    is_leaf = np.zeros(cap, np.uint8)
    prim_start = np.zeros(cap, np.int32)
    prim_count = np.zeros(cap, np.int32)
    escape = np.zeros(cap, np.int32)
    order = np.zeros(n, np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    fn = lib.bvh_build_sah if sah else lib.bvh_build
    n_nodes = fn(
        p(lo, ctypes.c_double), p(hi, ctypes.c_double),
        ctypes.c_int64(n), ctypes.c_int64(max_leaf),
        p(bounds_lo, ctypes.c_float), p(bounds_hi, ctypes.c_float),
        p(is_leaf, ctypes.c_uint8), p(prim_start, ctypes.c_int32),
        p(prim_count, ctypes.c_int32), p(escape, ctypes.c_int32),
        p(order, ctypes.c_int64))
    if n_nodes <= 0:
        raise RuntimeError("bvh_build failed")
    k = int(n_nodes)
    return (bounds_lo[:k], bounds_hi[:k], is_leaf[:k].astype(bool),
            prim_start[:k], prim_count[:k], escape[:k], order)
