"""ctypes bindings for the native (C++) runtime components.

The native layer mirrors the reference's use of C++ for its
performance-critical host-side runtime (scene/BVH building,
reference: externals/bvh.h + src/core/accel.h).  Everything has a pure
numpy fallback; the native path is used automatically when
libbpt_native.so has been built (`make -C bpt_tpu/native`).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libbpt_native.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.bpt_bvh_build.restype = ctypes.c_int64
    lib.bpt_bvh_build.argtypes = [ctypes.c_int64, f32p, f32p, f32p]
    lib.bpt_bvh_export.restype = None
    lib.bpt_bvh_export.argtypes = [f32p, f32p, i32p, i32p, i32p, i32p]
    lib.bpt_bvh_free.restype = None
    lib.bpt_bvh_free.argtypes = []
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def build_bvh_native(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    """Native BVH build; returns the same FlatBVH as accel.build.build_bvh
    or None when the library is not built."""
    lib = _load()
    if lib is None:
        return None
    from ..accel.build import FlatBVH

    t = len(v0)
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    n = int(lib.bpt_bvh_build(t, v0, v1, v2))
    bmin = np.empty((n, 3), np.float32)
    bmax = np.empty((n, 3), np.float32)
    miss = np.empty(n, np.int32)
    start = np.empty(n, np.int32)
    count = np.empty(n, np.int32)
    prim_order = np.empty(t, np.int32)
    lib.bpt_bvh_export(bmin, bmax, miss, start, count, prim_order)
    lib.bpt_bvh_free()
    return FlatBVH(bmin=bmin, bmax=bmax, miss=miss, start=start,
                   count=count, prim_order=prim_order)
