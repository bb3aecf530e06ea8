"""ctypes bindings to librt_native.so (built from native/rt_native.cpp by
``make native`` or lazily on first use). Every entry point has a pure-Python
fallback at its call site; this module only reports availability and wraps
the raw C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "rt_native.cpp")
_LIB_PATH = os.path.join(_HERE, "librt_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB_PATH, "-lz"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # without zlib
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-DRT_NO_ZLIB",
                 _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.rt_bvh_build.restype = ctypes.c_int
        lib.rt_bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
        ]
        lib.rt_write_png.restype = ctypes.c_int
        lib.rt_write_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def write_png(path: str, rgb8: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    h, w, _ = rgb8.shape
    buf = np.ascontiguousarray(rgb8, np.uint8)
    rc = lib.rt_write_png(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), w, h)
    return rc == 0


def bvh_build(prim_min: np.ndarray, prim_max: np.ndarray, leaf_size: int = 4):
    """SAH/median BVH build over primitive AABBs. Returns flat node arrays
    (node_min, node_max, left, right, is_leaf, order) or None if the native
    library is unavailable.

    Layout contract (shared with the Python fallback in ops/bvh.py):
    - interior: left/right are child node ids, is_leaf=0
    - leaf: left = first index into ``order``, right = prim count, is_leaf=1
    """
    lib = _load()
    if lib is None:
        return None
    n = prim_min.shape[0]
    max_nodes = max(1, 2 * n)
    node_min = np.zeros((max_nodes, 3), np.float32)
    node_max = np.zeros((max_nodes, 3), np.float32)
    left = np.zeros((max_nodes,), np.int32)
    right = np.zeros((max_nodes,), np.int32)
    is_leaf = np.zeros((max_nodes,), np.int32)
    order = np.zeros((n,), np.int32)
    pmin = np.ascontiguousarray(prim_min, np.float32)
    pmax = np.ascontiguousarray(prim_max, np.float32)
    n_nodes = lib.rt_bvh_build(
        pmin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        node_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        node_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        left.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        is_leaf.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        leaf_size)
    if n_nodes <= 0:
        return None
    k = n_nodes
    return (node_min[:k], node_max[:k], left[:k], right[:k],
            is_leaf[:k].astype(bool), order)
