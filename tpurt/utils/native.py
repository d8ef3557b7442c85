"""ctypes loader for the native C++ runtime pieces (native/libtpurt_native.so).

The reference's host layer is native Rust (ref: src/instance.rs); ours is a
small C++ library for the two host-side hot paths — BVH construction and OBJ
parsing — loaded via ctypes (no pybind11 in this environment). Pure-NumPy
implementations remain the reference semantics and the fallback when the
shared library hasn't been built (`make -C native`); tests assert the two
produce identical output.

Set TPURT_NO_NATIVE=1 to force the NumPy paths.
"""

from __future__ import annotations

import ctypes
import os
import pathlib

import numpy as np

_LIB = None
_TRIED = False


def _find_so():
    here = pathlib.Path(__file__).resolve()
    for base in (here.parents[2], pathlib.Path.cwd()):
        cand = base / "native" / "libtpurt_native.so"
        if cand.exists():
            return str(cand)
    return None


def load():
    """Returns the loaded CDLL or None (missing/disabled). The
    TPURT_NO_NATIVE check is per-call so tests can toggle it at runtime."""
    global _LIB, _TRIED
    if os.environ.get("TPURT_NO_NATIVE"):
        return None
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_so()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    i64 = ctypes.c_int64
    lib.tpurt_build_bvh.restype = ctypes.c_int
    lib.tpurt_build_bvh.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, i64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, i64,
    ]
    try:  # absent from a stale .so built before the SAH entry point
        lib.tpurt_build_bvh_sah.restype = ctypes.c_int
        lib.tpurt_build_bvh_sah.argtypes = lib.tpurt_build_bvh.argtypes
    except AttributeError:
        pass
    lib.tpurt_obj_open.restype = ctypes.c_void_p
    lib.tpurt_obj_open.argtypes = [ctypes.c_char_p]
    lib.tpurt_obj_counts.restype = None
    lib.tpurt_obj_counts.argtypes = [ctypes.c_void_p, ctypes.POINTER(i64),
                                     ctypes.POINTER(i64)]
    lib.tpurt_obj_fill.restype = None
    lib.tpurt_obj_fill.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_void_p]
    lib.tpurt_obj_close.restype = None
    lib.tpurt_obj_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def build_bvh_native(tri_min: np.ndarray, tri_max: np.ndarray,
                     max_prims: int, sah: bool = False):
    """Native BVH build; returns the same tuple layout as accel.build_bvh
    or None if the library is unavailable. sah=True calls the binned-SAH
    builder (bit-identical to accel._build_bvh_py(sah=True))."""
    lib = load()
    if lib is None:
        return None
    if sah and not hasattr(lib, "tpurt_build_bvh_sah"):
        return None  # stale .so predating the SAH entry point
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    T = tri_min.shape[0]
    max_nodes = max(2 * T + 1, 1)
    bbox_min = np.zeros((max_nodes, 3), np.float32)
    bbox_max = np.zeros((max_nodes, 3), np.float32)
    left = np.zeros((max_nodes,), np.int32)
    right = np.zeros((max_nodes,), np.int32)
    first = np.zeros((max_nodes,), np.int32)
    count = np.zeros((max_nodes,), np.int32)
    order = np.zeros((max(T, 1),), np.int32)
    fn = lib.tpurt_build_bvh_sah if sah else lib.tpurt_build_bvh
    n = fn(
        _ptr(tri_min), _ptr(tri_max), T, int(max_prims),
        _ptr(bbox_min), _ptr(bbox_max), _ptr(left), _ptr(right),
        _ptr(first), _ptr(count), _ptr(order), max_nodes)
    if n < 0:
        return None
    return (bbox_min[:n].copy(), bbox_max[:n].copy(), left[:n].copy(),
            right[:n].copy(), first[:n].copy(), count[:n].copy(),
            order[:T].copy())


def parse_obj_native(path: str):
    """Native OBJ parse; returns (positions, indices) or None."""
    lib = load()
    if lib is None:
        return None
    h = lib.tpurt_obj_open(str(path).encode())
    if not h:
        return None
    try:
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        lib.tpurt_obj_counts(h, ctypes.byref(nv), ctypes.byref(nt))
        positions = np.zeros((nv.value, 3), np.float32)
        indices = np.zeros((nt.value, 3), np.int32)
        if nv.value or nt.value:
            lib.tpurt_obj_fill(h, _ptr(positions), _ptr(indices))
    finally:
        lib.tpurt_obj_close(h)
    return positions, indices
