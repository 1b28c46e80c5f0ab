"""ctypes binding for the native C++ BVH builder (csrc/bvh_builder.cpp).

The reference's performance-critical host component is its multicore BVH
build (/root/reference/src/bvh.rs:142, `BVHf::build_par`). Our equivalent is a
C++ binned-SAH builder compiled to a shared library; this module loads it and
adapts it to :class:`~gpu_raytracer_tpu.models.bvh.BvhBuildResult`. Returns
``None`` when the library is unavailable so callers fall back to NumPy.
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
    path = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libbvh_builder.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,   # vertices, V
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,  # indices, T
        ctypes.c_int32,                                    # leaf_size
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),  # node_min/max out
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),  # left/right out
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),  # start/count out
        ctypes.POINTER(ctypes.c_int64),                    # tri_order out
        ctypes.POINTER(ctypes.c_int32),                    # max_depth out
    ]
    lib.bvh_build.restype = ctypes.c_int64  # number of nodes, <0 on error
    _LIB = lib
    return _LIB


def build_bvh_native(vertices: np.ndarray, indices: np.ndarray, leaf_size: int):
    lib = _load()
    if lib is None:
        return None
    from .bvh import BvhBuildResult

    vertices = np.ascontiguousarray(vertices, np.float32)
    indices = np.ascontiguousarray(indices, np.uint32)
    T = indices.shape[0]
    cap = max(2 * T + 2, 16)
    node_min = np.zeros((cap, 3), np.float32)
    node_max = np.zeros((cap, 3), np.float32)
    left = np.zeros(cap, np.int32)
    right = np.zeros(cap, np.int32)
    start = np.zeros(cap, np.int32)
    count = np.zeros(cap, np.int32)
    order = np.zeros(T, np.int64)
    depth = np.zeros(1, np.int32)

    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    n = lib.bvh_build(
        p(vertices, ctypes.c_float), vertices.shape[0],
        p(indices, ctypes.c_uint32), T, leaf_size,
        p(node_min, ctypes.c_float), p(node_max, ctypes.c_float),
        p(left, ctypes.c_int32), p(right, ctypes.c_int32),
        p(start, ctypes.c_int32), p(count, ctypes.c_int32),
        p(order, ctypes.c_int64), p(depth, ctypes.c_int32),
    )
    if n < 0:
        return None
    n = int(n)
    return BvhBuildResult(
        node_min[:n].copy(), node_max[:n].copy(), left[:n].copy(),
        right[:n].copy(), start[:n].copy(), count[:n].copy(),
        order, int(depth[0]),
    )


def collapse4_native(left, right, tri_start, tri_count, node_min, node_max,
                     width: int = 4):
    """Native wide collapse (csrc bvh_collapse_wide) → same tuple as
    models/bvh.py::collapse4, or None when the library is unavailable
    (or predates the width-parametric symbol for width != 4)."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "bvh_collapse_wide"):
        return None  # stale .so: Python fallback handles any width
    if not hasattr(lib, "_collapse_wide_ready"):
        lib.bvh_collapse_wide.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.bvh_collapse_wide.restype = ctypes.c_int64
        lib._collapse_wide_ready = True

    left = np.ascontiguousarray(left, np.int32)
    right = np.ascontiguousarray(right, np.int32)
    tri_start = np.ascontiguousarray(tri_start, np.int32)
    tri_count = np.ascontiguousarray(tri_count, np.int32)
    node_min = np.ascontiguousarray(node_min, np.float32)
    node_max = np.ascontiguousarray(node_max, np.float32)
    n = left.shape[0]
    q_child = np.empty((n, width), np.int32)
    q_leafc = np.empty((n, width), np.int32)
    q_min = np.empty((n, width, 3), np.float32)
    q_max = np.empty((n, width, 3), np.float32)
    q_axis = np.empty(n, np.int32)
    q_src = np.empty((n, width), np.int32)

    i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    f32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    q = lib.bvh_collapse_wide(i32p(left), i32p(right), i32p(tri_start),
                              i32p(tri_count), f32p(node_min), f32p(node_max),
                              n, width, i32p(q_child), i32p(q_leafc),
                              f32p(q_min), f32p(q_max), i32p(q_axis),
                              i32p(q_src))
    if q <= 0:
        return None
    return (q_child[:q], q_leafc[:q], q_min[:q], q_max[:q], q_axis[:q],
            q_src[:q])
