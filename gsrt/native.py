"""ctypes bindings for the native host-runtime library (native/gsrt_native.cpp).

Builds the shared library on first use (g++ available in the image); all
callers fall back to the pure-JAX/NumPy implementations when the toolchain
or library is unavailable, so the framework stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgsrt_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        src = os.path.join(_NATIVE_DIR, "gsrt_native.cpp")
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", _NATIVE_DIR, "libgsrt_native.so"],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gsrt_build_lbvh.restype = ctypes.c_int
        lib.gsrt_parse_ply_rows.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def build_lbvh_native(aabb_min: np.ndarray, aabb_max: np.ndarray):
    """Host LBVH build; returns dict of arrays matching gsrt.ops.bvh.LBVH.
    None if the native library is unavailable."""
    lib = _ensure_built()
    if lib is None:
        return None
    n = aabb_min.shape[0]
    amin = np.ascontiguousarray(aabb_min, np.float32)
    amax = np.ascontiguousarray(aabb_max, np.float32)
    left = np.empty(n - 1, np.int32)
    right = np.empty(n - 1, np.int32)
    lleaf = np.empty(n - 1, np.uint8)
    rleaf = np.empty(n - 1, np.uint8)
    nmin = np.empty((n - 1, 3), np.float32)
    nmax = np.empty((n - 1, 3), np.float32)
    lprim = np.empty(n, np.int32)
    lmin = np.empty((n, 3), np.float32)
    lmax = np.empty((n, 3), np.float32)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    rc = lib.gsrt_build_lbvh(p(amin), p(amax), ctypes.c_int(n),
                             p(left), p(right), p(lleaf), p(rleaf),
                             p(nmin), p(nmax), p(lprim), p(lmin), p(lmax))
    if rc != 0:
        return None
    return dict(left=left, right=right,
                left_leaf=lleaf.astype(bool), right_leaf=rleaf.astype(bool),
                node_min=nmin, node_max=nmax,
                leaf_prim=lprim, leaf_min=lmin, leaf_max=lmax)


def parse_ply_rows_native(raw: bytes, n: int, stride_f: int, off_xyz: int,
                          off_dc: int, off_rest: int, n_rest: int,
                          off_opacity: int, off_scale: int, off_rot: int,
                          K: int):
    """Native splat-PLY row decode; None if unavailable."""
    lib = _ensure_built()
    if lib is None:
        return None
    means = np.empty((n, 3), np.float32)
    sh = np.zeros((n, K, 3), np.float32)
    opacity = np.empty(n, np.float32)
    scales = np.empty((n, 3), np.float32)
    quats = np.empty((n, 4), np.float32)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    rc = lib.gsrt_parse_ply_rows(
        ctypes.c_char_p(raw), ctypes.c_longlong(n), ctypes.c_int(stride_f),
        ctypes.c_int(off_xyz), ctypes.c_int(off_dc), ctypes.c_int(off_rest),
        ctypes.c_int(n_rest), ctypes.c_int(off_opacity),
        ctypes.c_int(off_scale), ctypes.c_int(off_rot), ctypes.c_int(K),
        p(means), p(sh), p(opacity), p(scales), p(quats))
    if rc != 0:
        return None
    return means, sh, opacity, scales, quats
