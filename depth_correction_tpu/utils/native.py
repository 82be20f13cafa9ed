"""ctypes bindings for the native host runtime (native/dc_native.cpp).

Builds the shared library on first use (g++, cached beside the source) and
exposes numpy-friendly wrappers: voxel-grid subsample and KD-tree kNN /
radius queries — the C++ replacements for the reference's scipy/PCL host
dependencies (SURVEY.md section 2.4).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["available", "voxel_grid", "KDTree"]

_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_SRC = os.path.join(_NATIVE_DIR, "dc_native.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libdcnative.so")

_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return getattr(e, "stderr", b"").decode() if hasattr(e, "stderr") else str(e)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        # A shipped prebuilt .so without the C++ source is usable as-is.
        src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else None
        if not os.path.exists(_LIB) or (
            src_mtime is not None and os.path.getmtime(_LIB) < src_mtime
        ):
            _build_error = _build()
            if _build_error is not None:
                return None
        lib = ctypes.CDLL(_LIB)
        lib.dc_voxel_grid.restype = ctypes.c_int64
        lib.dc_voxel_grid.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.dc_kdtree_build.restype = ctypes.c_void_p
        lib.dc_kdtree_build.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.dc_kdtree_free.argtypes = [ctypes.c_void_p]
        lib.dc_kdtree_knn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_double, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.dc_kdtree_radius.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def voxel_grid(points: np.ndarray, res: float, rank: Optional[np.ndarray] = None,
               seed: int = 135) -> np.ndarray:
    """Indices of one point per voxel (smallest rank wins).

    Default rank is a seeded permutation — identical semantics to the Python
    path's keep='random' (filters.py reference: 24-82).
    """
    lib = _load()
    assert lib is not None, "native library unavailable: %s" % _build_error
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = len(pts)
    if rank is None:
        rank = np.random.default_rng(seed).permutation(n)
    rank = np.ascontiguousarray(rank, dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    m = lib.dc_voxel_grid(_ptr(pts), n, float(res), _ptr(rank), _ptr(out))
    return out[:m].copy()


class KDTree:
    """Median-split KD-tree over (N, 3) points."""

    def __init__(self, points: np.ndarray):
        self._lib = _load()
        assert self._lib is not None, "native library unavailable: %s" % _build_error
        self._pts = np.ascontiguousarray(points, dtype=np.float64)
        self._handle = self._lib.dc_kdtree_build(_ptr(self._pts), len(self._pts))

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.dc_kdtree_free(self._handle)
            self._handle = None

    def query(self, queries: np.ndarray, k: int = 1,
              distance_upper_bound: float = -1.0) -> Tuple[np.ndarray, np.ndarray]:
        """kNN: (dist (Q, k), idx (Q, k) with -1 padding), ascending."""
        q = np.ascontiguousarray(queries, dtype=np.float64)
        nq = len(q)
        idx = np.empty((nq, k), dtype=np.int64)
        dist = np.empty((nq, k), dtype=np.float64)
        self._lib.dc_kdtree_knn(
            self._handle, _ptr(q), nq, int(k), float(distance_upper_bound),
            _ptr(idx), _ptr(dist),
        )
        return dist, idx

    def query_ball(self, queries: np.ndarray, r: float, k_max: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Radius search: (idx (Q, k_max) -1-padded sorted by distance,
        counts (Q,) true neighbor counts)."""
        q = np.ascontiguousarray(queries, dtype=np.float64)
        nq = len(q)
        idx = np.empty((nq, k_max), dtype=np.int64)
        counts = np.empty(nq, dtype=np.int64)
        self._lib.dc_kdtree_radius(
            self._handle, _ptr(q), nq, float(r), int(k_max), _ptr(idx), _ptr(counts)
        )
        return idx, counts
