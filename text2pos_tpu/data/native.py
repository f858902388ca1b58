"""ctypes bindings for the native data-prep library (native/t2p_native.cpp).

Loads (and, if needed, builds) ``libt2p_native.so``; every entry point has
a NumPy fallback so the package works without a compiler. The native paths
replace the reference's third-party native kernels (Open3D voxel grid,
sklearn DBSCAN) with first-party C++.
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                       "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libt2p_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return osp.isfile(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not osp.isfile(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.t2p_voxel_downsample.restype = ctypes.c_int64
    lib.t2p_voxel_downsample.argtypes = [f64p, ctypes.c_int64,
                                         ctypes.c_double, i64p]
    lib.t2p_dbscan.restype = None
    lib.t2p_dbscan.argtypes = [f64p, ctypes.c_int64, ctypes.c_double,
                               ctypes.c_int32, i64p]
    lib.t2p_fps.restype = None
    lib.t2p_fps.argtypes = [f64p, ctypes.c_int64, ctypes.c_int64,
                            ctypes.c_int64, i64p]
    _lib = lib
    return _lib


def _as_f64(points: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(points, dtype=np.float64)


def voxel_downsample_indices(points: np.ndarray, voxel_size: float
                             ) -> Optional[np.ndarray]:
    """First-point-per-voxel indices via C++; None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = _as_f64(points)
    n = pts.shape[0]
    out = np.empty(n, np.int64)
    kept = lib.t2p_voxel_downsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, voxel_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return np.sort(out[:kept])


def dbscan_labels(points: np.ndarray, eps: float, min_samples: int
                  ) -> Optional[np.ndarray]:
    """DBSCAN labels via C++; None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = _as_f64(points)
    n = pts.shape[0]
    labels = np.empty(n, np.int64)
    lib.t2p_dbscan(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
                   eps, min_samples,
                   labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return labels


def fps_indices(points: np.ndarray, num_samples: int, start: int = 0
                ) -> Optional[np.ndarray]:
    """Host-side farthest-point sampling via C++; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = _as_f64(points)
    out = np.empty(num_samples, np.int64)
    lib.t2p_fps(pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                pts.shape[0], num_samples, start,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
