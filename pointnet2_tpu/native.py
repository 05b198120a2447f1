"""ctypes bindings for the native host runtime (native/libpn2native.so).

The native library implements the label-densification engine (grid KNN +
majority vote + colors) replacing the reference's Open3D-based
InterpolateLabelWithColor C++ op (tf_ops/tf_interpolate.cpp:52-185). If the
.so has not been built (``make -C native``), callers fall back to the
scipy.cKDTree path in ops/densify.py.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = pathlib.Path(__file__).resolve().parent.parent / "native" / "libpn2native.so"
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    makefile = _LIB_PATH.parent / "Makefile"
    if not makefile.exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_LIB_PATH.parent)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _is_stale() -> bool:
    """True when the .so predates densify.cpp (must rebuild, never load)."""
    src = _LIB_PATH.parent / "densify.cpp"
    try:
        return src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    except OSError:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building on first use if needed) the native library, or None.

    The .so is NOT tracked in git — it is always a local build product of
    ``make -C native``. A stale binary (older than densify.cpp) is rebuilt
    before loading so a source edit can never be shadowed by an old .so.
    """
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if (not _LIB_PATH.exists() or _is_stale()) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    i64, i32, u8, f32, f64 = (
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_uint8,
        ctypes.c_float,
        ctypes.c_double,
    )
    P = ctypes.POINTER
    lib.densify_labels.argtypes = [
        P(f32), P(i32), i64, P(f32), i64, ctypes.c_int, f64, P(i32), P(u8)
    ]
    lib.densify_labels.restype = ctypes.c_int
    lib.knn_search.argtypes = [P(f32), i64, P(f32), i64, ctypes.c_int, f64, P(i64), P(f64)]
    lib.knn_search.restype = ctypes.c_int
    lib.voxel_assign.argtypes = [P(f32), i64, f64, f64, f64, f64, i64, i64, P(i64)]
    lib.voxel_assign.restype = ctypes.c_int
    _lib = lib
    return _lib


def _as_c(arr: np.ndarray, dtype, ctype):
    arr = np.ascontiguousarray(arr, dtype=dtype)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctype))


def densify_labels_native(
    sparse_points: np.ndarray,
    sparse_labels: np.ndarray,
    dense_points: np.ndarray,
    knn: int = 3,
    cell: float = 0.0,
):
    """Native KNN majority-vote densification. Returns (labels, colors) or None."""
    lib = get_lib()
    if lib is None:
        return None
    sp, sp_p = _as_c(sparse_points, np.float32, ctypes.c_float)
    sl, sl_p = _as_c(sparse_labels, np.int32, ctypes.c_int32)
    dp, dp_p = _as_c(dense_points, np.float32, ctypes.c_float)
    nd = len(dp)
    out_labels = np.empty(nd, np.int32)
    out_colors = np.empty((nd, 3), np.uint8)
    rc = lib.densify_labels(
        sp_p,
        sl_p,
        len(sp),
        dp_p,
        nd,
        int(knn),
        float(cell),
        out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_colors.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out_labels, out_colors


def knn_search_native(
    data_points: np.ndarray, query_points: np.ndarray, knn: int, cell: float = 0.0
):
    """Native exact kNN. Returns (idx (Q,k) int64, d2 (Q,k) float64) or None."""
    lib = get_lib()
    if lib is None:
        return None
    dp, dp_p = _as_c(data_points, np.float32, ctypes.c_float)
    qp, qp_p = _as_c(query_points, np.float32, ctypes.c_float)
    nq = len(qp)
    out_idx = np.empty((nq, knn), np.int64)
    out_d2 = np.empty((nq, knn), np.float64)
    rc = lib.knn_search(
        dp_p,
        len(dp),
        qp_p,
        nq,
        int(knn),
        float(cell),
        out_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_d2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        return None
    return out_idx, out_d2
