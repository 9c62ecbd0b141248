"""ctypes bindings for the native host kernels (native/tpu_ac_native.cpp).

Provides the host-side replacements for the reference's native deps —
munkres Hungarian assignment and FAISS flat-L2 host search — with
transparent build-on-first-use (g++) and pure-Python/scipy fallbacks when
no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

LOGGER = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtpu_ac_native.so")

_lib: ctypes.CDLL | None = None
_lib_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "tpu_ac_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.exists(_SO_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        LOGGER.warning("native build failed (%s); using python fallbacks", e)
        return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_SO_PATH) and not _build():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        LOGGER.warning("native load failed (%s)", e)
        _lib_failed = True
        return None
    lib.tpu_ac_hungarian.restype = ctypes.c_double
    lib.tpu_ac_hungarian.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32)]
    lib.tpu_ac_knn_l2.restype = None
    lib.tpu_ac_knn_l2.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.tpu_ac_greedy_coreset.restype = None
    lib.tpu_ac_greedy_coreset.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    _lib = lib
    return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def hungarian(cost: np.ndarray) -> tuple[np.ndarray, float]:
    """Min-cost assignment on a square cost matrix.

    Returns (assignment[row] = col, total_cost).  Native O(n^3) JV solver;
    scipy fallback.
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n = cost.shape[0]
    assert cost.shape == (n, n), "cost must be square"
    lib = get_lib()
    if lib is None:
        from scipy.optimize import linear_sum_assignment

        rows, cols = linear_sum_assignment(cost)
        out = np.empty(n, np.int32)
        out[rows] = cols
        return out, float(cost[rows, cols].sum())
    assignment = np.empty(n, np.int32)
    total = lib.tpu_ac_hungarian(_ptr(cost, ctypes.c_double), n,
                                 _ptr(assignment, ctypes.c_int32))
    return assignment, float(total)


def knn_l2(query: np.ndarray, bank: np.ndarray, k: int,
           n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Host exact k-NN (squared L2, ascending) — FAISS IndexFlatL2.search.

    Threaded C++ when available; numpy fallback otherwise.
    """
    query = np.ascontiguousarray(query, np.float32)
    bank = np.ascontiguousarray(bank, np.float32)
    m, d = query.shape
    n = bank.shape[0]
    k = min(k, n)
    lib = get_lib()
    if lib is None:
        d2 = ((query[:, None] - bank[None]) ** 2).sum(-1)
        idx = np.argsort(d2, axis=1)[:, :k]
        return np.take_along_axis(d2, idx, 1).astype(np.float32), \
            idx.astype(np.int32)
    out_d2 = np.empty((m, k), np.float32)
    out_idx = np.empty((m, k), np.int32)
    lib.tpu_ac_knn_l2(_ptr(query, ctypes.c_float), m,
                      _ptr(bank, ctypes.c_float), n, d, k,
                      _ptr(out_d2, ctypes.c_float),
                      _ptr(out_idx, ctypes.c_int32), n_threads)
    return out_d2, out_idx


def greedy_coreset(feats: np.ndarray, init_anchor: np.ndarray,
                   n_select: int, n_threads: int = 0) -> np.ndarray:
    """Host greedy coreset selection (threaded relax step)."""
    feats = np.ascontiguousarray(feats, np.float32)
    anchor = np.ascontiguousarray(init_anchor, np.float32).copy()
    n, d = feats.shape
    lib = get_lib()
    if lib is None:
        selected = np.empty(n_select, np.int32)
        for s in range(n_select):
            best = int(np.argmax(anchor))
            selected[s] = best
            dist = np.sqrt(((feats - feats[best]) ** 2).sum(-1))
            anchor = np.minimum(anchor, dist)
        return selected
    selected = np.empty(n_select, np.int32)
    lib.tpu_ac_greedy_coreset(_ptr(feats, ctypes.c_float), n, d,
                              _ptr(anchor, ctypes.c_float), n_select,
                              _ptr(selected, ctypes.c_int32), n_threads)
    return selected
