"""ctypes wrapper for the in-repo C++ LAPJV solver, with cost-limit
support via the standard square-matrix extension (behavioral parity with
``lap.lapjv(cost, extend_cost=True, cost_limit=...)`` as used by the
reference at ObjectTracker/byteTrack/matching.py:20-31).

Falls back to ``scipy.optimize.linear_sum_assignment`` on the same
extended matrix if the native build is unavailable — identical optima,
so results only differ on cost ties.
"""
from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

_lib = None
_lib_failed = False


def _native():
    global _lib, _lib_failed
    import os

    if os.environ.get("ADAS_DISABLE_NATIVE_LAPJV"):
        return None
    if _lib is None and not _lib_failed:
        try:
            from .build import load_library

            lib = load_library("lapjv")
            lib.lapjv.restype = ctypes.c_int
            lib.lapjv.argtypes = [
                ctypes.c_int,
                np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def lapjv_square(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Solve a square LAP exactly; returns (rowsol, colsol)."""
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n = cost.shape[0]
    if cost.shape != (n, n):
        raise ValueError(f"square matrix required, got {cost.shape}")
    lib = _native()
    if lib is not None:
        rowsol = np.empty(n, dtype=np.int32)
        colsol = np.empty(n, dtype=np.int32)
        ret = lib.lapjv(n, cost, rowsol, colsol)
        if ret == 0:
            return rowsol, colsol
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(cost)
    rowsol = np.empty(n, dtype=np.int32)
    rowsol[rows] = cols
    colsol = np.empty(n, dtype=np.int32)
    colsol[cols] = rows
    return rowsol, colsol


def lapjv(
    cost: np.ndarray, cost_limit: float = np.inf
) -> Tuple[np.ndarray, np.ndarray]:
    """Rectangular LAP with a cost limit.

    Returns ``(x, y)``: ``x[i]`` is the column matched to row i or -1;
    ``y[j]`` the row matched to column j or -1.  Pairs are only formed
    when profitable against ``cost_limit`` (the lap-package extension
    semantics the reference tracker relies on).
    """
    cost = np.asarray(cost, dtype=np.float64)
    n_rows, n_cols = cost.shape
    if n_rows == 0 or n_cols == 0:
        return (
            np.full(n_rows, -1, dtype=np.int32),
            np.full(n_cols, -1, dtype=np.int32),
        )
    n = n_rows + n_cols
    if np.isfinite(cost_limit):
        ext = np.full((n, n), cost_limit / 2.0, dtype=np.float64)
    else:
        big = cost.max() + 1.0 if cost.size else 1.0
        ext = np.full((n, n), big, dtype=np.float64)
    ext[n_rows:, n_cols:] = 0.0
    ext[:n_rows, :n_cols] = cost
    rowsol, colsol = lapjv_square(ext)

    x = rowsol[:n_rows].astype(np.int32)
    x[x >= n_cols] = -1
    y = colsol[:n_cols].astype(np.int32)
    y[y >= n_rows] = -1
    return x, y
