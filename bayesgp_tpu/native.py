"""ctypes bindings for the C++ host-side build kernels (native/).

Loaded lazily; every caller has a NumPy fallback, so the framework works
without the compiled library (`make -C native` builds it).
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
    path = os.path.join(os.path.dirname(__file__), "..", "native",
                        "libbayesgp_native.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    lib.osp_local_poly.argtypes = [dp, i64, dp, i64, i64, dp]
    lib.banded_gram.argtypes = [dp, ip, i64, i64, i64, dp, dp]
    lib.banded_cross.argtypes = [dp, ip, i64, i64, i64, dp, i64, dp, dp]
    lib.banded_symv.argtypes = [dp, i64, i64, dp, i64, dp]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def osp_local_poly(knots, x, p: int):
    """(len(x), len(knots)-1) O-spline design (native)."""
    lib = _load()
    knots = np.ascontiguousarray(knots, np.float64)
    x = np.ascontiguousarray(x, np.float64)
    out = np.zeros((len(x), len(knots) - 1))
    lib.osp_local_poly(_dptr(knots), len(knots), _dptr(x), len(x), p,
                       _dptr(out))
    return out


def banded_gram(vals, start, d: int, w=None):
    """(nnz, d) lower band of B' diag(w) B from sparse rows (native)."""
    lib = _load()
    vals = np.ascontiguousarray(vals, np.float64)
    start = np.ascontiguousarray(start, np.int64)
    n, nnz = vals.shape
    w = np.ones(n) if w is None else np.ascontiguousarray(w, np.float64)
    band = np.zeros((nnz, d))
    lib.banded_gram(_dptr(vals), _iptr(start), n, nnz, d, _dptr(w),
                    _dptr(band))
    return band


def banded_cross(vals, start, d: int, X, w=None):
    """(d, q) = B' diag(w) X from sparse rows (native)."""
    lib = _load()
    vals = np.ascontiguousarray(vals, np.float64)
    start = np.ascontiguousarray(start, np.int64)
    X = np.ascontiguousarray(X, np.float64)
    n, nnz = vals.shape
    q = X.shape[1]
    w = np.ones(n) if w is None else np.ascontiguousarray(w, np.float64)
    out = np.zeros((d, q))
    lib.banded_cross(_dptr(vals), _iptr(start), n, nnz, d, _dptr(X), q,
                     _dptr(w), _dptr(out))
    return out


def banded_symv(band, X):
    """P @ X for symmetric-banded P (lower storage band[o, j] = P[j+o, j])."""
    lib = _load()
    band = np.ascontiguousarray(band, np.float64)
    X = np.ascontiguousarray(X, np.float64)
    bwp1, d = band.shape
    squeeze = X.ndim == 1
    if squeeze:
        X = X[:, None]
    out = np.zeros_like(X)
    lib.banded_symv(_dptr(band), bwp1 - 1, d, _dptr(X), X.shape[1],
                    _dptr(out))
    return out[:, 0] if squeeze else out
