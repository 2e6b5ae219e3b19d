"""Native (C++) host-side routines with lazy compilation + ctypes bindings.

Covers the trace-time constructions the reference natively accelerates
(vandermonde via Numba, ``utils.py:478``) and the combinatorial constructors
whose pure-Python cost explodes with dimension (``n_sum_k``,
``symmetric_set``).  The shared library is built from
:file:`fastcombin.cpp` on first use with the system ``g++`` and cached next
to the source; every entry point has a pure-Python fallback and the bindings
are verified element-for-element against those fallbacks in the test suite.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "n_sum_k", "symmetric_set", "vandermonde"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastcombin.cpp")
_LIB = os.path.join(_HERE, "libfastcombin.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    """Compile (once) and load the shared library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                # compile to a process-unique temp file and rename into place:
                # rename is atomic, so concurrent processes never CDLL a
                # half-written library or truncate an inode another process
                # has already dlopen'ed (the threading lock above only guards
                # within this process)
                tmp = f"{_LIB}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
                    check=True, capture_output=True)
                os.replace(tmp, _LIB)
            lib = ctypes.CDLL(_LIB)
            lib.ssmtpu_n_sum_k.restype = ctypes.c_int64
            lib.ssmtpu_n_sum_k.argtypes = [
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
            lib.ssmtpu_symmetric_set.restype = ctypes.c_int64
            lib.ssmtpu_symmetric_set.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
            lib.ssmtpu_vandermonde.restype = None
            lib.ssmtpu_vandermonde.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def n_sum_k(n: int, k: int):
    """Native ``n_sum_k``; returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    # two calls (count, then fill): the column count follows the reference's
    # quirky recursion (``utils.py:459-475``), NOT the stars-and-bars
    # binomial, so it cannot be precomputed in closed form.  Both calls are
    # trace-time-only (the result is a static constant of the compiled
    # program), so the doubled enumeration is irrelevant in practice.
    count = lib.ssmtpu_n_sum_k(n, k, None, 0)
    out = np.zeros((n, count), dtype=np.int64)
    lib.ssmtpu_n_sum_k(n, k, _i64p(out), count)
    return out


def symmetric_set(dim: int, gen):
    """Native fully-symmetric point set; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    gen = np.ascontiguousarray(np.asarray(gen, dtype=np.float64).ravel())
    count = lib.ssmtpu_symmetric_set(dim, _f64p(gen), gen.size, None, 0)
    out = np.zeros((dim, count), dtype=np.float64)
    lib.ssmtpu_symmetric_set(dim, _f64p(gen), gen.size, _f64p(out), count)
    return out


def vandermonde(mul_ind, x):
    """Native Vandermonde matrix; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    mul_ind = np.ascontiguousarray(np.asarray(mul_ind, dtype=np.int64))
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
    d, q = mul_ind.shape
    n = x.shape[1]
    out = np.zeros((n, q), dtype=np.float64)
    lib.ssmtpu_vandermonde(_i64p(mul_ind), d, q, _f64p(x), n, _f64p(out))
    return out
