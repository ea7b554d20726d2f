"""ctypes loader for the native balancing routine.

The reference's only compiled component is a numba-JIT'd balancing routine
called through a host callback (pssgp/kernels/math_utils.py:10-29,68).  Here
the equivalent is a small C library (native/balance.c) used on the HOST for
*concrete* inputs — i.e. at trace time, when kernel hyperparameters are
closure constants and F is a concrete array.  That short-circuits the
unrolled on-device balancing loop (hundreds of eager dispatches per trace)
into one C call.  Traced inputs always take the pure-JAX path
(ops/balance.py), which is what runs under ``jax.grad``.

Builds lazily with the system C compiler on first use; falls back to a
vectorized numpy implementation when no compiler/library is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_SRC_DIR, "libpgpsbalance.so"))
    if not os.path.exists(so):
        src = os.path.abspath(os.path.join(_SRC_DIR, "balance.c"))
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["cc", "-O2", "-fPIC", "-shared", "-o", so, src],
                    check=True,
                    capture_output=True,
                    timeout=60,
                )
            except Exception:
                return None
        else:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.pgps_balance_scale.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.pgps_balance_scale.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _np_balance_scale(F: np.ndarray, iters: int) -> np.ndarray:
    """Numpy fallback with identical semantics."""
    F = F.copy()
    n = F.shape[0]
    d = np.ones(n)
    for _ in range(iters):
        for i in range(n):
            c = np.sqrt(max(np.sum(F[:, i] ** 2) - F[i, i] ** 2, 0.0))
            r = np.sqrt(max(np.sum(F[i, :] ** 2) - F[i, i] ** 2, 0.0))
            if c > 0.0 and r > 0.0:
                f = np.sqrt(r / c)
                d[i] *= f
                F[:, i] *= f
                F[i, :] /= f
    return d


def balance_scale_host(F: np.ndarray, iters: int) -> np.ndarray:
    """Balancing scale vector for a concrete (host) matrix."""
    F = np.ascontiguousarray(F, dtype=np.float64)
    n = F.shape[0]
    lib = _load()
    if lib is None:
        return _np_balance_scale(F, iters)
    scratch = F.copy()
    out = np.empty(n, dtype=np.float64)
    lib.pgps_balance_scale(
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(n),
        ctypes.c_int(iters),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
