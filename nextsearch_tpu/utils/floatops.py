"""Bit-exact float32 libm helpers.

The reference engine computes BM25 IDF with C++ `std::log` on a float
argument — i.e. the platform's `logf` (reference: src/api_engine.cpp:45-47).
NumPy's float32 `np.log` uses its own SIMD polynomial and disagrees with
glibc's logf by 1 ULP on ~20% of inputs (measured), and
float32(log(float64(x))) still disagrees on ~0.5% via double rounding. The
only faithful source is the platform libm itself, so logf_exact calls it
through ctypes — on the unique inputs only, so cost stays per-term, not
per-posting.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_logf = None
try:
    _name = ctypes.util.find_library("m") or "libm.so.6"
    _libm = ctypes.CDLL(_name)
    _libm.logf.restype = ctypes.c_float
    _libm.logf.argtypes = [ctypes.c_float]
    _logf = _libm.logf
except OSError:  # pragma: no cover - no libm (non-POSIX); approximate
    _logf = None


def logf_exact(x: np.ndarray) -> np.ndarray:
    """Elementwise float32 log with the PLATFORM logf's exact rounding.

    Deduplicates inputs first: BM25 idf inputs repeat heavily across terms
    (one per distinct df), so the ctypes overhead is per unique value.
    """
    x = np.ascontiguousarray(x, np.float32)
    if _logf is None:  # pragma: no cover
        return np.float32(np.log(x.astype(np.float64))).astype(np.float32)
    u, inv = np.unique(x, return_inverse=True)
    out = np.fromiter(
        (_logf(ctypes.c_float(float(v))) for v in u),
        np.float32,
        count=u.shape[0],
    )
    return out[inv].reshape(x.shape)


def logf_scalar(x: float) -> np.float32:
    """Platform logf for one float32 value."""
    if _logf is None:  # pragma: no cover
        return np.float32(np.log(np.float64(np.float32(x))))
    return np.float32(_logf(ctypes.c_float(float(np.float32(x)))))
