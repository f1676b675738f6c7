"""ctypes binding to the native C++ CPU implementation (csrc/banded_dp.cpp).

This is the measured-CPU-baseline engine (BASELINE.md): a single-core C++
banded Viterbi + local rescoring equivalent in role to the reference's
``nadavca.dtw`` extension. Auto-builds with g++ on first use; falls back to
raising if no toolchain is present (tests skip in that case).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "banded_dp.cpp")


def _build() -> str:
    from ..utils.native_build import build_shared

    return build_shared(_SRC, "banded_dp")


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        so = _build()
        lib = ctypes.CDLL(so)
        lib.banded_viterbi.restype = ctypes.c_int
        lib.banded_viterbi.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.base_loglik_local.restype = ctypes.c_int
        lib.base_loglik_local.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    return _LIB


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def banded_viterbi_cpu(
    x: np.ndarray, mu: np.ndarray, sigma: np.ndarray, lo: np.ndarray,
    band_width: int, log_p_stay: float, log_p_move: float,
    log_p_skip: float = -1e30, use_skip: bool = False,
) -> Tuple[float, np.ndarray]:
    """Single-read banded Viterbi on the native CPU core."""
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float32)
    mu = np.ascontiguousarray(mu, np.float32)
    sigma = np.ascontiguousarray(sigma, np.float32)
    lo = np.ascontiguousarray(lo, np.int32)
    T, N = len(x), len(mu)
    score = ctypes.c_float()
    path = np.empty(T, np.int32)
    rc = lib.banded_viterbi(
        _fptr(x), T, _fptr(mu), _fptr(sigma), N, _iptr(lo), band_width,
        log_p_stay, log_p_move, log_p_skip, int(use_skip),
        ctypes.byref(score), _iptr(path),
    )
    if rc != 0:
        raise RuntimeError(f"banded_viterbi failed rc={rc}")
    return float(score.value), path.astype(np.int64)


def base_loglik_local_cpu(
    x: np.ndarray, codes: np.ndarray, path: np.ndarray,
    level_mean: np.ndarray, level_std: np.ndarray, k: int,
    log_p_stay: float, log_p_move: float, max_window: int = 192,
) -> np.ndarray:
    """Single-read local re-DP rescoring on the native CPU core."""
    lib = get_lib()
    x = np.ascontiguousarray(x, np.float32)
    codes = np.ascontiguousarray(codes, np.int32)
    path = np.ascontiguousarray(path, np.int32)
    lm = np.ascontiguousarray(level_mean, np.float32)
    ls = np.ascontiguousarray(level_std, np.float32)
    L = len(codes)
    out = np.zeros((L, 4), np.float32)
    rc = lib.base_loglik_local(
        _fptr(x), len(x), _iptr(codes), L, _iptr(path), _fptr(lm), _fptr(ls),
        k, log_p_stay, log_p_move, max_window, _fptr(out),
    )
    if rc != 0:
        raise RuntimeError(f"base_loglik_local failed rc={rc}")
    return out
