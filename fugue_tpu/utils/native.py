"""ctypes bindings for the C++ host runtime (csrc/fugue_host.cpp).

The native module is the *independent double-derivation backend* for the
convergence estimators (the role the reference gives its stdlib-only
tests/gen_refs.py script): direct O(n·lag) compensated-sum implementations
of ESS / split-R-hat / quantiles that the test suite cross-validates against
the XLA/FFT implementations, and that host-side tooling can use on large
sample dumps without touching the accelerator.

Built on demand with g++ into the package directory; everything degrades
gracefully to ``None`` when no toolchain is available (pure-Python callers
must check ``available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "fugue_host.cpp",
)
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_fugue_host.so")


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        lib.ft_ess.restype = ctypes.c_double
        lib.ft_ess.argtypes = [dp, ctypes.c_int64]
        lib.ft_ess_batch.restype = None
        lib.ft_ess_batch.argtypes = [dp, ctypes.c_int64, ctypes.c_int64, dp]
        lib.ft_rhat.restype = ctypes.c_double
        lib.ft_rhat.argtypes = [dp, ctypes.c_int64, ctypes.c_int64]
        lib.ft_split_rhat.restype = ctypes.c_double
        lib.ft_split_rhat.argtypes = [dp, ctypes.c_int64, ctypes.c_int64]
        lib.ft_ess_multichain.restype = ctypes.c_double
        lib.ft_ess_multichain.argtypes = [dp, ctypes.c_int64, ctypes.c_int64]
        lib.ft_quantiles.restype = None
        lib.ft_quantiles.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64, dp]
        lib.ft_abi_version.restype = ctypes.c_int
        if lib.ft_abi_version() != 1:
            return None
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _as_c(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float64))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ess(x) -> float:
    lib = _load()
    a = _as_c(x).ravel()
    if lib is None:
        raise RuntimeError("native backend unavailable")
    return float(lib.ft_ess(_ptr(a), a.size))


def ess_batch(x) -> np.ndarray:
    lib = _load()
    a = _as_c(x)
    if a.ndim != 2:
        raise ValueError("expected (m, n)")
    out = np.empty(a.shape[0], dtype=np.float64)
    lib.ft_ess_batch(_ptr(a), a.shape[0], a.shape[1], _ptr(out))
    return out


def ess_multichain(chains) -> float:
    lib = _load()
    a = _as_c(chains)
    if a.ndim != 2:
        raise ValueError("expected (m, n)")
    return float(lib.ft_ess_multichain(_ptr(a), a.shape[0], a.shape[1]))


def r_hat(chains) -> float:
    lib = _load()
    a = _as_c(chains)
    return float(lib.ft_rhat(_ptr(a), a.shape[0], a.shape[1]))


def split_r_hat(chains) -> float:
    lib = _load()
    a = _as_c(chains)
    return float(lib.ft_split_rhat(_ptr(a), a.shape[0], a.shape[1]))


def quantiles(x, qs) -> np.ndarray:
    lib = _load()
    a = _as_c(x).ravel()
    q = _as_c(qs).ravel()
    out = np.empty(q.size, dtype=np.float64)
    lib.ft_quantiles(_ptr(a), a.size, _ptr(q), q.size, _ptr(out))
    return out
