"""Native (C++) components, built on demand with g++ and bound via ctypes.

The reference pulls its exact optimal-transport solver from the C++ POT
package (``utils.py:1083``); here the equivalent network solver lives in-tree
(``emd.cpp``) and compiles once per environment.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["emd", "emd_ssp", "have_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libxsdba_emd.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    src = os.path.join(_DIR, "emd.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, src]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(os.path.join(_DIR, "emd.cpp")):
            _build()
        lib = ctypes.CDLL(_SO)
        argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.emd_solve.restype = ctypes.c_int
        lib.emd_solve.argtypes = argtypes
        lib.emd_solve_ssp.restype = ctypes.c_int
        lib.emd_solve_ssp.argtypes = argtypes
        _lib = lib
        return lib


def have_native() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def emd(mu: np.ndarray, nu: np.ndarray, cost: np.ndarray) -> np.ndarray:
    """Exact optimal transport plan between masses mu [n] and nu [m] for the
    given cost matrix [n, m] (analogue of POT ``ot.emd``)."""
    lib = _load()
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    nu = np.ascontiguousarray(nu, dtype=np.float64)
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    # normalize masses to equal totals (reference relies on POT doing this)
    mu = mu / mu.sum()
    nu = nu / nu.sum()
    plan = np.zeros((n, m), dtype=np.float64)
    rc = lib.emd_solve(n, m, mu, nu, cost, plan)
    if rc != 0:
        raise RuntimeError(f"emd_solve failed with code {rc}")
    return plan


def emd_ssp(mu: np.ndarray, nu: np.ndarray, cost: np.ndarray) -> np.ndarray:
    """Exact plan via the successive-shortest-paths solver (the network
    simplex's independent cross-check; slower, kept for validation)."""
    lib = _load()
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    nu = np.ascontiguousarray(nu, dtype=np.float64)
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    mu = mu / mu.sum()
    nu = nu / nu.sum()
    plan = np.zeros((n, m), dtype=np.float64)
    rc = lib.emd_solve_ssp(n, m, mu, nu, cost, plan)
    if rc != 0:
        raise RuntimeError(f"emd_solve_ssp failed with code {rc}")
    return plan
