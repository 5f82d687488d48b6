"""ctypes binding for the native host runtime (liboptik_host).

The native library is the latency path: single-query FK/Jacobian/IK in a few
microseconds with no device round-trip, mirroring the reference's C ABI +
C++ surface (optik-cpp).  Built on demand with g++ (no external deps); all
entry points raise ``RuntimeError`` if no compiler is available, and callers
(Robot, tests) treat the native path as optional.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = pathlib.Path(__file__).parent / "optik_host.cpp"
_LIB = pathlib.Path(__file__).parent / "liboptik_host.so"
_lock = threading.Lock()
_lib = None


def build(force: bool = False) -> pathlib.Path:
    """Compile liboptik_host.so if missing or stale; returns its path."""
    if (not force and _LIB.exists()
            and _LIB.stat().st_mtime >= _SRC.stat().st_mtime):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_LIB)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = build()
        lib = ctypes.CDLL(str(path))

        dptr = ctypes.POINTER(ctypes.c_double)
        u8ptr = ctypes.POINTER(ctypes.c_uint8)

        lib.optik_host_chain_new.restype = ctypes.c_void_p
        lib.optik_host_chain_new.argtypes = [
            ctypes.c_int, dptr, dptr, dptr, u8ptr, dptr, dptr, dptr, dptr]
        lib.optik_host_chain_free.argtypes = [ctypes.c_void_p]
        lib.optik_host_fk.argtypes = [ctypes.c_void_p, dptr, dptr]
        lib.optik_host_jacobian.argtypes = [ctypes.c_void_p, dptr, dptr]
        lib.optik_host_ik.restype = ctypes.c_int
        lib.optik_host_ik.argtypes = [
            ctypes.c_void_p, dptr, dptr, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64, dptr, dptr]
        _lib = lib
        return lib


def _as_dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class HostChain:
    """Native chain handle with FK / Jacobian / single-solve IK."""

    def __init__(self, spec):
        lib = _load()
        self._lib = lib
        self.n = spec.num_positions
        # Keep the arrays alive for the duration of the C call.
        org_r = np.ascontiguousarray(spec.origin_r, dtype=np.float64)
        org_t = np.ascontiguousarray(spec.origin_t, dtype=np.float64)
        axis = np.ascontiguousarray(spec.axis, dtype=np.float64)
        pris = np.ascontiguousarray(spec.prismatic > 0.5, dtype=np.uint8)
        lower = np.ascontiguousarray(spec.lower, dtype=np.float64)
        upper = np.ascontiguousarray(spec.upper, dtype=np.float64)
        tip_r = np.ascontiguousarray(spec.tip_r, dtype=np.float64)
        tip_t = np.ascontiguousarray(spec.tip_t, dtype=np.float64)
        self._ptr = lib.optik_host_chain_new(
            self.n, _as_dptr(org_r), _as_dptr(org_t), _as_dptr(axis),
            pris.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _as_dptr(lower), _as_dptr(upper), _as_dptr(tip_r),
            _as_dptr(tip_t))

    def __del__(self):
        ptr = getattr(self, "_ptr", None)
        if ptr:
            self._lib.optik_host_chain_free(ptr)
            self._ptr = None

    def fk(self, q) -> np.ndarray:
        q = np.ascontiguousarray(q, dtype=np.float64)
        out = np.empty(16)
        self._lib.optik_host_fk(self._ptr, _as_dptr(q), _as_dptr(out))
        return out.reshape(4, 4)

    def jacobian(self, q) -> np.ndarray:
        q = np.ascontiguousarray(q, dtype=np.float64)
        out = np.empty(6 * self.n)
        self._lib.optik_host_jacobian(self._ptr, _as_dptr(q), _as_dptr(out))
        return out.reshape(6, self.n)

    def ik(self, target, x0, tol_f: float = 1e-6, max_iters: int = 64,
           max_restarts: int = 64, rng_seed: int = 42
           ) -> Optional[Tuple[np.ndarray, float]]:
        target = np.ascontiguousarray(target, dtype=np.float64)
        x0 = np.ascontiguousarray(x0, dtype=np.float64)
        x_out = np.empty(self.n)
        f_out = np.empty(1)
        ok = self._lib.optik_host_ik(
            self._ptr, _as_dptr(target), _as_dptr(x0),
            ctypes.c_double(tol_f), max_iters, max_restarts,
            ctypes.c_uint64(rng_seed), _as_dptr(x_out), _as_dptr(f_out))
        if not ok:
            return None
        return x_out, float(f_out[0])
