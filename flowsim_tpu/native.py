"""ctypes bindings for the native C runtime components (native/flowsim_native.c).

The shared library is built on demand with the system compiler; every entry
point has a NumPy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "flowsim_native.c")
_LIB = os.path.join(_REPO_ROOT, "native", "libflowsim_native.so")

_lib = None
_load_error = None


def _build() -> None:
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC, "-lm"]
    subprocess.run(cmd, check=True, capture_output=True)


def load(build_if_missing: bool = True):
    """Load (building if needed) the native library; None on failure.
    A failure is cached — without this, every geometry build on a
    toolchain-less machine would re-spawn a failing compiler subprocess."""
    global _lib, _load_error
    if _lib is not None:
        return _lib
    if _load_error is not None:
        return None
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not build_if_missing:
                return None
            _build()
        lib = ctypes.CDLL(_LIB)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.polyline_tables.argtypes = [dp, dp, ctypes.c_int64, dp, ctypes.c_int64, dp, dp, dp]
        lib.polyline_tables.restype = None
        lib.block_thomas_f64.argtypes = [ctypes.c_int64, dp, dp, dp, dp, dp, dp]
        lib.block_thomas_f64.restype = None
        _lib = lib
        return lib
    except Exception as e:  # pragma: no cover - toolchain-less environments
        _load_error = e
        return None


def available() -> bool:
    return load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def polyline_tables(x, z, depths):
    """(A, P, T) tables over ``depths`` above the polyline minimum.

    Native path when the library is available; NumPy fallback otherwise.
    """
    lib = load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    z = np.ascontiguousarray(z, dtype=np.float64)
    depths = np.ascontiguousarray(depths, dtype=np.float64)
    m = depths.size
    if lib is not None:
        A = np.empty(m)
        P = np.empty(m)
        T = np.empty(m)
        lib.polyline_tables(_ptr(x), _ptr(z), x.size, _ptr(depths), m, _ptr(A), _ptr(P), _ptr(T))
        return A, P, T
    from flowsim_tpu.geometry_tables import polyline_properties

    zmin = z.min()
    out = np.array([polyline_properties(x, z, zmin + d) for d in depths])
    return out[:, 0], out[:, 1], out[:, 3]


def block_thomas(L, D, U, b):
    """Native sequential 2x2-block tridiagonal solve (CPU oracle path)."""
    lib = load()
    L = np.ascontiguousarray(L, dtype=np.float64)
    D = np.ascontiguousarray(D, dtype=np.float64)
    U = np.ascontiguousarray(U, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    n = D.shape[0]
    if lib is not None:
        x = np.empty((n, 2))
        work = np.empty(6 * n)
        lib.block_thomas_f64(n, _ptr(L), _ptr(D), _ptr(U), _ptr(b), _ptr(x), _ptr(work))
        return x
    import jax

    from flowsim_tpu.ops import tridiag

    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(tridiag.block_thomas(L, D, U, b))
