"""ctypes binding to the C++ CPU FWHT oracle (build-on-demand).

Native-component parity with the reference's C++ extension
(src/fwht/cpp/{fwht.cpp,setup.py,jit.py}; role: CPU test oracle,
README.md:64). The reference binds through pybind11/libtorch; here the
library is dependency-free C++ compiled with g++ at first use and bound
with ctypes — no build system beyond the compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["fwht_cpp", "whvi_mul_cpp", "oracle_available"]

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_SRC = os.path.join(_CSRC, "fwht_oracle.cpp")
_LIB_PATH = os.path.join(_CSRC, "libfwht_oracle.so")
_lock = threading.Lock()
_lib = None


def _build(out_path: str) -> None:
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        out_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib_path = _LIB_PATH
        if not os.path.exists(lib_path) or os.path.getmtime(
            lib_path
        ) < os.path.getmtime(_SRC):
            try:
                _build(lib_path)
            except (subprocess.CalledProcessError, OSError, PermissionError):
                # installed site-packages may be read-only (wheel
                # install): build into a fresh private per-process dir.
                # mkdtemp (0700, unpredictable name) rather than a
                # shared cache path: a predictable world-visible cache
                # could be pre-planted by another local user, and a
                # shared file is a cross-process build race — a ~1 s
                # rebuild per process is the safe trade (review round 5)
                import tempfile

                cache = tempfile.mkdtemp(prefix="whvi_tpu_oracle_")
                lib_path = os.path.join(cache, "libfwht_oracle.so")
                _build(lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.fwht_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.fwht_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.whvi_mul_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double)
        ] * 5 + [ctypes.c_int64, ctypes.c_int64]
        _lib = lib
        return lib


def oracle_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def fwht_cpp(x: np.ndarray) -> np.ndarray:
    """FWHT along the last axis via the C++ library (f32 or f64)."""
    lib = _load()
    x = np.ascontiguousarray(x)
    D = x.shape[-1]
    out = x.reshape(-1, D).copy()
    batch = out.shape[0]
    if out.dtype == np.float32:
        lib.fwht_f32(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), batch, D
        )
    elif out.dtype == np.float64:
        lib.fwht_f64(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), batch, D
        )
    else:
        raise TypeError(f"unsupported dtype {out.dtype}")
    return out.reshape(x.shape)


def whvi_mul_cpp(
    s1: np.ndarray, u: np.ndarray, s2: np.ndarray, x: np.ndarray
) -> np.ndarray:
    """Fused WHVI product oracle in float64; returns x's dtype."""
    lib = _load()
    D = x.shape[-1]
    x2 = np.ascontiguousarray(x, dtype=np.float64).reshape(-1, D)
    out = np.empty_like(x2)
    args = [
        np.ascontiguousarray(v, dtype=np.float64) for v in (s1, u, s2)
    ]
    lib.whvi_mul_f64(
        x2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        args[0].ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        args[1].ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        args[2].ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        x2.shape[0],
        D,
    )
    return out.reshape(x.shape).astype(x.dtype)
