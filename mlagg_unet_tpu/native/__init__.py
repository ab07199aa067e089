"""Native (C++) host-side components.

The reference's native surface is CUDA/Triton kernels (replaced by Pallas);
its host pipeline is pure Python. Here the host-side hot loop — spline
resampling in preprocessing and prediction export — gets an OpenMP C++
implementation (csrc/resample.cpp), built on first import with the system
compiler and cached next to the source. scipy remains the fallback and the
numerics ground truth.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO_PATH = os.path.join(_CSRC, "_mlagg_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    src = os.path.join(_CSRC, "resample.cpp")
    if not os.path.isfile(src):
        return None
    if (os.path.isfile(_SO_PATH)
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src)):
        return _SO_PATH
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off",
           "-shared", "-fPIC", "-fopenmp", src, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO_PATH
    except Exception:
        # no OpenMP? retry without
        try:
            cmd = ["g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
                   src, "-o", _SO_PATH]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return _SO_PATH
        except Exception:
            return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MLAGG_DISABLE_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.resample3d.restype = ctypes.c_int
            lib.resample3d.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_resize(data: np.ndarray, new_shape, order: int
                  ) -> Optional[np.ndarray]:
    """2D/3D resize with the pixel-center mapping. Returns None when the
    native library is unavailable or the request is unsupported."""
    if order not in (0, 1, 3):
        return None
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(data, dtype=np.float64)
    if src.ndim == 2:
        src3 = src[None]
        out_shape3 = (1, *new_shape)
    elif src.ndim == 3:
        src3 = src
        out_shape3 = tuple(new_shape)
    else:
        return None
    out = np.empty(out_shape3, np.float64)
    rc = lib.resample3d(
        src3.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        src3.shape[0], src3.shape[1], src3.shape[2],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.shape[0], out.shape[1], out.shape[2],
        int(order),
    )
    if rc != 0:
        return None
    return out[0] if data.ndim == 2 else out
