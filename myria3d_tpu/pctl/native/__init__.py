"""pctl.native — ctypes loader for the C++ host kernels.

Builds ``pctl_native.cpp`` with g++ on first import (cached .so beside the
source); every entry degrades to ``None`` when no toolchain is available so
the pure-numpy fallbacks keep working (the transforms pick native
automatically when present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pctl_native.cpp")
_SO = os.path.join(_DIR, "pctl_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> Optional[str]:
    if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _SO
    except (OSError, subprocess.SubprocessError) as e:
        warnings.warn(f"pctl_native build failed ({e}); using numpy fallbacks")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.grid_sample.restype = ctypes.c_int64
    lib.grid_sample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.crop_square.restype = ctypes.c_int64
    lib.crop_square.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def native_grid_sample(
    pos: np.ndarray,
    x: Optional[np.ndarray],
    y: Optional[np.ndarray],
    size: float,
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray], Optional[np.ndarray], np.ndarray]]:
    """(pos_mean, x_mean, y_majority, inverse) or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = pos.shape[0]
    pos_c = np.ascontiguousarray(pos, np.float32)
    fdim = 0 if x is None else int(x.shape[1])
    x_c = (
        np.ascontiguousarray(x, np.float32)
        if x is not None else np.zeros((n, 0), np.float32)
    )
    has_y = y is not None
    y_c = (
        np.ascontiguousarray(y, np.int32) if has_y else np.zeros(n, np.int32)
    )
    out_pos = np.empty((n, 3), np.float32)
    out_x = np.empty((n, max(fdim, 1)), np.float32)
    out_y = np.empty(n, np.int32)
    inverse = np.empty(n, np.int32)
    n_vox = lib.grid_sample(
        _fptr(pos_c), _fptr(x_c), _iptr(y_c),
        ctypes.c_int64(n), ctypes.c_int64(fdim), ctypes.c_float(size),
        ctypes.c_int(1 if has_y else 0),
        _fptr(out_pos), _fptr(out_x), _iptr(out_y), _iptr(inverse),
    )
    if n_vox < 0:
        return None
    return (
        out_pos[:n_vox].copy(),
        out_x[:n_vox, :fdim].copy() if fdim else None,
        out_y[:n_vox].copy() if has_y else None,
        inverse,
    )


def native_crop_square(
    pos: np.ndarray, cx: float, cy: float, half_width: float
) -> Optional[np.ndarray]:
    """Indices of points inside the square, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pos_c = np.ascontiguousarray(pos, np.float32)
    out = np.empty(pos.shape[0], np.int32)
    m = lib.crop_square(
        _fptr(pos_c), ctypes.c_int64(pos.shape[0]),
        ctypes.c_float(cx), ctypes.c_float(cy), ctypes.c_float(half_width),
        _iptr(out),
    )
    return out[:m].copy()
