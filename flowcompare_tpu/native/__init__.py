"""Native host-runtime bindings (ctypes over a g++-built shared library).

Build happens on first use and is cached next to the source; every entry
point falls back to numpy when no toolchain is available, so the package
never hard-requires a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native_ops.cpp")
_LIB = os.path.join(_HERE, "_native_ops.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _LIB if (os.path.exists(_LIB)
                    and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)) \
        else _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.voxelize_grid.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                                  f32p, f32p, i64p, ctypes.c_int32, i64p]
    lib.count_voxels.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.fps.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32,
                        ctypes.c_int64, i64p]
    lib.gather_records.argtypes = [f32p, i64p, ctypes.c_int64,
                                   ctypes.c_int64, f32p, ctypes.c_int32]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def voxelize_grid(points: np.ndarray, start, size, steps) -> np.ndarray:
    """Grid binning; native when built, numpy otherwise."""
    points = np.ascontiguousarray(points, np.float32)
    start = np.ascontiguousarray(start, np.float32)
    size = np.ascontiguousarray(size, np.float32)
    steps = np.ascontiguousarray(steps, np.int64)
    d_grid = len(size)
    lib = get_lib()
    if lib is not None:
        out = np.empty(points.shape[0], np.int64)
        lib.voxelize_grid(points, points.shape[0], points.shape[1],
                          start, size, steps, d_grid, out)
        return out
    cell = np.clip(np.floor((points[:, :d_grid] - start) / size).astype(np.int64),
                   0, steps - 1)
    strides = np.concatenate([[1], np.cumprod(steps[:-1])])
    return (cell * strides).sum(axis=-1)


def fps_indices(points: np.ndarray, m: int) -> np.ndarray:
    """Deterministic FPS indices (start 0); native when built."""
    points = np.ascontiguousarray(points, np.float32)
    n = points.shape[0]
    lib = get_lib()
    if lib is not None and n > 0:
        out = np.empty(m, np.int64)
        lib.fps(points, n, points.shape[1], m, out)
        return out
    sel = np.zeros(m, np.int64)
    d = np.full(n, np.inf)
    far = 0
    for i in range(m):
        sel[i] = far
        dd = np.sum((points[:, :3] - points[far, :3]) ** 2, axis=1)
        d = np.minimum(d, dd)
        far = int(np.argmax(d))
    return sel


def gather_records(base: np.ndarray, indices: np.ndarray,
                   record_floats: int, n_threads: int = 4) -> np.ndarray:
    """Batch-gather fixed-size f32 records; native multithreaded when built."""
    indices = np.ascontiguousarray(indices, np.int64)
    lib = get_lib()
    if lib is not None:
        out = np.empty((len(indices), record_floats), np.float32)
        lib.gather_records(base, indices, len(indices), record_floats, out,
                           n_threads)
        return out
    return base.reshape(-1, record_floats)[indices].copy()
