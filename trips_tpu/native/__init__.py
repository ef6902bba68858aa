"""ctypes bindings for the native (C++) projector builder.

Builds ``libprojector.so`` on demand with the bundled Makefile; falls back
silently to the vectorized NumPy implementation when no toolchain is
available (``load() -> None``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libprojector.so")
_lib = None
_tried = False


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB):
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    for name in ("fan_beam_csr", "parallel_beam_csr"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
    _lib = lib
    return _lib


def _run(fn_name, nx, ny, angles, det_count, det_width, extra=()):
    lib = load()
    if lib is None:
        return None
    angles = np.ascontiguousarray(angles, dtype=np.float64)
    n_angles = len(angles)
    rows = n_angles * det_count
    cap = rows * (nx + ny + 3)
    rowptr = np.zeros(rows + 1, dtype=np.int64)
    col = np.zeros(cap, dtype=np.int32)
    val = np.zeros(cap, dtype=np.float64)
    fn = getattr(lib, fn_name)
    args = [
        ctypes.c_int(nx),
        ctypes.c_int(ny),
        ctypes.c_int(n_angles),
        angles.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(det_count),
        ctypes.c_double(det_width),
        *extra,
        rowptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        val.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(cap),
    ]
    nnz = fn(*args)
    if nnz < 0:
        return None
    from scipy import sparse as sp

    return sp.csr_matrix(
        (val[:nnz], col[:nnz], rowptr), shape=(rows, nx * ny)
    )


def fan_beam_csr_native(nx, ny, angles, det_count, det_width, so, od):
    return _run(
        "fan_beam_csr", nx, ny, angles, det_count, det_width,
        extra=(ctypes.c_double(so), ctypes.c_double(od)),
    )


def parallel_beam_csr_native(nx, ny, angles, det_count, det_width):
    return _run("parallel_beam_csr", nx, ny, angles, det_count, det_width)
