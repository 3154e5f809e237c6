"""ctypes bindings for the native IO runtime (speedy_io.cpp).

Builds on first use with g++ (the toolchain is assumed present, as in the
reference's MKL/NetCDF link requirements); every entry point has a pure
numpy fallback so the framework degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "native" / "speedy_io.cpp"
_SO = _DIR / "native" / "speedy_io.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.read_boundary_field.restype = ctypes.c_int
        lib.gather_patches.restype = ctypes.c_int
        lib.gather_series.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def read_boundary_field(path: str, group: int, nlon: int, nlat: int
                        ) -> np.ndarray:
    """Native boundary-record reader; numpy fallback on failure."""
    lib = get_lib()
    if lib is not None:
        out = np.empty((nlat, nlon), dtype=np.float64)
        rc = lib.read_boundary_field(
            str(path).encode(), ctypes.c_int64(group), ctypes.c_int64(nlon),
            ctypes.c_int64(nlat),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc == 0:
            return out
    # fallback
    count = nlat * nlon
    with open(path, "rb") as f:
        f.seek(group * count * 4)
        raw = np.fromfile(f, dtype="<f4", count=count)
    field = raw.reshape(nlat, nlon)[::-1].astype(np.float64)
    field[field <= -999] = 0.0
    return field


def gather_series(fields: np.ndarray, iy: np.ndarray, ix: np.ndarray,
                  n_threads: int = 0) -> np.ndarray:
    """Packed patch series (T, R, ny*nx) from (T, nlat, nlon) float32 fields.

    The native path runs the gather fan-out on a thread pool (the data
    side of the reference's per-region parallel NetCDF reads)."""
    T, nlat, nlon = fields.shape
    R, ny = iy.shape
    nx = ix.shape[1]
    fields32 = np.ascontiguousarray(fields, dtype=np.float32)
    iy32 = np.ascontiguousarray(iy, dtype=np.int32)
    ix32 = np.ascontiguousarray(ix, dtype=np.int32)
    lib = get_lib()
    if lib is not None:
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, 16)
        out = np.empty((T, R, ny * nx), dtype=np.float32)
        rc = lib.gather_series(
            fields32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(T), ctypes.c_int64(nlat), ctypes.c_int64(nlon),
            iy32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ix32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(R), ctypes.c_int64(ny), ctypes.c_int64(nx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(n_threads))
        if rc == 0:
            return out
    # fallback: numpy advanced indexing
    return fields32[:, iy32[:, :, None], ix32[:, None, :]].reshape(T, R, -1)
