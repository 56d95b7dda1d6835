"""io_native: C++ host ops (ctypes) with transparent on-demand build.

Provides the native replacements for the reference's third-party native
dependencies (SURVEY.md §2.2): ITK-semantics resampling, KD-tree surface
distances, percentile z-score.  The shared library is compiled with g++
on first use (cached next to the source); every entry point has a pure
Python/scipy fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cc")
_LIB_PATH = os.path.join(_HERE, "libtpuseg_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        raise RuntimeError("native build previously failed")
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _LIB_PATH, _SRC, "-lz"],
                    check=True, capture_output=True, timeout=300,
                )
            except Exception as e:
                _build_failed = True
                raise RuntimeError(f"native build failed: {e}")
        lib = ctypes.CDLL(_LIB_PATH)
        i64, f64 = ctypes.c_int64, ctypes.c_double
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.resample_linear_f32.argtypes = [fp, i64, i64, i64, fp, i64, i64, i64, f64, f64, f64]
        lib.resample_nearest_u8.argtypes = [u8p, i64, i64, i64, u8p, i64, i64, i64, f64, f64, f64]
        lib.nn_distances.argtypes = [dp, i64, dp, i64, dp]
        lib.percentile_zscore_f32.argtypes = [fp, i64, f64, f64]
        cstr, u8raw = ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8)
        lib.nifti_read_bytes.argtypes = [cstr, i64, i64, u8raw]
        lib.nifti_read_bytes.restype = i64
        lib.nifti_write_bytes.argtypes = [cstr, u8raw, i64, u8raw, i64, ctypes.c_int]
        lib.nifti_write_bytes.restype = i64
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def resample_linear(arr: np.ndarray, out_shape_zyx) -> np.ndarray:
    """ITK-semantics trilinear resize of a (z,y,x) float volume."""
    lib = _load()
    src = np.ascontiguousarray(arr, np.float32)
    oz, oy, ox = out_shape_zyx
    out = np.empty((oz, oy, ox), np.float32)
    iz, iy, ix = src.shape
    lib.resample_linear_f32(
        src, iz, iy, ix, out, oz, oy, ox, iz / oz, iy / oy, ix / ox
    )
    return out


def resample_nearest(arr: np.ndarray, out_shape_zyx) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(arr, np.uint8)
    oz, oy, ox = out_shape_zyx
    out = np.empty((oz, oy, ox), np.uint8)
    iz, iy, ix = src.shape
    lib.resample_nearest_u8(
        src, iz, iy, ix, out, oz, oy, ox, iz / oz, iy / oy, ix / ox
    )
    return out


def nn_distances(from_pts: np.ndarray, to_pts: np.ndarray) -> np.ndarray:
    """Nearest-neighbour euclidean distances (3D point sets)."""
    lib = _load()
    f = np.ascontiguousarray(from_pts, np.float64)
    t = np.ascontiguousarray(to_pts, np.float64)
    out = np.empty((len(f),), np.float64)
    lib.nn_distances(f, len(f), t, len(t), out)
    return out


def percentile_zscore(arr: np.ndarray, lower=5.0, upper=95.0) -> np.ndarray:
    lib = _load()
    data = np.ascontiguousarray(arr, np.float32).copy()
    lib.percentile_zscore_f32(data.reshape(-1), data.size, lower, upper)
    return data


def nifti_read_bytes(path: str, offset: int, count: int) -> np.ndarray:
    """Decompressed byte range of a .nii/.nii.gz file, streamed by the C++
    codec straight into a fresh numpy buffer (no intermediate copy)."""
    lib = _load()
    out = np.empty(count, np.uint8)
    got = lib.nifti_read_bytes(
        path.encode(), offset, count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if got < 0:
        raise IOError(f"nifti_read_bytes failed for {path}")
    return out[:got]


def nifti_write_bytes(path: str, header: bytes, data: np.ndarray, level: int) -> None:
    """Write header+voxels; level<=0 plain .nii, 1-9 gzip (.nii.gz)."""
    lib = _load()
    hdr = np.frombuffer(header, np.uint8)
    payload = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    wrote = lib.nifti_write_bytes(
        path.encode(),
        hdr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), hdr.size,
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), payload.size,
        level,
    )
    if wrote != hdr.size + payload.size:
        raise IOError(f"nifti_write_bytes failed for {path} ({wrote})")
