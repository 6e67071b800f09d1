"""Native (C++) runtime components, bound via ctypes.

Currently: the fast NIfTI reader (gzip inflate + header/voxel decode in C++,
`nifti_reader.cpp`). The library is compiled on first use with g++ and cached
next to the sources; `available()` gates callers so the pure-Python codec
(`unet3d_tpu/data/nifti.py`) remains a complete fallback.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nifti_reader.cpp")
_LIB = os.path.join(_DIR, "libnifti_reader.so")

_DTYPES = {
    2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32, 64: np.float64,
    256: np.int8, 512: np.uint16, 768: np.uint32, 1024: np.int64, 1280: np.uint64,
}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC, "-lz"],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception as error:
        logging.debug("native nifti reader build failed: %s", error)
        return False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (os.path.exists(_SRC) and
                                        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.nifti_open.restype = ctypes.c_void_p
        lib.nifti_open.argtypes = [ctypes.c_char_p]
        lib.nifti_close.argtypes = [ctypes.c_void_p]
        lib.nifti_ndim.argtypes = [ctypes.c_void_p]
        lib.nifti_dim.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.nifti_datatype.argtypes = [ctypes.c_void_p]
        lib.nifti_scl_slope.restype = ctypes.c_float
        lib.nifti_scl_slope.argtypes = [ctypes.c_void_p]
        lib.nifti_scl_inter.restype = ctypes.c_float
        lib.nifti_scl_inter.argtypes = [ctypes.c_void_p]
        lib.nifti_data.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.nifti_data.argtypes = [ctypes.c_void_p]
        lib.nifti_data_size.restype = ctypes.c_long
        lib.nifti_data_size.argtypes = [ctypes.c_void_p]
        lib.nifti_affine.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load_lib() is not None


def load_nifti(filename: str, scale: bool = True
               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Read (data, affine) with the native decoder; None if unavailable/failed."""
    lib = _load_lib()
    if lib is None:
        return None
    handle = lib.nifti_open(os.fsencode(str(filename)))
    if not handle:
        return None
    try:
        ndim = lib.nifti_ndim(handle)
        shape = tuple(lib.nifti_dim(handle, i) for i in range(ndim))
        dtype = _DTYPES.get(lib.nifti_datatype(handle))
        if dtype is None:
            return None
        size = lib.nifti_data_size(handle)
        # zero-copy view over the native buffer, one memcpy into numpy memory
        view = np.ctypeslib.as_array(lib.nifti_data(handle), shape=(size,))
        flat = np.empty(size, dtype=np.uint8)
        np.copyto(flat, view)
        data = flat.view(dtype).reshape(shape, order="F")
        slope = lib.nifti_scl_slope(handle)
        inter = lib.nifti_scl_inter(handle)
        # NaN/inf slope = "no scaling" (nibabel get_slope_inter); a non-finite
        # intercept is sanitized to 0 rather than NaN-ing every voxel
        # (data/nifti.py applies the same rule)
        inter = inter if np.isfinite(inter) else 0.0
        slope_ok = np.isfinite(slope) and slope not in (0.0, 1.0)
        inter_ok = (inter != 0.0
                    and np.isfinite(slope) and slope != 0.0)
        if scale and (slope_ok or inter_ok):
            data = data.astype(np.float32) * slope + inter
        affine_buf = (ctypes.c_double * 16)()
        lib.nifti_affine(handle, affine_buf)
        affine = np.asarray(affine_buf).reshape(4, 4)
        return np.asarray(data), affine
    finally:
        lib.nifti_close(handle)
