"""ctypes bindings for the native host-side batch kernels.

Compiles batch_ops.cpp with g++ on first use (cached as
libbatch_ops.so next to the source); every entry point has a numpy
fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "batch_ops.cpp")
_LIB_PATH = os.path.join(_DIR, "libbatch_ops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i64 = ctypes.c_int64
        f64 = ctypes.c_double
        lib.u8_to_f32_affine.argtypes = [u8p, f32p, i64, f64, f64]
        lib.u8_batch_transform.argtypes = [u8p, f32p, i64, i64, i64, i64,
                                           f64, f64, u8p]
        lib.u8_gather_transform.argtypes = [u8p, i64p, f32p, i64, i64,
                                            f64, f64, u8p, i64, i64, i64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def batch_transform(images: np.ndarray, scale: float, bias: float,
                    flip_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """uint8 NHWC batch -> float32, affine rescale + optional h-flip."""
    assert images.dtype == np.uint8 and images.ndim == 4
    images = np.ascontiguousarray(images)
    lib = get_lib()
    if lib is None:  # numpy fallback: f64 LUT keeps endpoints exact
        lut = (np.arange(256, dtype=np.float64) * scale + bias).astype(np.float32)
        out = lut[images]
        if flip_mask is not None:
            m = flip_mask.astype(bool)
            out[m] = out[m, :, ::-1]
        return out
    n, h, w, c = images.shape
    out = np.empty(images.shape, np.float32)
    fm = None
    if flip_mask is not None:
        fm = np.ascontiguousarray(flip_mask.astype(np.uint8))
    lib.u8_batch_transform(
        _ptr(images, ctypes.c_uint8), _ptr(out, ctypes.c_float),
        n, h, w, c, scale, bias,
        _ptr(fm, ctypes.c_uint8) if fm is not None else None)
    return out


def gather_transform(images: np.ndarray, idx: np.ndarray, scale: float,
                     bias: float,
                     flip_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Fused index-gather + uint8->f32 transform (shuffled batching)."""
    assert images.dtype == np.uint8 and images.ndim == 4
    lib = get_lib()
    if lib is None:
        return batch_transform(images[idx], scale, bias, flip_mask)
    images = np.ascontiguousarray(images)
    idx = np.ascontiguousarray(idx.astype(np.int64))
    n, h, w, c = len(idx), *images.shape[1:]
    out = np.empty((n, h, w, c), np.float32)
    fm = None
    if flip_mask is not None:
        fm = np.ascontiguousarray(flip_mask.astype(np.uint8))
    lib.u8_gather_transform(
        _ptr(images, ctypes.c_uint8), _ptr(idx, ctypes.c_int64),
        _ptr(out, ctypes.c_float), n, h * w * c, scale, bias,
        _ptr(fm, ctypes.c_uint8) if fm is not None else None, h, w, c)
    return out
