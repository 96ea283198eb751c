"""ctypes bindings for the native host-augmentation kernels
(native/augment.cpp). Builds the shared library on first import (g++ is
in the image); every entry point has a scipy fallback so the package
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "augment.cpp")
_LIB_PATH = os.path.join(_HERE, "libaugment.so")

_lib = None


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src,
             "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32 = ctypes.POINTER(ctypes.c_float)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.zoom_nearest_f32.argtypes = [f32, ctypes.c_int, ctypes.c_int, f32,
                                     ctypes.c_int, ctypes.c_int]
    lib.zoom_nearest_u8.argtypes = [u8, ctypes.c_int, ctypes.c_int, u8,
                                    ctypes.c_int, ctypes.c_int]
    lib.rotate_nearest_f32.argtypes = [f32, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_float, f32]
    lib.rotate_nearest_u8.argtypes = [u8, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_float, u8]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def zoom_nearest(img: np.ndarray, out_size) -> np.ndarray:
    """scipy.ndimage.zoom(order=0) equivalent for 2D arrays."""
    lib = _load()
    oh, ow = int(out_size[0]), int(out_size[1])
    if lib is None:
        from scipy.ndimage import zoom as nd_zoom

        h, w = img.shape
        return nd_zoom(img, (oh / h, ow / w), order=0)
    if img.dtype == np.float32:
        img = np.ascontiguousarray(img)
        out = np.empty((oh, ow), np.float32)
        lib.zoom_nearest_f32(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            img.shape[0], img.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), oh, ow,
        )
        return out
    img8 = np.ascontiguousarray(img.astype(np.uint8))
    out = np.empty((oh, ow), np.uint8)
    lib.zoom_nearest_u8(
        img8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img8.shape[0], img8.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow,
    )
    return out


def rotate_nearest(img: np.ndarray, angle: float) -> np.ndarray:
    """scipy.ndimage.rotate(order=0, reshape=False) equivalent."""
    lib = _load()
    if lib is None:
        from scipy import ndimage

        return ndimage.rotate(img, angle, order=0, reshape=False)
    if img.dtype == np.float32:
        img = np.ascontiguousarray(img)
        out = np.empty_like(img)
        lib.rotate_nearest_f32(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            img.shape[0], img.shape[1], float(angle),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    img8 = np.ascontiguousarray(img.astype(np.uint8))
    out = np.empty_like(img8)
    lib.rotate_nearest_u8(
        img8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img8.shape[0], img8.shape[1], float(angle),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
