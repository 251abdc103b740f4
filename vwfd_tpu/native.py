"""ctypes bindings for the native host-side data kernels (csrc/).

Builds `_native.so` on first use with the system g++ (no pip deps); every
entry point has a numpy fallback, so the package works without a compiler.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc", "blockdct.cpp")
# built artifact lives OUTSIDE the package: a raw ctypes .so inside a
# package directory would be picked up as a broken extension module
_SO = os.path.join(os.path.dirname(__file__), "..", "build",
                   "vwfd_native.so")


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        os.makedirs(os.path.dirname(_SO), exist_ok=True)
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 os.path.abspath(_SRC), "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.blockwise_dct8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.blockwise_dct8_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.draw_thick_line.argtypes = [
            ctypes.POINTER(ctypes.c_float)] + [ctypes.c_int] * 7
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def blockwise_dct(plane: np.ndarray) -> np.ndarray:
    """(H, W) float32 → (H/8, W/8, 64) DCT blocks via the C++ kernel."""
    lib = _load()
    assert lib is not None
    plane = np.ascontiguousarray(plane, dtype=np.float32)
    h, w = plane.shape
    out = np.empty((h // 8, w // 8, 64), dtype=np.float32)
    lib.blockwise_dct8(
        plane.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def draw_thick_line(mask: np.ndarray, y0, x0, y1, x1, radius) -> None:
    """In-place thick line rasterization (cv2.line replacement)."""
    lib = _load()
    assert lib is not None
    assert mask.dtype == np.float32 and mask.flags.c_contiguous
    h, w = mask.shape
    lib.draw_thick_line(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        int(y0), int(x0), int(y1), int(x1), int(radius))
