"""ctypes bindings for the native host-runtime library (native/*.cpp).

The library is compiled on demand with g++ the first time it is needed;
every entry point has a pure-numpy fallback, so the package works without a
toolchain (``MMLF_TPU_NO_NATIVE=1`` disables native code entirely).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')
_SO_PATH = os.path.join(_NATIVE_DIR, 'libmmlf_native.so')


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, 'mmlf_native.cpp')
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ['g++', '-O3', '-march=native', '-fPIC', '-shared',
             '-std=c++17', '-pthread', '-o', _SO_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get('MMLF_TPU_NO_NATIVE'):
            return None
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None

        lib.texture_mask.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int32)]
        lib.texture_mask.restype = None
        lib.strided_window.argtypes = [
            ctypes.POINTER(ctypes.c_float)] + [ctypes.c_int64] * 8 + [
            ctypes.POINTER(ctypes.c_float)]
        lib.strided_window.restype = None
        _LIB = lib
        return _LIB


def texture_mask(center: np.ndarray, wsize: int,
                 threshold: float) -> 'np.ndarray | None':
    """Native MAD texture mask, or None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    center = np.ascontiguousarray(center, dtype=np.float32)
    h, w, c = center.shape
    if c != 3:
        return None
    out = np.empty((h, w), dtype=np.int32)
    lib.texture_mask(
        center.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, wsize, ctypes.c_float(threshold),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def strided_window(src: np.ndarray, ws_y: int, ws_x: int, f: int,
                   win: int) -> 'np.ndarray | None':
    """Native stride-f window cut from an (A, H, W, C) float32 array."""
    lib = get_lib()
    if lib is None or src.dtype != np.float32 or not src.flags.c_contiguous:
        return None
    a, h, w, c = src.shape
    dst = np.empty((a, win, win, c), dtype=np.float32)
    lib.strided_window(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        a, h, w, c, ws_y, ws_x, f, win,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst
