"""ctypes binding for the native C++ data loader (native/loader.cpp).

Provides zlib-backed grayscale PNG decode and an N-frames-ahead prefetch
pool feeding the device loop — the TPU-native replacement for MATLAB's
imageDatastore/readimage feed (VO.m:16-17, 71-72). Falls back silently when
the shared library has not been built (``make -C native``).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "libvoio.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.vo_png_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.vo_png_info.restype = ctypes.c_int
    lib.vo_png_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
    lib.vo_png_read.restype = ctypes.c_int
    lib.vo_prefetch_start.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.vo_prefetch_start.restype = ctypes.c_void_p
    lib.vo_prefetch_get.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
    lib.vo_prefetch_get.restype = ctypes.c_int
    lib.vo_prefetch_stop.argtypes = [ctypes.c_void_p]
    lib.vo_prefetch_stop.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def png_info(path: str) -> tuple[int, int]:
    lib = _load()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vo_png_info(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"vo_png_info({path}) failed: {rc}")
    return h.value, w.value


def read_png_gray(path: str) -> np.ndarray:
    """Decode one grayscale PNG -> [H, W] float32 in [0, 1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built (make -C native)")
    h, w = png_info(path)
    out = np.empty(h * w, np.float32)
    rc = lib.vo_png_read(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size)
    if rc != 0:
        raise IOError(f"vo_png_read({path}) failed: {rc}")
    return out.reshape(h, w)


class PrefetchFeed:
    """Threaded decode-ahead feed over a fixed list of PNG paths.

    Usage:
        feed = PrefetchFeed(paths, ahead=8, threads=4)
        img = feed[3]          # blocks until frame 3 decoded
        feed.close()
    """

    def __init__(self, paths, ahead: int = 8, threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader not built (make -C native)")
        self._lib = lib
        self.paths = list(paths)
        if not self.paths:
            raise ValueError("empty path list")
        self.h, self.w = png_info(self.paths[0])
        arr = (ctypes.c_char_p * len(self.paths))(*[p.encode() for p in self.paths])
        self._keepalive = arr
        self._handle = lib.vo_prefetch_start(arr, len(self.paths), ahead, threads)
        if not self._handle:
            raise RuntimeError("vo_prefetch_start failed")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        out = np.empty(self.h * self.w, np.float32)
        rc = self._lib.vo_prefetch_get(
            self._handle, idx, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size
        )
        if rc != 0:
            raise IOError(f"prefetch_get({idx}) failed: {rc}")
        return out.reshape(self.h, self.w)

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.vo_prefetch_stop(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
