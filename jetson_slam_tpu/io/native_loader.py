"""ctypes bindings to the native prefetching image loader.

The native library (native/loader.cpp, built by native/Makefile) runs a
pthread worker pool that decodes frames ahead of the tracker into a ring
buffer — the runtime counterpart of the reference's C++ dataset drivers and
SyncedMem async copies.  Falls back to Python decoding when the .so isn't
built or a format (PNG) needs PIL.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    path = os.path.join(here, "native", "libjetson_slam_native.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.loader_get.restype = ctypes.c_int
    lib.loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.fast_lut_build.argtypes = [ctypes.c_int, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class PrefetchLoader:
    """Decodes image sequences ahead of consumption on native threads.

    Supports .pgm (P5) and fixed-size .raw files natively; anything else
    falls back to Python decoding on access.
    """

    def __init__(self, paths, height=0, width=0, n_threads=2, capacity=8):
        self.paths = list(paths)
        self.height = height
        self.width = width
        self._handle = None
        lib = _load_lib()
        native_ok = lib is not None and all(
            p.endswith((".pgm", ".raw")) for p in self.paths)
        if native_ok and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = lib.loader_create(
                arr, len(self.paths), height, width, n_threads, capacity)
            self._lib = lib
            # keep the path array alive for the worker threads
            self._paths_arr = arr

    def __len__(self):
        return len(self.paths)

    def get(self, index) -> np.ndarray:
        if self._handle is not None:
            h = ctypes.c_int()
            w = ctypes.c_int()
            cap_h = self.height or 4096
            cap_w = self.width or 4096
            buf = np.empty(cap_h * cap_w, np.uint8)
            r = self._lib.loader_get(
                self._handle, index,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(h), ctypes.byref(w))
            if r == 1:
                return buf[: h.value * w.value].reshape(h.value, w.value)
            raise IOError(f"native decode failed for {self.paths[index]}")
        from .datasets import imread_gray
        return imread_gray(self.paths[index])

    def close(self):
        if self._handle is not None:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def fast_lut_native(n_min: int, n_max: int) -> np.ndarray | None:
    """Native FAST LUT builder (orb_gpu.cpp:366-436 semantics)."""
    lib = _load_lib()
    if lib is None:
        return None
    out = np.zeros(1 << 16, np.uint8)
    lib.fast_lut_build(n_min, n_max,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
