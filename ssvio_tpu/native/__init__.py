"""ctypes bindings for the native C++ runtime (prefetching data loader).

The reference's runtime is C++ throughout (loader: OpenCV imread on the
caller thread, reference test/test_system.cpp:40-43); here the native piece
is a decode/prefetch pipeline (dataloader.cpp) that feeds the device step.
Built lazily with g++ on first use (no pybind11 in this toolchain — plain
C ABI via ctypes); everything degrades to a pure-Python fallback when a
compiler is unavailable (see dataio.kitti.prefetching_reader).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dataloader.cpp")
_SO = os.path.join(_HERE, "_ssvio_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", _SO, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.ssv_decode_file_gray.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.ssv_decode_file_gray.restype = ctypes.c_int
    lib.ssv_decode_gray.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.ssv_decode_gray.restype = ctypes.c_int
    lib.ssv_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ssv_loader_create.restype = ctypes.c_void_p
    lib.ssv_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.ssv_loader_next.restype = ctypes.c_int
    lib.ssv_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.ssv_loader_destroy.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def decode_gray(path: str, max_bytes: int = 8 << 20) -> np.ndarray:
    """Decode one PNG/PGM file to a float32 [H, W] luma array."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty(max_bytes, np.uint8)
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.ssv_decode_file_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_bytes, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f"decode failed ({rc}): {path}")
    return out[: w.value * h.value].reshape(h.value, w.value).astype(np.float32)


class StereoLoader:
    """Prefetching in-order stereo pair reader over the native ring."""

    def __init__(self, left: Sequence[str], right: Sequence[str],
                 n_threads: int = 4, capacity: int = 8,
                 max_bytes: int = 8 << 20):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._n = len(left)
        self._max_bytes = max_bytes
        self._larr = (ctypes.c_char_p * self._n)(*[p.encode() for p in left])
        self._rarr = (ctypes.c_char_p * self._n)(*[p.encode() for p in right])
        self._h = lib.ssv_loader_create(self._larr, self._rarr, self._n,
                                        n_threads, capacity)
        if not self._h:
            raise RuntimeError("loader creation failed")

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        while True:
            if self._h is None:
                raise StopIteration
            bl = np.empty(self._max_bytes, np.uint8)
            br = np.empty(self._max_bytes, np.uint8)
            w, h = ctypes.c_int(), ctypes.c_int()
            rc = self._lib.ssv_loader_next(
                self._h, bl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                br.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self._max_bytes, ctypes.byref(w), ctypes.byref(h))
            if rc == -1:
                self.close()
                raise StopIteration
            if rc == -2:      # decode failure: skip the frame
                continue
            if rc == -3:
                raise ValueError("image larger than loader buffer")
            n = w.value * h.value
            return (bl[:n].reshape(h.value, w.value).astype(np.float32),
                    br[:n].reshape(h.value, w.value).astype(np.float32))

    def close(self):
        if self._h is not None:
            self._lib.ssv_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
