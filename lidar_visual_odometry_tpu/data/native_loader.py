"""ctypes binding for the native async scan loader (native/dataloader.cpp).

Builds the shared library on first use (g++, cached next to the source) and
exposes an iterator of fixed-capacity padded scans — the native replacement
for kittiHelper's read-and-publish loop, with multi-threaded prefetch that
overlaps disk I/O with device compute.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "dataloader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libdataloader.so")

_lib = None


def _build() -> str:
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
                _SRC, "-o", _SO,
            ],
            check=True,
        )
    return _SO


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build())
        _lib.lvo_reader_create.restype = ctypes.c_void_p
        _lib.lvo_reader_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
        ]
        _lib.lvo_reader_next.restype = ctypes.c_int32
        _lib.lvo_reader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib.lvo_reader_destroy.argtypes = [ctypes.c_void_p]
    return _lib


class NativeScanReader:
    """In-order iterator over ``pattern % index`` velodyne .bin files.

    Yields (xyz (capacity, 3) float32, mask (capacity,) bool, refl) with
    background prefetch. Capacity-padded — ready for the jitted pipeline.
    """

    def __init__(
        self,
        pattern: str,
        n_files: int,
        capacity: int = 131072,
        prefetch: int = 4,
        threads: int = 2,
    ):
        lib = _load()
        self._lib = lib
        self.capacity = capacity
        self.n_files = n_files
        self._handle = lib.lvo_reader_create(
            pattern.encode(), n_files, capacity, prefetch, threads
        )
        if not self._handle:
            raise RuntimeError("failed to create native reader")

    def __iter__(self):
        for _ in range(self.n_files):
            out = self.next()
            if out is None:
                return
            yield out

    def next(self):
        xyz = np.empty((self.capacity, 3), np.float32)
        mask = np.empty((self.capacity,), np.uint8)
        refl = np.empty((self.capacity,), np.float32)
        n = self._lib.lvo_reader_next(
            self._handle,
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            refl.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if n == -2:
            return None
        if n < 0:
            raise FileNotFoundError("missing scan file in sequence")
        return xyz, mask.astype(bool), refl

    def close(self):
        if self._handle:
            self._lib.lvo_reader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
