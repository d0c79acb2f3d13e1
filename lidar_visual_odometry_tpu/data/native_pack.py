"""ctypes binding for the native polar scan packer (native/scanpack.cpp).

Drop-in accelerated twin of ``ops.pointcloud.pack_polar_scan`` over a whole
chunk: the numpy packer costs ~16 ms per HDL-64 frame (more than the per-frame
device budget of the pipeline it feeds); the native one is ~1 ms and packs the
chunk's frames on parallel threads. Falls back to numpy if g++ is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "scanpack.cpp")
_SO = os.path.join(_NATIVE_DIR, "libscanpack.so")

_lib = None
_unavailable = False


def _load():
    global _lib, _unavailable
    if _lib is None and not _unavailable:
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", _SRC, "-o", _SO],
                    check=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.lvo_pack_polar.restype = ctypes.c_int32
            lib.lvo_pack_polar.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),   # pts array-of-pointers
                ctypes.POINTER(ctypes.c_int64),    # counts
                ctypes.c_int32,                    # n_frames
                ctypes.c_int64,                    # stride (floats per row)
                ctypes.c_int32,                    # n_scans
                ctypes.c_int32,                    # width
                ctypes.c_float,                    # min_range
                ctypes.c_float,                    # max_range
                ctypes.POINTER(ctypes.c_uint16),   # out
            ]
            _lib = lib
        except Exception:  # pragma: no cover - toolchain-less environments
            _unavailable = True
    return _lib


def pack_polar_chunk(
    scans,
    *,
    n_scans: int,
    width: int,
    min_range: float,
    max_range: float,
    n_frames: int | None = None,
    channels: int = 2,
) -> np.ndarray:
    """Pack a list of raw (n_i, ≥3) float scans → (K, R, W, channels) uint16.

    K = n_frames (≥ len(scans); extra frames stay zero = empty, for ragged
    final chunks). Uses the native multi-threaded packer when buildable,
    else the numpy reference implementation. channels=1 = range-only
    (2 B/cell minimum-transfer mode): the native packer always emits both
    channels; the offsets plane is sliced away before upload.
    """
    if channels == 1:
        full = pack_polar_chunk(
            scans, n_scans=n_scans, width=width, min_range=min_range,
            max_range=max_range, n_frames=n_frames, channels=2,
        )
        return np.ascontiguousarray(full[..., :1])
    K = n_frames if n_frames is not None else len(scans)
    assert K >= len(scans)
    out = np.zeros((K, n_scans, width, 2), np.uint16)

    lib = _load()
    if lib is None:
        from ..ops.pointcloud import pack_polar_scan

        for i, pts in enumerate(scans):
            out[i] = pack_polar_scan(
                np.asarray(pts), n_scans=n_scans, width=width,
                min_range=min_range, max_range=max_range,
            )
        return out

    arrs = [
        np.ascontiguousarray(np.asarray(p, dtype=np.float32)) for p in scans
    ]
    ptrs = (ctypes.c_void_p * len(arrs))(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs]
    )
    counts = (ctypes.c_int64 * len(arrs))(*[a.shape[0] for a in arrs])
    stride = arrs[0].shape[1] if arrs else 3
    for a in arrs:
        assert a.ndim == 2 and a.shape[1] == stride
    rc = lib.lvo_pack_polar(
        ptrs, counts, len(arrs), stride, n_scans, width,
        min_range, max_range,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    assert rc == 0, f"lvo_pack_polar failed (n_scans={n_scans})"
    return out
