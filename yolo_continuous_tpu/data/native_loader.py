"""ctypes bridge to the native C++ staging library (native/staging.cpp).

The native path does JPEG decode + bilinear resize + centered letterbox
in a C++ thread pool — the framework's replacement for the reference's
dependency-native image path (PIL/OpenCV inside DataLoader workers,
SURVEY §2.3). Falls back transparently to the cv2 implementation in
``dataset.py`` when the library isn't built.

Build once:  ``make -C native``  (or ``ensure_built()``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "libstaging.so")
_lib = None


def ensure_built(quiet: bool = True) -> bool:
    """Build native/libstaging.so if missing; returns availability."""
    if os.path.exists(_SO):
        return True
    try:
        subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                       check=True, capture_output=quiet)
    except Exception:
        return False
    return os.path.exists(_SO)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not ensure_built():
        raise OSError("native staging library unavailable")
    lib = ctypes.CDLL(_SO)
    lib.stage_batch.restype = ctypes.c_int
    lib.stage_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_uint8,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def stage_batch_native(paths: List[str], size: int = 640, fill: int = 128,
                       num_threads: int = 0) -> Tuple[np.ndarray, np.ndarray,
                                                      np.ndarray]:
    """paths -> (tiles (n,S,S,3) u8, metas (n,5) f32, ok (n,) bool).

    metas rows are [iw, ih, scale, ox, oy] — identical contract to
    ``preprocess.stage_image``.
    """
    lib = _load()
    n = len(paths)
    if num_threads <= 0:
        num_threads = min(max(os.cpu_count() or 1, 1), 8)
    tiles = np.empty((n, size, size, 3), np.uint8)
    metas = np.empty((n, 5), np.float32)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.stage_batch(
        arr, n, size, fill,
        tiles.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        metas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads)
    return tiles, metas, ok.astype(bool)
