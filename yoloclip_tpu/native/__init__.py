"""ctypes bindings for the native host-side data loader.

`dataload.cpp` does parallel JPEG/PNG decode + letterbox into a
preallocated NHWC uint8 slab (see its header comment for the contract).
The library auto-builds with `make` on first import; if no toolchain or
headers are available everything degrades gracefully: `available()` is
False and callers (data/coco.py, benchmarks) fall back to cv2/PIL.

Usage:
    from yoloclip_tpu import native
    if native.available():
        img = native.decode_image('x.jpg')                 # (H, W, 3) u8
        canvas, scale = native.letterbox_u8(img, (640, 640))
        canvases, scales, nfail = native.load_batch(paths, (640, 640))
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, 'libycl_dataload.so')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(['make', '-C', _DIR], capture_output=True,
                           text=True, timeout=120)
        if r.returncode != 0:
            logger.info('native dataload build failed:\n%s', r.stderr)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.info('native dataload build unavailable: %s', e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_DIR, 'dataload.cpp')
        have_src = os.path.exists(src)   # prebuilt .so may ship w/o source
        if (not os.path.exists(_SO)
                or (have_src
                    and os.path.getmtime(_SO) < os.path.getmtime(src))):
            if not have_src or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.info('native dataload load failed: %s', e)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ycl_image_info.argtypes = [u8p, ctypes.c_long,
                                       ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.ycl_image_info.restype = ctypes.c_int
        lib.ycl_decode_rgb.argtypes = [u8p, ctypes.c_long, u8p]
        lib.ycl_decode_rgb.restype = ctypes.c_int
        lib.ycl_letterbox.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                      u8p, ctypes.c_int, ctypes.c_int]
        lib.ycl_letterbox.restype = ctypes.c_float
        lib.ycl_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.ycl_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_image(path: str) -> np.ndarray:
    """Decode a JPEG/PNG file to (H, W, 3) uint8 RGB."""
    try:
        return decode_bytes(np.fromfile(path, np.uint8))
    except ValueError as e:
        raise ValueError(f'{e} ({path})') from None


def decode_bytes(buf) -> np.ndarray:
    """Decode an in-memory JPEG/PNG byte buffer to (H, W, 3) uint8 RGB --
    the HTTP serving path (`cli/serve.py`): request bodies never touch
    disk."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native dataload unavailable')
    data = np.frombuffer(buf, np.uint8) if isinstance(buf, (bytes,
                                                            bytearray,
                                                            memoryview)) \
        else np.ascontiguousarray(buf, np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.ycl_image_info(_u8ptr(data), data.size,
                          ctypes.byref(h), ctypes.byref(w)) != 0:
        raise ValueError('cannot decode image buffer')
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.ycl_decode_rgb(_u8ptr(data), data.size, _u8ptr(out)) != 0:
        raise ValueError('image buffer decode failed')
    return out


def letterbox_u8(img: np.ndarray,
                 target_hw: Tuple[int, int]) -> Tuple[np.ndarray, float]:
    """(H, W, 3) uint8 -> ((th, tw, 3) uint8 top-left letterbox, scale)."""
    lib = _load()
    if lib is None:
        raise RuntimeError('native dataload unavailable')
    img = np.ascontiguousarray(img, np.uint8)
    th, tw = target_hw
    canvas = np.zeros((th, tw, 3), np.uint8)
    scale = lib.ycl_letterbox(_u8ptr(img), img.shape[0], img.shape[1],
                              _u8ptr(canvas), th, tw)
    return canvas, float(scale)


def load_batch(paths: Sequence[str], target_hw: Tuple[int, int],
               nthreads: int = 0
               ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Parallel decode+letterbox of image files.

    Returns (canvases (N, th, tw, 3) uint8, scales (N,) float32 -- 0.0
    marks a failed item, number of failures).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError('native dataload unavailable')
    n = len(paths)
    th, tw = target_hw
    canvases = np.zeros((n, th, tw, 3), np.uint8)
    scales = np.zeros((n,), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 4, 16)
    nfail = lib.ycl_load_batch(
        arr, n, th, tw, _u8ptr(canvases),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads)
    return canvases, scales, int(nfail)
