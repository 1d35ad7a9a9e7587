"""ctypes bindings for the native (C++) data-path library.

Compiles ``pssr2_tpu/native/tiffcodec.cpp`` on first use with g++ (cached as
a .so next to the source) and exposes:

- :func:`probe` / :func:`decode` / :func:`encode`: fast TIFF codec with
  LZW + PackBits support (the pure-Python codec in data/tiff.py handles
  uncompressed only and falls back to PIL otherwise)
- :func:`extract_tiles`: parallel sliding-window tile gather

All entry points return None / raise gracefully when no C++ toolchain is
available, so the pure-Python paths remain fully functional.
"""

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_DTYPES = {0: np.uint8, 1: np.uint16, 2: np.int16, 3: np.float32}
_CODES = {np.dtype(np.uint8): 0, np.dtype(np.uint16): 1, np.dtype(np.int16): 2, np.dtype(np.float32): 3}

_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    src = Path(__file__).resolve().parent.parent / "native" / "tiffcodec.cpp"
    so = src.with_suffix(".so")
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread", str(src), "-o", str(so)]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(so))

    lib.tiff_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
    lib.tiff_probe.restype = ctypes.c_int
    lib.tiff_decode.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
    lib.tiff_decode.restype = ctypes.c_int
    lib.tiff_encode.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
    lib.tiff_encode.restype = ctypes.c_int
    lib.extract_tiles_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.extract_tiles_u8.restype = ctypes.c_int
    return lib


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            if os.environ.get("PSSR2_TPU_NO_NATIVE"):
                return None
            try:
                _lib = _build_and_load()
            except Exception:
                _lib = None
        return _lib


def probe(path):
    """(pages, (h, w), dtype) via the native tag scanner, or None."""
    lib = get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 3)()
    dtype = ctypes.c_int(-1)
    if lib.tiff_probe(str(path).encode(), shape, ctypes.byref(dtype)) != 0:
        return None
    if dtype.value not in _DTYPES:
        return None
    return int(shape[0]), (int(shape[1]), int(shape[2])), _DTYPES[dtype.value]


def decode(path):
    """Full decode via the native codec (incl. LZW/PackBits), or None."""
    lib = get_lib()
    if lib is None:
        return None
    meta = probe(path)
    if meta is None:
        return None
    pages, (h, w), dtype = meta
    out = np.empty((pages, h, w), dtype=dtype)
    rc = lib.tiff_decode(str(path).encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
    if rc != 0:
        return None
    return out[0] if pages == 1 else out


def encode(path, image):
    """Native uncompressed write; returns False when unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    image = np.ascontiguousarray(image)
    if image.ndim == 2:
        image = image[np.newaxis]
    code = _CODES.get(image.dtype)
    if code is None or image.ndim != 3:
        return False
    rc = lib.tiff_encode(
        str(path).encode(), image.ctypes.data_as(ctypes.c_void_p),
        image.shape[0], image.shape[1], image.shape[2], code,
    )
    return rc == 0


def extract_tiles(sheet: np.ndarray, coords: np.ndarray, frames: int, size: int):
    """Parallel tile gather: sheet (C, H, W) uint8, coords (n, 3) int64 of
    (frame0, y0, x0) -> (n, frames, size, size) uint8; None if unavailable."""
    lib = get_lib()
    if lib is None or sheet.dtype != np.uint8:
        return None
    sheet = np.ascontiguousarray(sheet)
    coords = np.ascontiguousarray(coords, dtype=np.int64)
    n = coords.shape[0]
    out = np.empty((n, frames, size, size), dtype=np.uint8)
    rc = lib.extract_tiles_u8(
        sheet.ctypes.data_as(ctypes.c_void_p),
        sheet.shape[0], sheet.shape[1], sheet.shape[2],
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, frames, size,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError("extract_tiles: coordinates out of bounds")
    return out
