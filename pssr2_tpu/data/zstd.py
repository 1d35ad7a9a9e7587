"""Minimal zstd bind via the system libzstd (ctypes; no pip deps).

Used for compressed CZI subblocks (Zeiss writes zstd0/zstd1 since ZEN blue
3.1; the reference handles them through czifile/imagecodecs, which are not
in this environment).  Gracefully absent when libzstd isn't installed —
callers raise a clear error naming the missing capability.
"""

import ctypes
import ctypes.util

_lib = None
_checked = False


def get_lib():
    """The loaded libzstd, or None if unavailable."""
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    name = ctypes.util.find_library("zstd") or "libzstd.so.1"
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
    lib.ZSTD_getFrameContentSize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_decompress.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def compress(data: bytes, level: int = 3) -> bytes:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libzstd is not available on this system")
    bound = lib.ZSTD_compressBound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress(out, bound, data, len(data), level)
    if lib.ZSTD_isError(n):
        raise RuntimeError("zstd compression failed")
    return out.raw[:n]


def decompress(data: bytes, expected_size: int = None) -> bytes:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libzstd is not available on this system")
    size = expected_size
    if size is None:
        size = lib.ZSTD_getFrameContentSize(data, len(data))
        if size in (2**64 - 1, 2**64 - 2):  # ERROR / UNKNOWN
            raise ValueError("zstd frame does not declare its content size; pass expected_size")
        size = int(size)
    out = ctypes.create_string_buffer(size)
    n = lib.ZSTD_decompress(out, size, data, len(data))
    if lib.ZSTD_isError(n):
        raise RuntimeError("zstd decompression failed (corrupt frame?)")
    return out.raw[:n]
