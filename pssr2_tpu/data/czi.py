"""Minimal ZISRAW (.czi) reader/writer (numpy only).

The reference loads Zeiss microscopy sheets via ``czifile``
(reference: pssr/data.py:579-619); that package is not in this framework's
environment, so we parse the subset PSSR needs directly:

- segments: 16-byte ASCII id + allocated/used sizes, walked sequentially
- ZISRAWSUBBLOCK payloads with DV directory entries (uncompressed,
  Gray8/Gray16/Gray32Float pixel types), assembled into a dense array by
  per-dimension start/size coordinates
- axes are reported in file order (Y/X last), consumed by the TZCXY
  normalization in :func:`pssr2_tpu.data.io.load_sheet`.

A writer (one subblock per non-XY coordinate) is provided so tests can
round-trip without Zeiss data.
"""

import struct

import numpy as np

_PIXEL_DTYPES = {0: np.uint8, 1: np.uint16, 12: np.float32}
_PIXEL_IDS = {np.dtype(np.uint8): 0, np.dtype(np.uint16): 1, np.dtype(np.float32): 12}

# Pluggable decoders for compression ids the in-repo codec does not decode
# natively (1=JPEG, 4=JpegXR).  A decoder is ``(data: bytes, dtype) ->
# bytes | ndarray``; czi_convert.py registers an imagecodecs/czifile-backed
# one when available so JpegXR acquisitions can be rewritten once into
# raw/zstd files this codec reads everywhere.
EXTRA_DECODERS = {}


def _unpack_hilo(raw: bytes, itemsize: int) -> bytes:
    """Invert the zstd1 hi/lo byte-plane packing (all low bytes, then all
    high bytes) back to interleaved 16-bit samples."""
    if itemsize == 1:
        return raw
    if itemsize != 2:
        raise NotImplementedError("czi: hi-lo packing is only defined for 16-bit pixels")
    arr = np.frombuffer(raw, dtype=np.uint8)
    half = arr.size // 2
    out = np.empty(arr.size, dtype=np.uint8)
    out[0::2] = arr[:half]
    out[1::2] = arr[half:]
    return out.tobytes()


def _decompress_subblock(compression: int, data: bytes, dtype) -> bytes:
    """Decode a subblock payload.  Supported: 0 (raw), 5 (zstd0),
    6 (zstd1 incl. hi-lo byte packing) — the formats ZEN writes by default
    (the reference reads them via czifile/imagecodecs,
    reference: pssr/data.py:579-619)."""
    if compression == 0:
        return data
    if compression in (5, 6):
        from . import zstd as _zstd

        if not _zstd.available():
            raise NotImplementedError(
                "czi: zstd-compressed subblocks require libzstd, which is not available on this system"
            )
        payload = bytes(data)
        hilo = False
        if compression == 6:  # zstd1: [header_size][chunks...] before the frame
            if not payload:
                raise ValueError("czi: empty zstd1 subblock")
            hsize = payload[0]
            if hsize < 1 or hsize > len(payload):
                raise ValueError(f"czi: bad zstd1 header size {hsize}")
            pos = 1
            while pos < hsize:
                chunk = payload[pos]
                pos += 1
                if chunk == 1:  # hiLoByteUnpackPreprocessing
                    hilo = payload[pos] != 0
                    pos += 1
                else:
                    raise NotImplementedError(f"czi: unknown zstd1 header chunk type {chunk}")
            payload = payload[hsize:]
        raw = _zstd.decompress(payload)
        return _unpack_hilo(raw, np.dtype(dtype).itemsize) if hilo else raw
    if compression in EXTRA_DECODERS:
        out = EXTRA_DECODERS[compression](bytes(data), dtype)
        return out.astype(dtype, copy=False).tobytes() if isinstance(out, np.ndarray) else out
    names = {1: "JPEG", 2: "LZW", 4: "JpegXR"}
    raise NotImplementedError(
        f"czi: {names.get(compression, f'id {compression}')}-compressed subblocks are not "
        f"supported natively; convert the file once with "
        f"`python -m pssr2_tpu.data.czi_convert in.czi out.czi` on a machine "
        f"with imagecodecs/czifile installed, or re-export uncompressed or "
        f"zstd-compressed from ZEN"
    )


def _parse_subblock(payload):
    meta_size, attach_size, data_size = struct.unpack_from("<iiq", payload, 0)
    schema = payload[16:18]
    if schema != b"DV":
        raise NotImplementedError(f"czi: unsupported directory entry schema {schema!r}")
    pixel_type, file_pos, file_part, compression = struct.unpack_from("<iqii", payload, 18)
    pyramid_type = payload[38]
    if pyramid_type != 0:
        return None, None  # pyramid (downsampled) level: skip
    # pyramid byte + 5 spare bytes at 38..43
    (dim_count,) = struct.unpack_from("<i", payload, 44)
    dims = []
    pos = 48
    for _ in range(dim_count):
        dim = payload[pos : pos + 4].rstrip(b"\x00").decode("ascii")
        start, size, _startf, stored = struct.unpack_from("<iifi", payload, pos + 4)
        dims.append((dim, start, size, stored))
        pos += 20
    entry_size = 32 + dim_count * 20
    data_offset = max(256, 16 + entry_size) + meta_size
    if pixel_type not in _PIXEL_DTYPES:
        raise NotImplementedError(f"czi: unsupported pixel type {pixel_type}")
    dtype = _PIXEL_DTYPES[pixel_type]
    data = _decompress_subblock(compression, payload[data_offset : data_offset + data_size], dtype)
    return dims, np.frombuffer(data, dtype=dtype)


def read_czi(path):
    """Parse a .czi file -> (ndarray, axes string, file order, Y/X last)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:10] != b"ZISRAWFILE":
        raise ValueError(f"{path}: not a CZI (ZISRAW) file")

    subblocks = []
    pos = 0
    while pos + 32 <= len(raw):
        seg_id = raw[pos : pos + 16].rstrip(b"\x00").decode("ascii", "replace")
        alloc, _used = struct.unpack_from("<qq", raw, pos + 16)
        payload = raw[pos + 32 : pos + 32 + alloc]
        if seg_id == "ZISRAWSUBBLOCK":
            dims, data = _parse_subblock(payload)
            if dims is not None:
                subblocks.append((dims, data))
        pos += 32 + alloc
    if not subblocks:
        raise ValueError(f"{path}: no subblocks found")

    # Global extents per dimension, axes in file order with Y, X forced last
    axes, extents = [], {}
    for dims, _ in subblocks:
        for dim, start, size, _stored in dims:
            if dim not in extents:
                extents[dim] = [start, start + size]
                axes.append(dim)
            else:
                extents[dim][0] = min(extents[dim][0], start)
                extents[dim][1] = max(extents[dim][1], start + size)
    axes = [a for a in axes if a not in ("X", "Y")] + ["Y", "X"]

    shape = tuple(extents[a][1] - extents[a][0] for a in axes)
    dtype = subblocks[0][1].dtype
    out = np.zeros(shape, dtype=dtype)

    for dims, data in subblocks:
        dim_map = {d: (s, sz) for d, s, sz, _ in dims}
        block_shape = tuple(dim_map.get(a, (0, 1))[1] for a in axes)
        block = data.reshape(block_shape)
        slicer = tuple(
            slice(dim_map.get(a, (extents[a][0], 1))[0] - extents[a][0],
                  dim_map.get(a, (extents[a][0], 1))[0] - extents[a][0] + block_shape[i])
            for i, a in enumerate(axes)
        )
        out[slicer] = block
    return out, "".join(axes)


def write_czi(path, array: np.ndarray, axes: str, compression: int = 0):
    """Write a dense array as one subblock per non-XY coordinate.

    ``axes`` names each array dim (e.g. "TZCYX"); Y and X must be last two.
    ``compression``: 0 (raw), 5 (zstd0) or 6 (zstd1 with hi-lo packing for
    16-bit data) — mirrors what ZEN emits, so the reader's compressed paths
    can be round-trip tested without Zeiss data.
    """
    array = np.asarray(array)
    if axes[-2:] not in ("YX",):
        raise ValueError("write_czi: axes must end with 'YX'")
    if array.ndim != len(axes):
        raise ValueError("write_czi: axes/array rank mismatch")
    if compression not in (0, 5, 6):
        raise ValueError(f"write_czi: unsupported compression {compression}")
    pixel_type = _PIXEL_IDS[array.dtype]

    lead_shape = array.shape[:-2]
    h, w = array.shape[-2:]

    def segment(seg_id: bytes, payload: bytes, min_alloc=0):
        alloc = max(len(payload), min_alloc)
        alloc += (-alloc) % 32  # 32-byte alignment
        head = seg_id.ljust(16, b"\x00") + struct.pack("<qq", alloc, len(payload))
        return head + payload.ljust(alloc, b"\x00")

    out = bytearray()
    out += segment(b"ZISRAWFILE", b"\x00" * 512)

    for coord in np.ndindex(*lead_shape) if lead_shape else [()]:
        plane = array[coord]
        dims = [(axes[i], coord[i], 1, 1) for i in range(len(coord))]
        dims += [("Y", 0, h, h), ("X", 0, w, w)]

        entry = b"DV" + struct.pack("<iqii", pixel_type, 0, 0, compression)
        entry += b"\x00" * 6  # pyramid byte + spare
        entry += struct.pack("<i", len(dims))
        for dim, start, size, stored in dims:
            entry += dim.encode("ascii").ljust(4, b"\x00")
            entry += struct.pack("<iifi", start, size, 0.0, stored)

        data = plane.astype(plane.dtype.newbyteorder("<"), copy=False).tobytes()
        if compression in (5, 6):
            from . import zstd as _zstd

            if compression == 6:
                if plane.dtype.itemsize == 2:  # hi-lo byte-plane packing
                    arr8 = np.frombuffer(data, dtype=np.uint8)
                    data = arr8[0::2].tobytes() + arr8[1::2].tobytes()
                    data = b"\x03\x01\x01" + _zstd.compress(data)
                else:
                    data = b"\x01" + _zstd.compress(data)
            else:
                data = _zstd.compress(data)
        header = struct.pack("<iiq", 0, 0, len(data))  # meta/attach/data sizes
        body = header + entry
        body = body.ljust(max(256, 16 + len(entry)), b"\x00") + data
        out += segment(b"ZISRAWSUBBLOCK", bytes(body))

    with open(path, "wb") as f:
        f.write(bytes(out))
