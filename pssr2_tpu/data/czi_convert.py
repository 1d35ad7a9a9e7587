"""One-time conversion of JPEG/JpegXR-compressed .czi files into files the
in-repo ZISRAW codec reads natively.

``data/czi.py`` decodes raw + zstd0/zstd1 subblocks — everything ZEN
writes by default.  JpegXR-compressed acquisitions (compression id 4, read
by the reference through czifile/imagecodecs' bundled jxrlib —
reference: pssr/data.py:579-619) need a JXR decoder this environment does
not provide, and a from-scratch T.832 decoder could not be validated here
(no encoder or sample bitstreams exist in the image to test against).
This utility instead rewrites such files ONCE — on any machine where
``imagecodecs`` (or ``czifile``) is pip-installable, or with a custom
``decoder`` callable — into raw/zstd CZIs that load identically
everywhere afterwards.  Alternative: re-export uncompressed from ZEN.

CLI::

    python -m pssr2_tpu.data.czi_convert in.czi out.czi [--compression raw|zstd0|zstd1]
"""

import argparse

import numpy as np

from . import czi as _czi

_COMPRESSION_NAMES = {"raw": 0, "zstd0": 5, "zstd1": 6}


def external_jxr_decoder():
    """A JpegXR decoder backed by imagecodecs (directly or via czifile's
    vendored copy), or None when neither is installed."""
    try:
        from imagecodecs import jpegxr_decode
    except ImportError:
        try:  # czifile depends on imagecodecs; try its import path too
            from czifile.czifile import imagecodecs as _ic

            jpegxr_decode = _ic.jpegxr_decode
        except Exception:
            return None

    def decode(data: bytes, dtype) -> bytes:
        return np.ascontiguousarray(jpegxr_decode(data)).astype(dtype, copy=False).tobytes()

    return decode


def convert_czi(src, dst, decoder=None, compression: int = 0):
    """Rewrite ``src`` as a natively-readable CZI at ``dst``.

    ``decoder``: optional ``(bytes, dtype) -> bytes | ndarray`` for JpegXR
    subblocks; defaults to :func:`external_jxr_decoder` when available.
    ``compression``: output subblock compression (0 raw, 5 zstd0, 6 zstd1).

    Returns ``(axes, shape)`` of the converted image.  Raises the codec's
    ``NotImplementedError`` when the file needs a JXR decoder and none is
    available.
    """
    decoder = decoder if decoder is not None else external_jxr_decoder()
    registered = []
    if decoder is not None:
        for comp_id in (1, 4):  # JPEG, JpegXR — the imagecodecs-decodable ids
            if comp_id not in _czi.EXTRA_DECODERS:
                _czi.EXTRA_DECODERS[comp_id] = decoder
                registered.append(comp_id)
    try:
        array, axes = _czi.read_czi(src)
    finally:
        for comp_id in registered:
            _czi.EXTRA_DECODERS.pop(comp_id, None)
    _czi.write_czi(dst, array, axes, compression=compression)
    return axes, array.shape


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("src", help="input .czi (possibly JpegXR-compressed)")
    parser.add_argument("dst", help="output .czi (natively readable)")
    parser.add_argument(
        "--compression", choices=sorted(_COMPRESSION_NAMES), default="raw",
        help="output subblock compression (default raw)",
    )
    args = parser.parse_args(argv)
    axes, shape = convert_czi(args.src, args.dst, compression=_COMPRESSION_NAMES[args.compression])
    print(f"wrote {args.dst}: axes {axes}, shape {shape}")


if __name__ == "__main__":
    main()
