"""Codec robustness: malformed/truncated inputs must raise clean Python
exceptions (never crash, hang, or return garbage silently) — production
data loaders see corrupt files.  Exercises both the pure-Python parsers
(data/tiff.py, data/czi.py) and the native C++ fast path's fallback."""

import numpy as np
import pytest

from pssr2_tpu.data import czi, tiff


def _write(p, data: bytes):
    p.write_bytes(data)
    return str(p)


def test_tiff_not_a_tiff(tmp_path):
    with pytest.raises(ValueError):
        tiff.imread(_write(tmp_path / "junk.tif", b"not a tiff at all" * 10))


def test_tiff_empty_file(tmp_path):
    with pytest.raises(Exception):
        tiff.imread(_write(tmp_path / "empty.tif", b""))


def test_tiff_truncated_header(tmp_path):
    # valid magic, then nothing
    with pytest.raises(Exception):
        tiff.imread(_write(tmp_path / "trunc.tif", b"II*\x00"))


@pytest.mark.parametrize("cut", [0.2, 0.5, 0.9])
def test_tiff_truncated_body(tmp_path, cut):
    good = tmp_path / "good.tif"
    tiff.imwrite(str(good), np.arange(64 * 64, dtype=np.uint16).reshape(64, 64) % 251)
    data = good.read_bytes()
    bad = _write(tmp_path / "cut.tif", data[: int(len(data) * cut)])
    with pytest.raises(Exception):
        tiff.imread(bad)


def test_tiff_random_bytes(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(5):
        blob = rng.integers(0, 256, rng.integers(8, 4096), dtype=np.uint8).tobytes()
        # force plausible magics on some trials
        if i % 2:
            blob = b"II*\x00" + blob
        with pytest.raises(Exception):
            tiff.imread(_write(tmp_path / f"rand{i}.tif", blob))


def test_czi_not_a_czi(tmp_path):
    with pytest.raises(ValueError):
        czi.read_czi(_write(tmp_path / "junk.czi", b"GARBAGE!" * 64))


def test_czi_truncated(tmp_path):
    good = tmp_path / "good.czi"
    czi.write_czi(str(good), np.zeros((2, 16, 16), np.uint8), "ZYX")
    data = good.read_bytes()
    for cut in (0.3, 0.7, 0.95):
        bad = _write(tmp_path / "cut.czi", data[: int(len(data) * cut)])
        with pytest.raises(Exception):
            czi.read_czi(bad)


def test_czi_no_subblocks(tmp_path):
    # valid magic segment header but no subblock segments follow
    blob = b"ZISRAWFILE" + b"\x00" * 118
    with pytest.raises(Exception):
        czi.read_czi(_write(tmp_path / "empty.czi", blob))


def test_tiff_roundtrip_survives_fuzz_neighbors(tmp_path):
    """A good file still decodes correctly after fuzz attempts (no global
    state corruption in the native codec)."""
    good = tmp_path / "good.tif"
    img = (np.random.default_rng(1).random((32, 48)) * 255).astype(np.uint8)
    tiff.imwrite(str(good), img)
    try:
        tiff.imread(_write(tmp_path / "junk.tif", b"\xff" * 333))
    except Exception:
        pass
    np.testing.assert_array_equal(tiff.imread(str(good)), img)
