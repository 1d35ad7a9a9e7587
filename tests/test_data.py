"""Dataset tests: the reference's shape/length contracts
(reference: tests/test_data.py) plus codec round-trips and fast-path checks."""

import numpy as np
import pytest

from pssr2_tpu.data import (
    ImageDataset,
    PairedImageDataset,
    PairedSlidingDataset,
    SlidingDataset,
    preprocess_dataset,
)
from pssr2_tpu.data import czi, tiff

from _util import CROP_RES, HR_RES, LR_RES, get_shape, make_tifs

N_IMAGES = 5
N_CHANNELS = 10
N_FRAMES = 2
TILE_MULT = 2


def test_tiff_roundtrip(tmp_path):
    for dtype in [np.uint8, np.uint16, np.float32]:
        for shape in [(32, 48), (3, 32, 48)]:
            arr = (np.random.rand(*shape) * 255).astype(dtype)
            tiff.imwrite(tmp_path / "x.tif", arr)
            back = tiff.imread(tmp_path / "x.tif")
            np.testing.assert_array_equal(back, arr)
    n, size = tiff.num_pages_and_size(tmp_path / "x.tif")
    assert n == 3 and size == (32, 48)


def test_tiff_pil_interop(tmp_path):
    # PIL can read what we write
    from PIL import Image

    arr = (np.random.rand(40, 40) * 255).astype(np.uint8)
    tiff.imwrite(tmp_path / "x.tif", arr)
    np.testing.assert_array_equal(np.asarray(Image.open(tmp_path / "x.tif")), arr)
    # and we can read what PIL writes
    Image.fromarray(arr).save(tmp_path / "y.tif")
    np.testing.assert_array_equal(tiff.imread(tmp_path / "y.tif"), arr)


def test_czi_roundtrip(tmp_path):
    arr = (np.random.rand(3, 2, 1, 64, 48) * 255).astype(np.uint8)
    czi.write_czi(tmp_path / "x.czi", arr, "TZCYX")
    back, axes = czi.read_czi(tmp_path / "x.czi")
    assert axes == "TZCYX"
    np.testing.assert_array_equal(back, arr)


def test_imagedataset(tmp_path):
    # Single frame
    make_tifs(tmp_path / "sf", get_shape(HR_RES, batch=N_IMAGES))
    dataset = ImageDataset(tmp_path / "sf")
    assert str(dataset)
    assert len(dataset) == N_IMAGES

    hr, lr = dataset[0]
    assert tuple(hr.shape) == get_shape(HR_RES, batch=0)
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0)

    # Multi frame
    make_tifs(tmp_path / "mf", get_shape(HR_RES, batch=N_IMAGES, channels=N_CHANNELS))
    dataset = ImageDataset(tmp_path / "mf", n_frames=N_FRAMES)
    assert len(dataset) == N_IMAGES * (N_CHANNELS // N_FRAMES)

    hr, lr = dataset[0]
    assert tuple(hr.shape) == get_shape(HR_RES, batch=0, channels=N_FRAMES)
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0, channels=N_FRAMES)

    # LR mode
    make_tifs(tmp_path / "lr", get_shape(LR_RES, batch=N_IMAGES))
    dataset = ImageDataset(tmp_path / "lr", val_split=1)
    assert len(dataset) == N_IMAGES
    assert dataset.is_lr
    lr = dataset[0]
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0)

    # Crop res
    make_tifs(tmp_path / "crop", get_shape(CROP_RES, batch=N_IMAGES))
    dataset = ImageDataset(tmp_path / "crop")
    assert len(dataset) == N_IMAGES
    assert dataset.crop_res == CROP_RES
    hr, lr = dataset[0]
    assert tuple(hr.shape) == get_shape(HR_RES, batch=0)
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0)


def test_slidingdataset(tmp_path):
    make_tifs(tmp_path / "sf", get_shape(HR_RES * TILE_MULT, batch=N_IMAGES))
    dataset = SlidingDataset(tmp_path / "sf", extension="tif", overlap=None, preload=False)
    assert str(dataset)
    assert len(dataset) == N_IMAGES * TILE_MULT**2

    hr, lr = dataset[0]
    assert tuple(hr.shape) == get_shape(HR_RES, batch=0)
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0)

    # Preload
    dataset = SlidingDataset(tmp_path / "sf", extension="tif", overlap=None, preload=True)
    assert dataset.preload

    # Multi frame
    make_tifs(tmp_path / "mf", get_shape(HR_RES * TILE_MULT, batch=N_IMAGES, channels=N_CHANNELS))
    dataset = SlidingDataset(tmp_path / "mf", n_frames=N_FRAMES, extension="tif", overlap=None, preload=False)
    assert len(dataset) == N_IMAGES * (N_CHANNELS // N_FRAMES) * TILE_MULT**2

    hr, lr = dataset[0]
    assert tuple(hr.shape) == get_shape(HR_RES, batch=0, channels=N_FRAMES)
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0, channels=N_FRAMES)

    # LR mode
    make_tifs(tmp_path / "lr", get_shape(LR_RES * TILE_MULT, batch=N_IMAGES))
    dataset = SlidingDataset(
        tmp_path / "lr", hr_res=LR_RES, lr_scale=-1, extension="tif", overlap=None, preload=False, val_split=1
    )
    assert len(dataset) == N_IMAGES * TILE_MULT**2
    assert dataset.is_lr
    lr = dataset[0]
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0)

    # slide mode over the stack dimension
    dataset = SlidingDataset(
        tmp_path / "mf", n_frames=N_FRAMES, slide=True, extension="tif", overlap=None, preload=False
    )
    assert len(dataset) == N_IMAGES * (N_CHANNELS - N_FRAMES + 1) * TILE_MULT**2


def test_slidingdataset_czi(tmp_path):
    import os

    os.makedirs(tmp_path / "czi", exist_ok=True)
    arr = (np.random.rand(4, 1, 1, HR_RES, HR_RES) * 200).astype(np.uint8)
    czi.write_czi(tmp_path / "czi" / "sheet.czi", arr, "TZCYX")
    dataset = SlidingDataset(tmp_path / "czi", extension="czi", overlap=None, preload=False, n_frames=2)
    assert len(dataset) == 2  # 4 T-frames // 2, one tile
    hr, lr = dataset[0]
    assert tuple(hr.shape) == (2, HR_RES, HR_RES)
    assert tuple(lr.shape) == (2, LR_RES, LR_RES)


def test_pairedimagedataset(tmp_path):
    make_tifs(tmp_path / "sf_hr", get_shape(HR_RES, batch=N_IMAGES))
    make_tifs(tmp_path / "sf_lr", get_shape(LR_RES, batch=N_IMAGES))
    dataset = PairedImageDataset(tmp_path / "sf_hr", tmp_path / "sf_lr")
    assert str(dataset)
    assert len(dataset) == N_IMAGES

    hr, lr = dataset[0]
    assert tuple(hr.shape) == get_shape(HR_RES, batch=0)
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0)

    make_tifs(tmp_path / "mf_hr", get_shape(HR_RES, batch=N_IMAGES, channels=N_CHANNELS))
    make_tifs(tmp_path / "mf_lr", get_shape(LR_RES, batch=N_IMAGES, channels=N_CHANNELS))
    dataset = PairedImageDataset(tmp_path / "mf_hr", tmp_path / "mf_lr", n_frames=N_FRAMES)
    assert len(dataset) == N_IMAGES * (N_CHANNELS // N_FRAMES)

    hr, lr = dataset[0]
    assert tuple(hr.shape) == get_shape(HR_RES, batch=0, channels=N_FRAMES)
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0, channels=N_FRAMES)


def test_pairedslidingdataset(tmp_path):
    make_tifs(tmp_path / "sf_hr", get_shape(HR_RES * TILE_MULT, batch=N_IMAGES))
    make_tifs(tmp_path / "sf_lr", get_shape(LR_RES * TILE_MULT, batch=N_IMAGES))
    dataset = PairedSlidingDataset(tmp_path / "sf_hr", tmp_path / "sf_lr", extension="tif", overlap=None, preload=False)
    assert str(dataset)
    assert len(dataset) == N_IMAGES * TILE_MULT**2

    hr, lr = dataset[0]
    assert tuple(hr.shape) == get_shape(HR_RES, batch=0)
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0)

    dataset = PairedSlidingDataset(tmp_path / "sf_hr", tmp_path / "sf_lr", extension="tif", overlap=None, preload=True)
    assert dataset.preload

    make_tifs(tmp_path / "mf_hr", get_shape(HR_RES * TILE_MULT, batch=N_IMAGES, channels=N_CHANNELS))
    make_tifs(tmp_path / "mf_lr", get_shape(LR_RES * TILE_MULT, batch=N_IMAGES, channels=N_CHANNELS))
    dataset = PairedSlidingDataset(
        tmp_path / "mf_hr", tmp_path / "mf_lr", n_frames=N_FRAMES, extension="tif", overlap=None, preload=False
    )
    assert len(dataset) == N_IMAGES * (N_CHANNELS // N_FRAMES) * TILE_MULT**2

    hr, lr = dataset[0]
    assert tuple(hr.shape) == get_shape(HR_RES, batch=0, channels=N_FRAMES)
    assert tuple(lr.shape) == get_shape(LR_RES, batch=0, channels=N_FRAMES)


def test_preprocess_and_names(tmp_path):
    make_tifs(tmp_path / "images", get_shape(HR_RES, batch=2))
    dataset = ImageDataset(tmp_path / "images")
    preprocess_dataset(dataset, preprocess_hr=True, out_dir=str(tmp_path / "pp"))
    lr_files = sorted((tmp_path / "pp" / "lr").glob("*.tif"))
    hr_files = sorted((tmp_path / "pp" / "hr").glob("*.tif"))
    assert len(lr_files) == len(hr_files) == 2
    assert tiff.imread(lr_files[0]).shape[-1] == LR_RES


def test_hr_patch_fast_path(tmp_path):
    make_tifs(tmp_path / "images", get_shape(HR_RES, batch=3))
    dataset = ImageDataset(tmp_path / "images", rotation=False)
    patch = dataset.hr_patch(0)
    assert patch.dtype == np.uint8
    assert patch.shape == (1, HR_RES, HR_RES)
    # matches the host parity path HR output (no rotation on val idx)
    hr, _ = dataset.__getitem__(0, pp=True)
    np.testing.assert_array_equal(patch.astype(np.float32), hr)


def test_extra_path(tmp_path):
    make_tifs(tmp_path / "images", get_shape(HR_RES, batch=3))
    dataset = ImageDataset(tmp_path / "images", extra_path=tmp_path / "images")
    (hr, lr), extra = dataset[0]
    assert extra.shape == hr.shape


def test_native_codec(tmp_path):
    from pssr2_tpu.data import native

    if native.get_lib() is None:
        import pytest

        pytest.skip("no C++ toolchain")

    # encode/decode round trip per dtype
    for dtype in [np.uint8, np.uint16, np.float32]:
        arr = (np.random.rand(3, 40, 56) * 255).astype(dtype)
        assert native.encode(tmp_path / "n.tif", arr)
        back = native.decode(tmp_path / "n.tif")
        np.testing.assert_array_equal(back, arr)
        pages, size, dt = native.probe(tmp_path / "n.tif")
        assert (pages, size, dt) == (3, (40, 56), dtype)

    # interop: native reads python-written, python reads native-written
    arr = (np.random.rand(32, 32) * 255).astype(np.uint8)
    tiff.imwrite(tmp_path / "p.tif", arr)
    np.testing.assert_array_equal(native.decode(tmp_path / "p.tif"), arr)

    # PIL-written LZW-compressed file decodes through the native codec
    from PIL import Image

    try:
        Image.fromarray(arr).save(tmp_path / "lzw.tif", compression="tiff_lzw")
    except Exception:
        pass
    else:
        np.testing.assert_array_equal(tiff.imread(tmp_path / "lzw.tif"), arr)

    # parallel tile extraction matches numpy slicing
    sheet = (np.random.rand(4, 128, 128) * 255).astype(np.uint8)
    coords = np.array([[0, 0, 0], [2, 64, 64], [0, 32, 96]], dtype=np.int64)
    tiles = native.extract_tiles(sheet, coords, frames=2, size=32)
    assert tiles.shape == (3, 2, 32, 32)
    for t, (f0, y0, x0) in enumerate(coords):
        np.testing.assert_array_equal(tiles[t], sheet[f0 : f0 + 2, y0 : y0 + 32, x0 : x0 + 32])


def test_sliding_hr_patch_batch_matches_scalar(tmp_path):
    from pssr2_tpu.data import native

    make_tifs(tmp_path / "sheets", get_shape(HR_RES * TILE_MULT, batch=2, channels=4))
    dataset = SlidingDataset(
        tmp_path / "sheets", n_frames=2, extension="tif", overlap=64, preload=True, rotation=False
    )
    indices = list(range(len(dataset)))
    batch = dataset.hr_patch_batch(indices)
    if batch is None:
        import pytest

        pytest.skip("native extractor unavailable")
    for pos, idx in enumerate(indices):
        np.testing.assert_array_equal(batch[pos], dataset.hr_patch(idx))


def test_load_sheet_stack_modes(tmp_path):
    # stack flattening order semantics for czi sheets (T=3, Z=2)
    from pssr2_tpu.data.io import load_sheet

    arr = np.zeros((3, 2, 1, 8, 8), dtype=np.uint8)
    for t in range(3):
        for z in range(2):
            arr[t, z] = t * 10 + z
    czi.write_czi(tmp_path / "s.czi", arr, "TZCYX")

    tz = load_sheet(tmp_path, "s.czi", "TZ", "L")
    assert tz.shape == (6, 8, 8)
    # TZ: T-major flattening
    ratio = 255 / 21  # sheets are max-normalized to uint8
    np.testing.assert_allclose(tz[:, 0, 0], np.round(np.array([0, 1, 10, 11, 20, 21]) * ratio).astype(np.uint8), atol=1)

    zt = load_sheet(tmp_path, "s.czi", "ZT", "L")
    np.testing.assert_allclose(zt[:, 0, 0], np.round(np.array([0, 10, 20, 1, 11, 21]) * ratio).astype(np.uint8), atol=1)

    t_only = load_sheet(tmp_path, "s.czi", "T", "L")
    assert t_only.shape == (3, 8, 8)
    z_only = load_sheet(tmp_path, "s.czi", "Z", "L")
    assert z_only.shape == (2, 8, 8)


def test_asymmetric_n_frames(tmp_path):
    # 2.5-D: 3 HR frames supervised from 1 LR frame (n_frames=[lr, hr])
    make_tifs(tmp_path / "mf", get_shape(HR_RES, batch=2, channels=6))
    dataset = ImageDataset(tmp_path / "mf", n_frames=[1, 3])
    assert len(dataset) == 2 * (6 // 3)
    hr, lr = dataset[0]
    assert hr.shape == (3, HR_RES, HR_RES)
    assert lr.shape == (1, LR_RES, LR_RES)


def test_imagedataset_preload(tmp_path):
    make_tifs(tmp_path / "mf", get_shape(HR_RES, batch=3, channels=4))
    plain = ImageDataset(tmp_path / "mf", n_frames=2, rotation=False)
    cached = ImageDataset(tmp_path / "mf", n_frames=2, rotation=False, preload=True)
    assert len(cached.preload) == 3
    for idx in range(len(plain)):
        a = plain.__getitem__(idx, pp=True)
        b = cached.__getitem__(idx, pp=True)
        np.testing.assert_array_equal(a[0], b[0])  # hr identical
        np.testing.assert_array_equal(cached.hr_patch(idx), plain.hr_patch(idx))


def test_png_extension(tmp_path):
    from PIL import Image

    (tmp_path / "png").mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        Image.fromarray((rng.random((HR_RES, HR_RES)) * 255).astype(np.uint8)).save(tmp_path / "png" / f"i{i}.png")
    dataset = ImageDataset(tmp_path / "png", extension="png")
    assert len(dataset) == 3
    hr, lr = dataset[0]
    assert hr.shape == (1, HR_RES, HR_RES) and lr.shape == (1, LR_RES, LR_RES)


def test_val_split_seed_none(tmp_path):
    # seed=None: last images held out, no shuffle (reference data.py:717-721)
    from pssr2_tpu.data.indexing import get_val_idx, invert_idx

    val = get_val_idx([1, 1, 1, 1], split=0.25, seed=None)
    assert val == [3]
    assert list(invert_idx(val, 4)) == [0, 1, 2]


def test_preprocess_then_paired_workflow(tmp_path):
    # reference workflow: materialize crappified tiles, then train from the
    # pre-generated pairs with PairedImageDataset
    make_tifs(tmp_path / "images", get_shape(HR_RES, batch=3))
    dataset = ImageDataset(tmp_path / "images")
    preprocess_dataset(dataset, preprocess_hr=True, out_dir=str(tmp_path / "pp"))

    paired = PairedImageDataset(tmp_path / "pp" / "hr", tmp_path / "pp" / "lr")
    assert len(paired) == 3
    hr, lr = paired.__getitem__(0, pp=True)
    assert hr.shape == (1, HR_RES, HR_RES)
    assert lr.shape == (1, LR_RES, LR_RES)
    # pairs match what preprocess wrote
    name = paired._get_name(0)
    want_lr = tiff.imread(tmp_path / "pp" / "lr" / f"{name}.tif")
    np.testing.assert_array_equal(lr.squeeze().astype(np.uint8), want_lr)


def test_czi_mosaic_subblocks(tmp_path):
    """Multiple subblocks with start offsets assemble into one plane
    (mosaic-style czi, as real Zeiss exports produce)."""
    import struct

    full = (np.random.default_rng(4).random((1, 1, 1, 16, 32)) * 255).astype(np.uint8)
    # write two side-by-side X-half subblocks by hand using the writer's
    # segment layout
    left, right = full[..., :16], full[..., 16:]

    def segment(seg_id, payload, out):
        alloc = len(payload) + (-len(payload)) % 32
        out += seg_id.ljust(16, b"\x00") + struct.pack("<qq", alloc, len(payload))
        out += payload.ljust(alloc, b"\x00")

    def subblock(plane, x_start):
        dims = [("T", 0, 1, 1), ("Z", 0, 1, 1), ("C", 0, 1, 1), ("Y", 0, 16, 16), ("X", x_start, 16, 16)]
        entry = b"DV" + struct.pack("<iqii", 0, 0, 0, 0) + b"\x00" * 6 + struct.pack("<i", len(dims))
        for d, s, sz, st in dims:
            entry += d.encode().ljust(4, b"\x00") + struct.pack("<iifi", s, sz, 0.0, st)
        data = plane.tobytes()
        body = struct.pack("<iiq", 0, 0, len(data)) + entry
        return body.ljust(max(256, 16 + len(entry)), b"\x00") + data

    out = bytearray()
    segment(b"ZISRAWFILE", b"\x00" * 512, out)
    segment(b"ZISRAWSUBBLOCK", subblock(left.squeeze((0, 1, 2)), 0), out)
    segment(b"ZISRAWSUBBLOCK", subblock(right.squeeze((0, 1, 2)), 16), out)
    (tmp_path / "m.czi").write_bytes(bytes(out))

    arr, axes = czi.read_czi(tmp_path / "m.czi")
    assert axes.endswith("YX")
    np.testing.assert_array_equal(arr.reshape(16, 32), full.squeeze())


def test_index_arithmetic_fuzz():
    """Randomized configs: flat-index maps are a bijection onto
    (image, tile, slice) triples; val/train indices partition the dataset."""
    from pssr2_tpu.data.indexing import get_image_idx, get_val_idx, invert_idx

    rng = np.random.default_rng(0)
    for _ in range(50):
        n_images = int(rng.integers(1, 6))
        slices = [int(rng.integers(1, 5)) for _ in range(n_images)]
        with_tiles = bool(rng.integers(0, 2))
        tiles = [int(rng.integers(1, 4)) for _ in range(n_images)] if with_tiles else None

        total = sum(s * t for s, t in zip(slices, tiles or [1] * n_images))
        seen = set()
        for flat in range(total):
            image_idx, res = get_image_idx(flat, slices, tiles)
            assert 0 <= image_idx < n_images
            cap = slices[image_idx] * (tiles[image_idx] if tiles else 1)
            assert 0 <= res < cap
            seen.add((image_idx, res))
        assert len(seen) == total  # bijection

        split = float(rng.uniform(0.05, 1.0))
        seed = int(rng.integers(0, 100))
        val = get_val_idx(slices, split, seed, tiles)
        assert len(val) >= min(slices)  # always >= 1 image's worth
        train = list(invert_idx(val, total))
        assert sorted(val + train) == list(range(total))  # exact partition
        # deterministic under the same seed
        assert val == get_val_idx(slices, split, seed, tiles)


def test_extra_path_shape_validation(tmp_path):
    """Mismatched extra-image shapes are rejected at init with the
    reference's explanatory error (reference: pssr/data.py:76-80), not as
    an opaque stacking failure mid-training (ADVICE r1)."""
    from pssr2_tpu.data.tiff import imwrite

    make_tifs(tmp_path / "images", get_shape(128, batch=2))
    (tmp_path / "extra").mkdir()
    for idx in range(2):
        imwrite(
            f"{tmp_path}/extra/temp_tif_{idx}.tif",
            (np.random.rand(96, 96) * 255).astype(np.uint8),
        )
    with pytest.raises(ValueError, match="does not have the correct shape"):
        ImageDataset(tmp_path / "images", hr_res=128, extra_path=tmp_path / "extra")
    # matching shapes with extra_scale pass
    (tmp_path / "extra2").mkdir()
    for idx in range(2):
        imwrite(
            f"{tmp_path}/extra2/temp_tif_{idx}.tif",
            (np.random.rand(256, 256) * 255).astype(np.uint8),
        )
    ImageDataset(tmp_path / "images", hr_res=128, extra_path=tmp_path / "extra2", extra_scale=2)


def test_extra_path_frames_validation(tmp_path):
    """Frame-count mismatch between path and extra_path raises at init
    unless n_frames is None (reference: pssr/data.py:80)."""
    from pssr2_tpu.data.tiff import imwrite

    (tmp_path / "images").mkdir()
    (tmp_path / "extra").mkdir()
    imwrite(f"{tmp_path}/images/a.tif", (np.random.rand(4, 64, 64) * 255).astype(np.uint8))
    imwrite(f"{tmp_path}/extra/a.tif", (np.random.rand(2, 64, 64) * 255).astype(np.uint8))
    with pytest.raises(ValueError, match="correct number of frames"):
        ImageDataset(tmp_path / "images", hr_res=64, n_frames=2, extra_path=tmp_path / "extra")
    # n_frames=None tolerates unequal frame counts (reference semantics)
    ImageDataset(tmp_path / "images", hr_res=64, n_frames=None, extra_path=tmp_path / "extra")


def test_sliding_extra_path_shape_validation(tmp_path):
    from pssr2_tpu.data.tiff import imwrite

    (tmp_path / "sheets").mkdir()
    (tmp_path / "extra").mkdir()
    imwrite(f"{tmp_path}/sheets/a.tif", (np.random.rand(2, 256, 256) * 255).astype(np.uint8))
    imwrite(f"{tmp_path}/extra/a.tif", (np.random.rand(2, 200, 256) * 255).astype(np.uint8))
    with pytest.raises(ValueError, match="does not have the correct shape"):
        SlidingDataset(tmp_path / "sheets", hr_res=128, overlap=0, extra_path=tmp_path / "extra")


def test_hr_patch_batch_mixed_frame_counts(tmp_path):
    """n_frames=None + preloaded sheets with differing frame counts: the
    native batched gather must fall back (return None) instead of
    mis-shaping other sheets' tiles (ADVICE r1)."""
    from pssr2_tpu.data.tiff import imwrite

    (tmp_path / "sheets").mkdir()
    imwrite(f"{tmp_path}/sheets/a.tif", (np.random.rand(2, 128, 128) * 255).astype(np.uint8))
    imwrite(f"{tmp_path}/sheets/b.tif", (np.random.rand(3, 128, 128) * 255).astype(np.uint8))
    dataset = SlidingDataset(
        tmp_path / "sheets", hr_res=64, overlap=0, n_frames=None, preload=True, rotation=False
    )
    batch = dataset.hr_patch_batch(list(range(len(dataset))))
    assert batch is None  # host fallback; PatchLoader then goes per-index
    # and the per-index path still works for every index
    for idx in range(len(dataset)):
        assert dataset.hr_patch(idx).shape[-1] == 64


def test_prefetch_propagates_loader_errors():
    """Loader exceptions must surface in the consumer, not silently end the
    epoch early (ADVICE r1)."""
    from pssr2_tpu.data.pipeline import prefetch_to_device

    def bad_iter():
        yield np.zeros((2, 1, 8, 8), np.uint8), 2
        raise RuntimeError("corrupt file")

    it = prefetch_to_device(bad_iter())
    next(it)
    with pytest.raises(RuntimeError, match="corrupt file"):
        next(it)


def test_czi_zstd_roundtrip(tmp_path):
    """zstd0 and zstd1 (hi-lo packed 16-bit) compressed subblocks decode to
    the original data — the formats ZEN writes by default (VERDICT r1 #6;
    the reference reads them via czifile, pssr/data.py:579-619)."""
    from pssr2_tpu.data import zstd as _zstd

    if not _zstd.available():
        pytest.skip("libzstd unavailable")

    rng = np.random.default_rng(0)
    # zstd0, uint8
    data8 = (rng.random((3, 40, 48)) * 255).astype(np.uint8)
    czi.write_czi(tmp_path / "z0.czi", data8, "ZYX", compression=5)
    arr, axes = czi.read_czi(tmp_path / "z0.czi")
    assert axes == "ZYX"
    np.testing.assert_array_equal(arr, data8)
    # zstd1 + hi-lo packing, uint16
    data16 = (rng.random((2, 32, 32)) * 65535).astype(np.uint16)
    czi.write_czi(tmp_path / "z1.czi", data16, "TYX", compression=6)
    arr, axes = czi.read_czi(tmp_path / "z1.czi")
    np.testing.assert_array_equal(arr, data16)
    # zstd1 without packing, uint8
    czi.write_czi(tmp_path / "z1b.czi", data8, "ZYX", compression=6)
    arr, _ = czi.read_czi(tmp_path / "z1b.czi")
    np.testing.assert_array_equal(arr, data8)
    # compressed files are actually smaller than raw for compressible data
    smooth = np.tile(np.arange(64, dtype=np.uint8), (3, 64, 1))
    czi.write_czi(tmp_path / "raw.czi", smooth, "ZYX", compression=0)
    czi.write_czi(tmp_path / "cmp.czi", smooth, "ZYX", compression=5)
    assert (tmp_path / "cmp.czi").stat().st_size < (tmp_path / "raw.czi").stat().st_size


def test_czi_unsupported_compression_message(tmp_path):
    """Still-unsupported codecs (JpegXR) raise a clear, named error instead
    of garbage data (VERDICT r1 #6 graceful-error requirement)."""
    data = (np.random.default_rng(0).random((1, 16, 16)) * 255).astype(np.uint8)
    czi.write_czi(tmp_path / "x.czi", data, "ZYX", compression=0)
    raw = bytearray((tmp_path / "x.czi").read_bytes())
    # patch the subblock's compression field (offset: segment header 32 +
    # 512-byte ZISRAWFILE payload + next segment header 32 + SUBBLOCK fixed
    # 16 + 'DV' 2 + pixel_type 4 + file_pos 8 + file_part 4)
    off = raw.find(b"ZISRAWSUBBLOCK")
    comp_off = off + 32 + 16 + 2 + 4 + 8 + 4
    import struct

    raw[comp_off : comp_off + 4] = struct.pack("<i", 4)  # JpegXR
    (tmp_path / "x.czi").write_bytes(bytes(raw))
    with pytest.raises(NotImplementedError, match="JpegXR"):
        czi.read_czi(tmp_path / "x.czi")


def test_bigtiff_roundtrip(tmp_path):
    """BigTIFF (magic 43, 8-byte offsets) reads through both the native C++
    codec and the pure-Python fallback (VERDICT r1 #6)."""
    from pssr2_tpu.data import native

    rng = np.random.default_rng(0)
    for dtype, name in [(np.uint8, "u8"), (np.uint16, "u16"), (np.float32, "f32")]:
        data = (rng.random((3, 33, 47)) * 200).astype(dtype)
        p = tmp_path / f"big_{name}.tif"
        tiff.imwrite(p, data, bigtiff=True)
        # native codec path (if built)
        arr = native.decode(p)
        if arr is not None:
            np.testing.assert_array_equal(arr, data)
        # pure-Python path
        import os

        os.environ["PSSR2_TPU_NO_NATIVE"] = "1"
        try:
            # force the python reader by parsing directly
            with open(p, "rb") as f:
                raw = f.read()
            big, ifd = tiff._parse_header(raw, "<", p)
            assert big
            pages = []
            while ifd:
                tags, ifd = tiff._read_ifd_entries(raw, ifd, "<", big)
                pages.append(tiff._decode_page(raw, tags, "<"))
            np.testing.assert_array_equal(np.stack(pages), data)
        finally:
            del os.environ["PSSR2_TPU_NO_NATIVE"]
        # the public entry point too
        np.testing.assert_array_equal(tiff.imread(p), data)
        # metadata probe
        n_pages, (h, w) = tiff.num_pages_and_size(p)
        assert (n_pages, h, w) == (3, 33, 47)


def test_bigtiff_dataset_loads(tmp_path):
    """A dataset over BigTIFF files works end to end."""
    (tmp_path / "images").mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        tiff.imwrite(tmp_path / "images" / f"{i}.tif", (rng.random((64, 64)) * 255).astype(np.uint8), bigtiff=True)
    ds = ImageDataset(tmp_path / "images", hr_res=64, val_split=1)
    hr, lr = ds[0]
    assert hr.shape[-1] == 64


def test_device_augment_commutes_with_astype():
    """gen_pair augments in uint8 (4x fewer bytes through the vmapped
    cond/switch branch copies); rot90/flip are pure permutations so the
    result must be BIT-identical to augmenting after the f32 convert."""
    import jax
    import jax.numpy as jnp

    from pssr2_tpu.data.pipeline import device_augment, make_device_gen_pair

    rng = np.random.default_rng(7)
    x_u8 = jnp.asarray(rng.integers(0, 256, (4, 1, 32, 32), dtype=np.uint8))
    keys = jax.random.split(jax.random.key(3), 4)
    out_u8 = jax.vmap(device_augment)(keys, x_u8).astype(jnp.float32)
    out_f32 = jax.vmap(device_augment)(keys, x_u8.astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(out_u8), np.asarray(out_f32))

    # and the full gen_pair consumes its key exactly as before: augmented
    # HR is one of the 8 dihedral transforms of the input, LR matches a
    # re-derived downscale of that HR.
    gp = make_device_gen_pair(4, None, None, augment=True)
    hr, lr = gp(jax.random.key(5), x_u8)
    assert hr.dtype == jnp.float32 and hr.shape == (4, 1, 32, 32)
    assert lr.shape == (4, 1, 8, 8)
