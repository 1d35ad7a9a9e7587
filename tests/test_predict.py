"""Prediction tests (reference-style: tests/test_predict.py) plus sheet
reassembly round-trip coverage."""

import numpy as np

from pssr2_tpu.data import ImageDataset, SlidingDataset, preprocess_dataset
from pssr2_tpu.data import tiff
from pssr2_tpu.models import ResUNet
from pssr2_tpu.predict import predict_collage, predict_images
from pssr2_tpu.predict import test_metrics as compute_metrics  # aliased: pytest would collect the API name
from pssr2_tpu.util import reassemble_sheets

from _util import get_shape, make_tifs

HR = 128
SMALL = dict(hidden=[8, 16], depth=1)


def _dataset(tmp_path, **kwargs):
    make_tifs(tmp_path / "images", get_shape(HR, batch=5))
    return ImageDataset(tmp_path / "images", hr_res=HR, val_split=1, **kwargs)


def test_predict_images(tmp_path):
    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)

    predict_images(model, dataset, out_dir=tmp_path / "out")
    assert len(list((tmp_path / "out").glob("*.tif"))) == 5
    out = tiff.imread(sorted((tmp_path / "out").glob("*.tif"))[0])
    assert out.shape[-1] == HR

    predict_images(model, dataset, out_dir=tmp_path / "out_norm", norm=True)
    outs = predict_images(model, dataset, out_dir=None, batch_size=2)
    assert len(outs) == 5


def test_predict_collage(tmp_path):
    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)
    predict_collage(model, dataset, out_dir=str(tmp_path))
    predict_collage(model, dataset, out_dir=str(tmp_path), norm=True)
    assert list(tmp_path.glob("collage_*.png"))


def test_compute_metrics(tmp_path):
    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)

    out = compute_metrics(model, dataset)
    assert len(out) == 4
    assert all(np.isfinite(v) for v in out.values())

    compute_metrics(model, dataset, norm=True)
    raw = compute_metrics(model, dataset, avg=False)
    assert len(raw["psnr"]) == 5  # every val index evaluated (ref bug fixed)


def test_reassemble_roundtrip(tmp_path):
    # sheet -> sliding tiles -> "predicted" (= LR tiles) -> reassembled sheet
    rng = np.random.default_rng(0)
    sheet = (rng.random((256, 256)) * 255).astype(np.uint8)
    (tmp_path / "sheets").mkdir()
    tiff.imwrite(tmp_path / "sheets" / "sheet.tif", sheet)

    dataset = SlidingDataset(
        tmp_path / "sheets", hr_res=128, lr_scale=-1, overlap=64, extension="tif", preload=False, val_split=1
    )
    preds = {dataset._get_name(i): dataset[i].astype(np.uint8) for i in range(len(dataset))}
    outs = reassemble_sheets(preds, str(tmp_path / "sheets"), lr_scale=1, overlap=64, margin=16, out_dir=None)
    assert len(outs) == 1
    assert outs[0].squeeze().shape == sheet.shape
    # overlap-averaged reassembly of exact tiles reproduces the sheet
    np.testing.assert_allclose(outs[0].squeeze().astype(np.float32), sheet.astype(np.float32), atol=1.0)


def test_predict_images_mesh(tmp_path):
    from pssr2_tpu.parallel import data_mesh

    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)
    outs = predict_images(model, dataset, out_dir=None, batch_size=4, mesh=data_mesh())
    assert len(outs) == 5


def test_reassemble_from_files(tmp_path):
    # file-path variant of reassembly (predictions saved to disk first)
    rng = np.random.default_rng(1)
    sheet = (rng.random((256, 256)) * 255).astype(np.uint8)
    (tmp_path / "sheets").mkdir()
    tiff.imwrite(tmp_path / "sheets" / "sheet.tif", sheet)

    dataset = SlidingDataset(
        tmp_path / "sheets", hr_res=128, lr_scale=-1, overlap=64, extension="tif", preload=False, val_split=1
    )
    (tmp_path / "tiles").mkdir()
    for i in range(len(dataset)):
        tiff.imwrite(tmp_path / "tiles" / f"{dataset._get_name(i)}.tif", dataset[i].astype(np.uint8).squeeze())

    reassemble_sheets(str(tmp_path / "tiles"), str(tmp_path / "sheets"), lr_scale=1, overlap=64, out_dir=str(tmp_path / "out"))
    out = tiff.imread(tmp_path / "out" / "sheet.tif").squeeze()
    np.testing.assert_allclose(out.astype(np.float32), sheet.astype(np.float32), atol=1.0)


def test_predict_sheets_matches_host_reassembly(tmp_path):
    """The one-call device-stitched path must equal predict_images +
    reassemble_sheets exactly (same uint8 tiles, same averaging math)."""
    from pssr2_tpu.predict import predict_sheets

    rng = np.random.default_rng(2)
    (tmp_path / "sheets").mkdir()
    for i in range(2):
        tiff.imwrite(tmp_path / "sheets" / f"s{i}.tif", (rng.random((96, 96)) * 255).astype(np.uint8))

    dataset = SlidingDataset(
        tmp_path / "sheets", hr_res=32, lr_scale=-1, overlap=16, extension="tif", preload=True, val_split=1
    )
    model = ResUNet(hidden=[8, 16], depth=1)
    model.eval()

    predict_sheets(model, dataset, batch_size=4, margin=8, out_dir=str(tmp_path / "fast"))

    preds = predict_images(model, dataset, out_dir=None, batch_size=4)
    reassemble_sheets(preds, str(tmp_path / "sheets"), lr_scale=4, overlap=16, margin=8, out_dir=str(tmp_path / "host"))

    # compare by sheet name (reassemble_sheets returns sheets in unsorted
    # glob order, matching the reference)
    for name in ("s0", "s1"):
        f = tiff.imread(tmp_path / "fast" / f"{name}.tif").astype(np.int32).squeeze()
        h = tiff.imread(tmp_path / "host" / f"{name}.tif").astype(np.int32).squeeze()
        assert f.shape == h.shape == (384, 384)
        # identical tiles + identical averaging: at most 1 LSB rounding skew
        assert np.abs(f - h).max() <= 1


def test_error_paths(tmp_path):
    import pytest as _pytest

    from pssr2_tpu.predict import predict_sheets
    from pssr2_tpu.parallel import data_mesh
    from pssr2_tpu.parallel.spatial import predict_sheet

    dataset = _dataset(tmp_path)
    model = ResUNet(**SMALL)

    # norm on an LR-mode dataset is rejected
    make_tifs(tmp_path / "lr_only", get_shape(32, batch=2))
    lr_ds = ImageDataset(tmp_path / "lr_only", hr_res=128, val_split=1)
    assert lr_ds.is_lr
    with _pytest.raises(ValueError, match="paired"):
        predict_images(model, lr_ds, norm=True, out_dir=None)

    # predict_sheets needs a sliding dataset
    with _pytest.raises(ValueError, match="sliding"):
        predict_sheets(model, dataset)

    # reassemble margin > overlap is rejected
    with _pytest.raises(ValueError, match="margin"):
        reassemble_sheets({}, str(tmp_path), lr_scale=4, overlap=2, margin=8)

    # spatial halo must be smaller than the shard height
    with _pytest.raises(ValueError, match="halo"):
        predict_sheet(model, np.zeros((1, 64, 64), np.float32), data_mesh(), halo=32)


def test_stitch_tiles_large_grid():
    """stitch_tiles is a fori_loop (O(1) program size in tile count): a
    20x20 grid must compile+run quickly and match a direct numpy
    accumulation with the same margin semantics (VERDICT r1 #5)."""
    import time

    import jax.numpy as jnp

    from pssr2_tpu.ops.stitch import stitch_tiles

    n_rows = n_cols = 20
    th = tw = 24
    overlap, margin = 8, 2
    rng = np.random.default_rng(0)
    tiles = rng.random((n_rows * n_cols, 1, th, tw)).astype(np.float32) * 255

    t0 = time.time()
    got = np.asarray(stitch_tiles(jnp.asarray(tiles), n_rows, n_cols, overlap, margin))
    assert time.time() - t0 < 120  # unrolled version would not compile in time

    step = th - overlap
    h, w = n_rows * step + overlap, n_cols * step + overlap
    acc = np.zeros((1, h, w), np.float32)
    count = np.zeros((h, w), np.float32)
    for idx in range(len(tiles)):
        row, col = idx // n_cols, idx % n_cols
        mt = margin if row != 0 else 0
        mb = margin if row != n_rows - 1 else 0
        ml = margin if col != 0 else 0
        mr = margin if col != n_cols - 1 else 0
        y0, x0 = row * step + mt, col * step + ml
        tile = tiles[idx, :, mt : th - mb, ml : tw - mr]
        acc[:, y0 : y0 + tile.shape[1], x0 : x0 + tile.shape[2]] += tile
        count[y0 : y0 + tile.shape[1], x0 : x0 + tile.shape[2]] += 1
    expected = acc / np.maximum(count, 1)
    np.testing.assert_allclose(got, expected, atol=1e-3)
