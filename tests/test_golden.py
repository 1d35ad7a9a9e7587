"""Golden regression tests: fixed-RNG crappifier statistics, resize-weight
invariants and a short deterministic training run whose loss must improve —
numeric coverage the reference test suite lacks (SURVEY.md §4)."""

import numpy as np
import pytest

from pssr2_tpu.crappifiers import AdditiveGaussian, Blur, MultiCrappifier, Poisson, SaltPepper
from pssr2_tpu.ops.resize import downscale_matrix

# (mean, std) of crappifier(img) for the fixed image/seed below
GOLDEN = {
    "gauss": (127.1330, 74.5862),
    "poisson": (126.9197, 74.6600),
    "sp": (127.1832, 74.2656),
    "blur": (127.1495, 11.1255),
    "multi": (127.0304, 74.4304),
}

_CRAPPIFIERS = {
    "gauss": lambda: AdditiveGaussian(),
    "poisson": lambda: Poisson(),
    "sp": lambda: SaltPepper(),
    "blur": lambda: Blur(),
    "multi": lambda: MultiCrappifier(Poisson(), AdditiveGaussian()),
}


@pytest.mark.parametrize("name", list(GOLDEN))
def test_crappifier_golden(name):
    rng = np.random.default_rng(42)
    img = (rng.random((1, 64, 64)) * 255).astype(np.float32)
    np.random.seed(123)
    out = _CRAPPIFIERS[name]()(img)
    mean, std = GOLDEN[name]
    assert float(out.mean()) == pytest.approx(mean, abs=2e-3)
    assert float(out.std()) == pytest.approx(std, abs=2e-3)


def test_resize_weights_invariants():
    for in_res, out_res in [(512, 128), (500, 128), (512, 256)]:
        w = downscale_matrix(in_res, out_res)
        assert w.shape == (in_res, out_res)
        # each output pixel is a convex combination of inputs
        np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=1e-5)
        assert w.min() >= 0


def test_training_reduces_loss(tmp_path):
    """Deterministic short training run: loss must drop measurably."""
    from pssr2_tpu.data import ImageDataset, tiff
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import train_paired
    from pssr2_tpu.util import MSELoss

    rng = np.random.default_rng(0)
    (tmp_path / "imgs").mkdir()
    # structured images (not pure noise) so there is signal to learn
    yy, xx = np.mgrid[0:64, 0:64]
    for i in range(6):
        img = (127 + 120 * np.sin(xx / (3 + i)) * np.cos(yy / (4 + i))).astype(np.uint8)
        tiff.imwrite(tmp_path / "imgs" / f"{i}.tif", img)

    dataset = ImageDataset(tmp_path / "imgs", hr_res=64, lr_scale=4, rotation=False)
    model = ResUNet(hidden=[8, 16], depth=1)
    losses, _ = train_paired(
        model, dataset, batch_size=5, loss_fn=MSELoss(), optim=AdamW(3e-3), epochs=25,
        log_frequency=1, seed=0,
    )
    assert losses[-1] < losses[0] * 0.5, f"loss did not improve: {losses[0]:.4f} -> {losses[-1]:.4f}"


def test_gen_pair_golden():
    """Regression-lock the full host pair chain: crop/pad -> rot/flip ->
    PIL-matched downscale -> Poisson crappify -> uint8 rounding."""
    import random

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.io import gen_pair

    rng = np.random.default_rng(11)
    img = (rng.random((1, 96, 96)) * 255).astype(np.uint8)
    np.random.seed(77)
    random.seed(77)
    hr, lr = gen_pair(img, 64, 4, [True, (1, 2)], Poisson(), None, None)
    assert hr.shape == (1, 64, 64) and lr.shape == (1, 16, 16)
    assert float(hr.mean()) == pytest.approx(126.939941, abs=1e-3)
    assert float(hr.std()) == pytest.approx(72.697350, abs=1e-3)
    assert float(lr.mean()) == pytest.approx(126.476562, abs=1e-3)
    assert float(lr.std()) == pytest.approx(17.125439, abs=1e-3)
