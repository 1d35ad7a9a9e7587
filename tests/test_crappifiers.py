"""Crappifier tests: shape contracts (reference-style, tests/test_crappifiers.py)
plus statistical parity between host (numpy) and device (JAX) paths using the
reference's own noise-histogram-distance objective (pssr/train.py:372-384)."""

import jax
import numpy as np
import pytest

from pssr2_tpu.crappifiers import (
    AdditiveGaussian,
    Blur,
    MultiCrappifier,
    Poisson,
    SaltPepper,
)
from pssr2_tpu.ops.degrade import to_device_fn

from _util import get_image, get_shape, LR_RES

LR_SHAPE = get_shape(LR_RES)

KWARGS_LIST = [
    {},
    dict(intensity=2),
    dict(intensity=0.5),
    dict(gain=10),
    dict(gain=-10),
    dict(spread=0.5),
]


def test_crappifiers_shapes():
    for crappifier in [AdditiveGaussian, Poisson, SaltPepper, Blur]:
        for kwargs in KWARGS_LIST:
            out = crappifier(**kwargs)(get_image(LR_SHAPE))
            assert out.shape == LR_SHAPE, f"Crappifier {crappifier.__name__} is broken!"


def test_multi():
    crappifier = MultiCrappifier(AdditiveGaussian(), Poisson(), SaltPepper())
    out = crappifier(get_image(LR_SHAPE))
    assert out.shape == LR_SHAPE


def _hist_distance(a, b):
    """Reference noise-profile comparison: MSE of 512-bin histograms
    normalized by image area (pssr/train.py:372-384)."""
    bins = np.arange(-256, 256)
    da, _ = np.histogram(a.flatten(), bins)
    db, _ = np.histogram(b.flatten(), bins)
    return np.mean((da - db) ** 2) / (a.shape[-1] ** 2)


@pytest.mark.parametrize(
    "crappifier",
    [AdditiveGaussian(), Poisson(), SaltPepper(intensity=5), Blur(), AdditiveGaussian(intensity=5, gain=4)],
    ids=["gauss", "poisson", "saltpepper", "blur", "gauss_gain"],
)
def test_device_host_parity(crappifier):
    np.random.seed(0)
    image = (get_image((1, 64, 64), seed=0)).astype(np.float32)

    host_out = crappifier(image)
    fn = to_device_fn(crappifier)
    assert fn is not None
    dev_out = np.asarray(fn(jax.random.key(0), image))

    assert dev_out.shape == image.shape
    host_noise = host_out - image
    dev_noise = dev_out - image
    # Distributions must match statistically (not bitwise: different RNGs)
    assert abs(host_noise.mean() - dev_noise.mean()) < 1.5
    assert abs(host_noise.std() - dev_noise.std()) < 1.5
    assert _hist_distance(host_noise, dev_noise) < 2.0


def test_device_multi():
    crappifier = MultiCrappifier(AdditiveGaussian(intensity=5), Poisson())
    fn = to_device_fn(crappifier)
    image = get_image((1, 64, 64), seed=1).astype(np.float32)
    out = np.asarray(fn(jax.random.key(1), image))
    assert out.shape == image.shape
    # clip=True between stages keeps range bounded before the last stage
    host = crappifier(image)
    assert abs((out - image).std() - (host - image).std()) < 3.0


def test_custom_crappifier_has_no_device_fn():
    class MyCrap(AdditiveGaussian.__mro__[1]):  # Crappifier ABC
        def crappify(self, image):
            return image

    assert to_device_fn(MyCrap()) is None


def test_device_spread_jitters_per_sample():
    """spread>0 must draw a different intensity per sample on device
    (the 'train on a range of degradations' semantics, crappifiers.py:56)."""
    crap = AdditiveGaussian(intensity=10, spread=8)
    fn = to_device_fn(crap)
    import jax.numpy as jnp
    from pssr2_tpu.ops.degrade import crappify_batch

    image = np.full((8, 1, 64, 64), 128, np.float32)
    out = np.asarray(crappify_batch(fn, jax.random.key(0), jnp.asarray(image)))
    stds = (out - image).std(axis=(1, 2, 3))
    # per-sample noise levels differ substantially across the batch
    assert stds.max() - stds.min() > 2.0
    # and the mean level is near the nominal intensity
    assert 5 < stds.mean() < 20
