"""Ops tests: PIL-matched resize, pixel shuffle vs torch, SSIM/MS-SSIM
numerics, metrics parity, GradHist shape/gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
from PIL import Image
from scipy.signal import correlate

from pssr2_tpu.ops.gradhist import GradHist
from pssr2_tpu.ops.metrics import psnr, ssim_np
from pssr2_tpu.ops.resize import resize_bilinear, resize_bilinear_np
from pssr2_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle
from pssr2_tpu.ops.ssim import ms_ssim, ssim


def test_resize_matches_pil():
    rng = np.random.default_rng(0)
    for in_res, out_res in [(512, 128), (512, 256), (500, 128), (128, 128)]:
        img = (rng.random((in_res, in_res)) * 255).astype(np.uint8)
        pil = np.asarray(
            Image.fromarray(img).resize((out_res, out_res), Image.Resampling.BILINEAR)
        ).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(img), out_res, out_res))
        # PIL uses 8-bit fixed-point coefficients; after uint8 rounding the
        # float path agrees exactly on >75% of pixels, <=2 LSB worst-case
        rounded = np.clip(np.round(ours), 0, 255)
        diff = np.abs(rounded - pil)
        assert diff.max() <= 2.0
        assert diff.mean() <= 0.25
        assert (diff == 0).mean() > 0.75
        ours_np = resize_bilinear_np(img, out_res, out_res)
        # f32 contraction order differs between XLA and numpy
        np.testing.assert_allclose(ours_np, ours, atol=0.5)


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.random((2, 16, 8, 8)).astype(np.float32)
    want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2, channels_last=False))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # NHWC path is consistent with NCHW path
    x_last = np.transpose(x, (0, 2, 3, 1))
    got_last = np.asarray(pixel_shuffle(jnp.asarray(x_last), 2, channels_last=True))
    np.testing.assert_allclose(np.transpose(got_last, (0, 3, 1, 2)), want, atol=1e-6)

    # unshuffle inverts
    back = np.asarray(pixel_unshuffle(jnp.asarray(got), 2, channels_last=False))
    np.testing.assert_allclose(back, x, atol=1e-6)
    back_last = np.asarray(pixel_unshuffle(jnp.asarray(got_last), 2, channels_last=True))
    np.testing.assert_allclose(back_last, x_last, atol=1e-6)


def _ssim_ref_np(x, y, data_range=255.0, win_size=11, win_sigma=1.5):
    """Independent numpy implementation of the pytorch_msssim SSIM formula
    (separable Gaussian, VALID conv) for cross-checking the JAX version."""
    coords = np.arange(win_size) - win_size // 2
    g = np.exp(-(coords**2) / (2 * win_sigma**2))
    g /= g.sum()
    win2d = np.outer(g, g)

    def blur(im):
        return np.stack(
            [
                np.stack([correlate(c, win2d, mode="valid") for c in b])
                for b in im
            ]
        )

    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    mu1, mu2 = blur(x), blur(y)
    s1 = blur(x * x) - mu1**2
    s2 = blur(y * y) - mu2**2
    s12 = blur(x * y) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    sm = ((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)) * cs
    return sm.mean()


def test_ssim_numerics():
    rng = np.random.default_rng(2)
    x = (rng.random((2, 1, 64, 64)) * 255).astype(np.float32)
    y = np.clip(x + rng.normal(0, 20, x.shape), 0, 255).astype(np.float32)

    got = float(ssim(jnp.asarray(x), jnp.asarray(y), data_range=255))
    want = _ssim_ref_np(x.astype(np.float64), y.astype(np.float64))
    assert abs(got - want) < 1e-4

    assert float(ssim(jnp.asarray(x), jnp.asarray(x))) > 0.9999


def test_ms_ssim():
    rng = np.random.default_rng(3)
    x = (rng.random((2, 1, 256, 256)) * 255).astype(np.float32)
    noisy = np.clip(x + rng.normal(0, 10, x.shape), 0, 255).astype(np.float32)
    noisier = np.clip(x + rng.normal(0, 40, x.shape), 0, 255).astype(np.float32)

    perfect = float(ms_ssim(jnp.asarray(x), jnp.asarray(x)))
    a = float(ms_ssim(jnp.asarray(x), jnp.asarray(noisy)))
    b = float(ms_ssim(jnp.asarray(x), jnp.asarray(noisier)))
    assert perfect > 0.9999
    assert 0 < b < a < 1


def test_metrics():
    rng = np.random.default_rng(4)
    a = (rng.random((64, 64)) * 255).astype(np.uint8)
    b = np.clip(a.astype(np.float32) + rng.normal(0, 10, a.shape), 0, 255).astype(np.uint8)
    p = psnr(a, b)
    assert 20 < p < 40
    s = ssim_np(a, b)
    assert 0 < s < 1
    assert ssim_np(a, a) > 0.9999
    assert psnr(a, a) == float("inf")


def test_gradhist_matches_hard_histogram():
    rng = np.random.default_rng(5)
    x = rng.normal(0, 30, (2, 1, 32, 32)).astype(np.float32)
    gh = GradHist(sigma=5)
    soft = np.asarray(gh(jnp.asarray(x)))
    assert soft.shape == (2, 512)
    # soft histogram totals approximate the sample count
    assert np.allclose(soft.sum(axis=1), 32 * 32, rtol=0.05)
    # and is differentiable
    grad = jax.grad(lambda v: gh(v).sum())(jnp.asarray(x))
    assert np.isfinite(np.asarray(grad)).all()


def test_gradhist_pallas_matches_xla():
    from pssr2_tpu.ops.pallas.gradhist import GradHistPallas

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 30, (2, 1, 40, 40)).astype(np.float32))
    ref = GradHist(sigma=5)
    pal = GradHistPallas(sigma=5, interpret=True)
    np.testing.assert_allclose(np.asarray(pal(x)), np.asarray(ref(x)), atol=1e-3)

    g_ref = jax.grad(lambda v: (ref(v) ** 2).sum())(x)
    g_pal = jax.grad(lambda v: (pal(v) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-2)


def test_pixel_shuffle_scale4_matches_torch():
    rng = np.random.default_rng(7)
    x = rng.random((1, 32, 4, 4)).astype(np.float32)
    want = torch.pixel_shuffle(torch.from_numpy(x), 4).numpy()
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 4, channels_last=False))
    np.testing.assert_allclose(got, want, atol=1e-6)
    x_last = np.transpose(x, (0, 2, 3, 1))
    got_last = np.asarray(pixel_shuffle(jnp.asarray(x_last), 4, channels_last=True))
    np.testing.assert_allclose(np.transpose(got_last, (0, 3, 1, 2)), want, atol=1e-6)


def test_dual_sums_kernel_matches_jnp():
    """ops/pallas/chanstats.dual_sums (fused per-channel [sum(x), sum(x*y)]
    used by FastBatchNorm) — Pallas interpreter vs the jnp fallback."""
    import jax.numpy as jnp

    from pssr2_tpu.ops.pallas.chanstats import dual_sums

    rng = np.random.default_rng(0)
    for n, c, dt in [(4096, 64, jnp.bfloat16), (1024, 96, jnp.float32), (520, 5, jnp.float32)]:
        x = jnp.asarray(rng.random((n, c), np.float32) - 0.3, dtype=dt)
        y = jnp.asarray(rng.random((n, c), np.float32), dtype=dt)
        want = np.asarray(dual_sums(x, y, force="jnp"))
        got = np.asarray(dual_sums(x, y, force="interpret"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_dual_sums_auto_mode_respects_mesh_guard():
    """chanstats.AUTO_MODE is "jnp" repo-wide (SPMD-partitionable BN
    reductions; train_paired never mutates it); off-TPU auto also resolves
    to jnp."""
    import jax.numpy as jnp

    from pssr2_tpu.ops.pallas import chanstats

    x = jnp.ones((64, 8), jnp.float32)
    old = chanstats.AUTO_MODE
    try:
        chanstats.AUTO_MODE = "jnp"
        np.testing.assert_allclose(np.asarray(chanstats.dual_sums(x, x)[0]), 64.0)
        chanstats.AUTO_MODE = "auto"  # CPU backend -> jnp fallback
        np.testing.assert_allclose(np.asarray(chanstats.dual_sums(x, x)[1]), 64.0)
    finally:
        chanstats.AUTO_MODE = old


def test_pallas_fused_layer_interpret_parity():
    """ops/pallas/fusedlayer.py (the measured-negative Pallas conv+BN
    prototype, kept as a kernel template) must stay numerically correct:
    interpreter mode vs the XLA reference, incl halo edges and the
    tiny-input fallback."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    import pssr2_tpu.ops.pallas.fusedlayer as fl

    orig = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pl.pallas_call = interp_call
    try:
        rng = np.random.default_rng(0)
        for bshape, relu in [((2, 16, 16, 8), True), ((1, 32, 16, 4), False), ((1, 8, 8, 4), True)]:
            B, H, W, C = bshape
            x = jnp.asarray(rng.random(bshape, np.float32) - 0.3, dtype=jnp.bfloat16)
            w = jnp.asarray(rng.random((3, 3, C, C), np.float32) - 0.5)
            a = jnp.asarray(rng.random(C, np.float32) + 0.5)
            b = jnp.asarray(rng.random(C, np.float32) - 0.5)
            y1, s1 = fl.fused_layer(x, w, a, b, relu_in=relu)
            y2, s2 = fl.fused_layer_reference(x, w, a, b, relu_in=relu)
            np.testing.assert_allclose(
                np.asarray(y1, np.float32), np.asarray(y2, np.float32), rtol=3e-2, atol=3e-2
            )
            np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=3e-2, atol=2.0)
    finally:
        pl.pallas_call = orig
