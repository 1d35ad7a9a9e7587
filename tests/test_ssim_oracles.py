"""Independent numeric oracles for the SSIM family (VERDICT r1 weak #3:
the pytorch_msssim-parity claim was previously checked only against an
in-repo numpy reimplementation by the same author).

Two oracle classes, neither sharing code with pssr2_tpu/ops/ssim.py:

1. Closed forms from the SSIM definition (Wang et al. 2004): for constant
   images all (co)variances vanish, so SSIM reduces to the luminance term
   l = (2*mu1*mu2 + C1) / (mu1^2 + mu2^2 + C1), and MS-SSIM reduces to
   l ** w[-1] (cs = 1 at every scale).
2. A torch conv2d implementation of the pytorch_msssim algorithm
   (separable gaussian window, VALID padding, K=(0.01,0.03), 2x2 avg-pool
   with count_include_pad between scales) — a different framework and a
   different conv path from the banded-matmul JAX version.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from pssr2_tpu.ops.metrics import psnr, ssim_np
from pssr2_tpu.ops.ssim import ms_ssim, ssim

from _util import get_image

MS_WEIGHTS = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]


def _lum(c1_val, c2_val, data_range, k1=0.01):
    c1 = (k1 * data_range) ** 2
    return (2 * c1_val * c2_val + c1) / (c1_val**2 + c2_val**2 + c1)


def test_ssim_closed_form_constants():
    for a, b, rng in [(100.0, 150.0, 255.0), (0.3, 0.8, 1.0), (42.0, 42.0, 255.0)]:
        x = np.full((1, 1, 64, 64), a, np.float32)
        y = np.full((1, 1, 64, 64), b, np.float32)
        expected = _lum(a, b, rng)
        got = float(ssim(x, y, data_range=rng))
        # f32 compute: ~1e-4 relative rounding on the luminance ratio
        assert got == pytest.approx(expected, rel=2e-4), (a, b)


def test_ssim_identity_is_one():
    x = get_image((2, 1, 64, 64), seed=0).astype(np.float32)
    assert float(ssim(x, x, data_range=255)) == pytest.approx(1.0, abs=1e-5)
    x_big = get_image((1, 1, 192, 192), seed=0).astype(np.float32)
    assert float(ms_ssim(x_big, x_big.copy(), data_range=255)) == pytest.approx(1.0, abs=1e-4)
    assert ssim_np(x[0, 0], x[0, 0].copy(), data_range=255) == pytest.approx(1.0, abs=1e-7)


def test_ms_ssim_closed_form_constants():
    x = np.full((1, 1, 256, 256), 90.0, np.float32)
    y = np.full((1, 1, 256, 256), 140.0, np.float32)
    expected = _lum(90.0, 140.0, 255.0) ** MS_WEIGHTS[-1]
    got = float(ms_ssim(x, y, data_range=255.0))
    assert got == pytest.approx(expected, abs=1e-5)


def test_ssim_np_closed_form_constants():
    """skimage-semantics SSIM also reduces to the luminance term for
    constant images (variances vanish under the uniform filter too)."""
    x = np.full((32, 32), 60.0)
    y = np.full((32, 32), 110.0)
    assert ssim_np(x, y, data_range=255.0) == pytest.approx(_lum(60.0, 110.0, 255.0), abs=1e-9)


def test_psnr_closed_form_constant_offset():
    x = get_image((64, 64), seed=1).astype(np.float64).clip(10, 245)
    y = x + 5.0
    assert psnr(x, y, data_range=255) == pytest.approx(10 * np.log10(255**2 / 25.0), abs=1e-9)


def test_ssim_data_range_invariance():
    x = get_image((1, 1, 48, 48), seed=2).astype(np.float32)
    y = get_image((1, 1, 48, 48), seed=3).astype(np.float32)
    a = float(ssim(x, y, data_range=255.0))
    b = float(ssim(x / 255.0, y / 255.0, data_range=1.0))
    assert a == pytest.approx(b, abs=1e-5)


# ---- torch conv2d oracle of the pytorch_msssim algorithm -----------------


def _torch_gaussian(win_size=11, sigma=1.5):
    coords = torch.arange(win_size, dtype=torch.float64) - win_size // 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).reshape(1, 1, 1, -1)


def _torch_blur(x, win):
    # separable gaussian, VALID padding (pytorch_msssim _gaussian_filter)
    out = tF.conv2d(x, win, groups=x.shape[1])
    return tF.conv2d(out, win.transpose(2, 3), groups=x.shape[1])


def _torch_ssim_parts(x, y, data_range, win):
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    mu1, mu2 = _torch_blur(x, win), _torch_blur(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _torch_blur(x * x, win) - mu1_sq
    s2 = _torch_blur(y * y, win) - mu2_sq
    s12 = _torch_blur(x * y, win) - mu1_mu2
    cs_map = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map.flatten(2).mean(-1), cs_map.flatten(2).mean(-1)


def test_ssim_matches_torch_conv_oracle():
    x = get_image((2, 1, 64, 64), seed=4).astype(np.float32)
    y = np.clip(x + get_image((2, 1, 64, 64), seed=5).astype(np.float32) * 0.1, 0, 255)
    ours = float(ssim(x, y, data_range=255))
    win = _torch_gaussian()
    s, _ = _torch_ssim_parts(torch.from_numpy(x).double(), torch.from_numpy(y).double(), 255.0, win)
    assert ours == pytest.approx(float(s.mean()), abs=1e-5)


def test_ms_ssim_matches_torch_conv_oracle():
    x = get_image((1, 1, 192, 192), seed=6).astype(np.float32)
    y = np.clip(x + get_image((1, 1, 192, 192), seed=7).astype(np.float32) * 0.15, 0, 255)
    ours = float(ms_ssim(x, y, data_range=255))

    xt, yt = torch.from_numpy(x).double(), torch.from_numpy(y).double()
    win = _torch_gaussian()
    weights = torch.tensor(MS_WEIGHTS, dtype=torch.float64)
    mcs = []
    for i in range(5):
        s, cs = _torch_ssim_parts(xt, yt, 255.0, win)
        if i < 4:
            mcs.append(torch.relu(cs))
            pad_h, pad_w = xt.shape[2] % 2, xt.shape[3] % 2
            xt = tF.avg_pool2d(xt, 2, padding=(pad_h, pad_w), count_include_pad=True)
            yt = tF.avg_pool2d(yt, 2, padding=(pad_h, pad_w), count_include_pad=True)
    stacked = torch.stack(mcs + [torch.relu(s)], dim=0)
    val = torch.prod(stacked ** weights.reshape(-1, 1, 1), dim=0)
    assert ours == pytest.approx(float(val.mean()), abs=1e-4)


def test_avg_pool2_matches_torch_incl_odd_dims():
    """_avg_pool2 implements torch avg_pool2d(k=2, padding=dim%2,
    count_include_pad=True) semantics.  For odd dims torch's output-size
    floor drops the trailing pad, so only the front pad survives — the
    previous symmetric pad crashed on odd sheets (e.g. 250^2 at level 3)."""
    import jax.numpy as jnp

    from pssr2_tpu.ops.ssim import _avg_pool2

    rng = np.random.default_rng(0)
    for h, w in [(27, 27), (28, 27), (30, 30), (125, 125), (16, 31)]:
        x = rng.random((2, 3, h, w)).astype(np.float32)
        want = tF.avg_pool2d(
            torch.from_numpy(x), kernel_size=2, padding=(h % 2, w % 2), count_include_pad=True
        ).numpy()
        got = np.asarray(_avg_pool2(jnp.asarray(x)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_ms_ssim_odd_sheet_sizes():
    """MS-SSIM over non-power-of-two sheets (odd dims appear at deeper
    pyramid levels) is finite and crash-free."""
    x = get_image((1, 1, 250, 250), seed=8).astype(np.float32)
    y = get_image((1, 1, 250, 250), seed=9).astype(np.float32)
    v = float(ms_ssim(x, y, data_range=255))
    assert np.isfinite(v) and -1 <= v <= 1


def test_ssim_parts_analytic_vjp_matches_autodiff():
    """ops/ssim.py's _moments_to_ssim carries a hand-derived VJP (one fused
    elementwise backward pass, experiments/mxu_probe10); its gradients must
    equal autodiff through the plain map formulation."""
    import jax
    import jax.numpy as jnp

    from pssr2_tpu.ops.ssim import _blur, _moments_to_ssim_maps, _ssim_parts

    def naive_parts(x, y):
        c1, c2 = 0.01**2, 0.03**2
        stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=0)
        blurred = _blur(stacked, 11, 1.5)
        mu1, mu2, xx_b, yy_b, xy_b = jnp.split(blurred, 5, axis=0)
        sm, cm = _moments_to_ssim_maps(mu1, mu2, xx_b, yy_b, xy_b, c1, c2)
        return sm.reshape(*sm.shape[:2], -1).mean(-1), cm.reshape(*cm.shape[:2], -1).mean(-1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 1, 48, 48), np.float32))
    y = jnp.asarray(rng.random((2, 1, 48, 48), np.float32))

    def mixed(parts):
        def f(x, y):
            s, c = parts(x, y)
            return jnp.sum(jnp.sin(s) * 1.3 + jnp.cos(c))

        return f

    custom = mixed(lambda x, y: _ssim_parts(x, y, 1.0, 11, 1.5, (0.01, 0.03)))
    naive = mixed(naive_parts)
    np.testing.assert_allclose(float(custom(x, y)), float(naive(x, y)), rtol=1e-6)
    g1 = jax.grad(custom, argnums=(0, 1))(x, y)
    g2 = jax.grad(naive, argnums=(0, 1))(x, y)
    for got, want in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-7)
