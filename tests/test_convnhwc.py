"""Fused NHWC tap-dot conv layer kernel (ops/pallas/convnhwc) parity
tests — interpret mode on CPU against the XLA reference layer (reference
semantics: pssr/models/_blocks.py:20-41 conv->BN->ReLU chain)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pssr2_tpu.ops.pallas import convnhwc

N, H, W, CIN, COUT = 2, 6, 10, 16, 8


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = convnhwc.MODE
    convnhwc.MODE = "interpret"
    yield
    convnhwc.MODE = old


def _inputs(seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, CIN)), dtype)
    kernel = jnp.asarray(rng.normal(0, 0.1, (3, 3, CIN, COUT)), dtype)
    bias = jnp.asarray(rng.normal(0, 0.1, (COUT,)), jnp.float32)
    ab = jnp.asarray(
        np.stack([rng.uniform(0.5, 1.5, CIN), rng.normal(0, 0.3, CIN)]), jnp.float32
    )
    return x, convnhwc.kernel_taps(kernel), bias, ab


@pytest.mark.parametrize("relu_in", [True, False])
def test_fwd_matches_reference_f32(relu_in):
    x, wk, bias, ab = _inputs(0)
    args = (x, wk, bias, ab if relu_in else None)
    yk, s1k, s2k = convnhwc.fused_conv_layer_nhwc(*args, relu_in=relu_in)
    yr, s1r, s2r = convnhwc.reference_layer_nhwc(*args, relu_in=relu_in)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1k), np.asarray(s1r), atol=2e-2)
    np.testing.assert_allclose(np.asarray(s2k), np.asarray(s2r), atol=2e-1)


def test_fwd_matches_reference_bf16():
    x, wk, bias, ab = _inputs(1, jnp.bfloat16)
    yk, _, _ = convnhwc.fused_conv_layer_nhwc(x, wk, bias, ab)
    yr, _, _ = convnhwc.reference_layer_nhwc(x, wk, bias, ab)
    np.testing.assert_allclose(
        np.asarray(yk, np.float32), np.asarray(yr, np.float32), atol=3e-2
    )


def test_border_handling_exact():
    """Zero-padding semantics at all four edges vs direct numpy conv."""
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 5, 7, 4)).astype(np.float32)  # NHWC
    k = rng.normal(0, 0.3, (3, 3, 4, 3)).astype(np.float32)
    y_np = np.zeros((1, 5, 7, 3), np.float32)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for hh in range(5):
        for ww in range(7):
            patch = xp[0, hh : hh + 3, ww : ww + 3]  # (ky, kx, C)
            y_np[0, hh, ww] = np.tensordot(patch, k, axes=([0, 1, 2], [0, 1, 2]))
    yk, _, _ = convnhwc.fused_conv_layer_nhwc(
        jnp.asarray(x), convnhwc.kernel_taps(jnp.asarray(k)), jnp.zeros((3,)), relu_in=False
    )
    np.testing.assert_allclose(np.asarray(yk), y_np, atol=1e-4)


@pytest.mark.parametrize("relu_in", [True, False])
def test_vjp_matches_reference_f32(relu_in):
    x, wk, bias, ab = _inputs(3)
    rng = np.random.default_rng(7)
    gy = jnp.asarray(rng.normal(0, 1, (N, H, W, COUT)), jnp.float32)
    gs1 = jnp.asarray(rng.normal(0, 0.1, (COUT,)), jnp.float32)
    gs2 = jnp.asarray(rng.normal(0, 0.05, (COUT,)), jnp.float32)
    cts = (gy, gs1, gs2)
    args = (x, wk, bias, ab)

    def k_fn(x_, w_, b_, ab_):
        return convnhwc.fused_conv_layer_nhwc(x_, w_, b_, ab_, relu_in=relu_in)

    def r_fn(x_, w_, b_, ab_):
        return convnhwc.reference_layer_nhwc(
            x_, w_, b_, ab_ if relu_in else None, relu_in=relu_in
        )

    outk, vjpk = jax.vjp(k_fn, *args)
    outr, vjpr = jax.vjp(r_fn, *args)
    np.testing.assert_allclose(np.asarray(outk[0]), np.asarray(outr[0]), atol=1e-5)
    for name, a, b in zip(["dx", "dwk", "dbias", "dab"], vjpk(cts), vjpr(cts)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=5e-4 * scale, err_msg=name)


def test_eligibility_gates():
    assert convnhwc.eligible(16, 64, 64, 128, 128, jnp.float32, train=True)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(convnhwc, "MODE", "off")
        assert not convnhwc.eligible(16, 64, 64, 128, 128, jnp.float32, train=True)
        mp.setattr(convnhwc, "MODE", "auto")
        assert not convnhwc.eligible(16, 64, 64, 128, 128, jnp.bfloat16, train=True)
    assert not convnhwc.eligible(16, 64, 64, 127, 128, jnp.float32, train=True)
    assert not convnhwc.eligible(16, 128, 128, 64, 32, jnp.float32, train=True)
