"""Fused Pallas window attention (ops/pallas/winattn.py): interpreter-mode
parity vs the reference einsum formulation, masked and unmasked, plus the
custom-VJP (backward recomputes through the reference path) and the
eligibility gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pssr2_tpu.ops.pallas import winattn


def _mk(w=8, n=64, heads=2, d=8, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.standard_normal((w, n, 3 * heads * d)), dtype)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)
    return qkv, bias


def test_fused_matches_reference_unmasked():
    heads, d = 2, 8
    qkv, bias = _mk(heads=heads, d=d)
    scale = d**-0.5
    want = winattn.reference_window_attention(qkv, bias, None, scale, heads)
    got = winattn.fused_window_attention(qkv, bias, None, scale, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_matches_reference_masked():
    # real shift mask from the model helper: 16x16 sheet, window 8, shift 4
    from pssr2_tpu.models.swinir import _shift_attn_mask

    heads, d, n = 2, 8, 64
    mask_spec = (16, 16, 8, 4)
    mask = jnp.asarray(_shift_attn_mask(*mask_spec))  # (4, 64, 64)
    w = mask.shape[0] * 2  # two images' worth of windows
    qkv, bias = _mk(w=w, n=n, heads=heads, d=d, seed=3)
    scale = d**-0.5
    want = winattn.reference_window_attention(qkv, bias, mask, scale, heads)
    got = winattn.fused_window_attention(qkv, bias, mask_spec, scale, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_vjp_matches_reference_grads():
    heads, d = 2, 8
    qkv, bias = _mk(heads=heads, d=d, seed=7)
    scale = d**-0.5

    def loss_f(fn):
        def inner(qkv, bias):
            out = fn(qkv, bias)
            return (out * out).mean()

        return inner

    fused = lambda a, b: winattn.fused_window_attention(a, b, None, scale, heads, interpret=True)
    ref = lambda a, b: winattn.reference_window_attention(a, b, None, scale, heads)
    g_fused = jax.grad(loss_f(fused), argnums=(0, 1))(qkv, bias)
    g_ref = jax.grad(loss_f(ref), argnums=(0, 1))(qkv, bias)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-5)


def test_bf16_path():
    heads, d = 3, 16
    qkv, bias = _mk(w=4, heads=heads, d=d, dtype=jnp.bfloat16, seed=5)
    scale = d**-0.5
    want = winattn.reference_window_attention(qkv, bias, None, scale, heads)
    got = winattn.fused_window_attention(qkv, bias, None, scale, heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=0.05, atol=0.05
    )


def test_eligibility_gate():
    # CPU backend: never eligible in the model path
    assert not winattn.eligible(4096, 64, 96, 6, None)
    # on-TPU checks are shape-only
    assert winattn.eligible(4096, 64, 96, 6, None, backend="tpu")
    assert winattn.eligible(4096, 64, 96, 6, 256, backend="tpu")
    assert not winattn.eligible(4096, 63, 96, 6, None, backend="tpu")  # ragged tokens
    assert not winattn.eligible(4096, 64, 100, 6, None, backend="tpu")  # c % heads
    assert not winattn.eligible(4100, 64, 96, 6, 256, backend="tpu")  # W % nW


def test_fused_2d_matches_reference():
    """Image-layout kernel (windows consumed in place) vs the partition ->
    reference -> reverse formulation, unmasked and masked."""
    from pssr2_tpu.models.swinir import _shift_attn_mask

    heads, d, ws = 2, 8, 8
    b, h, w = 2, 16, 32
    c = heads * d
    rng = np.random.default_rng(11)
    qkv_img = jnp.asarray(rng.standard_normal((b, h, w, 3 * c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * 0.1, jnp.float32)
    scale = d**-0.5

    want = winattn.reference_window_attention_2d(qkv_img, bias, None, scale, heads, ws)
    got = winattn.fused_window_attention_2d(qkv_img, bias, None, scale, heads, ws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    mask_spec = (h, w, ws, 4)
    mask = jnp.asarray(_shift_attn_mask(*mask_spec))
    want = winattn.reference_window_attention_2d(qkv_img, bias, mask, scale, heads, ws)
    got = winattn.fused_window_attention_2d(qkv_img, bias, mask_spec, scale, heads, ws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_2d_vjp_matches_reference_grads():
    heads, d, ws = 2, 4, 4
    b, h, w = 2, 8, 8
    c = heads * d
    rng = np.random.default_rng(13)
    qkv_img = jnp.asarray(rng.standard_normal((b, h, w, 3 * c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * 0.1, jnp.float32)
    scale = d**-0.5

    fused = lambda a, bb: winattn.fused_window_attention_2d(a, bb, None, scale, heads, ws, interpret=True)
    ref = lambda a, bb: winattn.reference_window_attention_2d(a, bb, None, scale, heads, ws)
    lf = lambda fn: (lambda a, bb: (fn(a, bb) ** 2).mean())
    g_fused = jax.grad(lf(fused), argnums=(0, 1))(qkv_img, bias)
    g_ref = jax.grad(lf(ref), argnums=(0, 1))(qkv_img, bias)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-5)
