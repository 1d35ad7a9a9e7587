"""Parity tests for the fused Pallas SSIM kernel (ops/pallas/ssimfused)
against the XLA map path — values and gradients, via the Pallas
interpreter (CPU).  The real-TPU composition is measured in
experiments/mxu_probe25.py; numerics are identical by construction
(same f32 formulation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

# ops/__init__ re-exports the ssim *function* under the same name, which
# ``import pssr2_tpu.ops.ssim as m`` would resolve to — load the module
ssim_mod = importlib.import_module("pssr2_tpu.ops.ssim")
from pssr2_tpu.ops.pallas import ssimfused
from pssr2_tpu.util import SSIMLoss


@pytest.fixture
def _interpret_mode():
    old = ssimfused.MODE
    ssimfused.MODE = "interpret"
    yield
    ssimfused.MODE = old


def _rand_pair(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.random(shape, np.float32)),
        jnp.asarray(rng.random(shape, np.float32)),
    )


@pytest.mark.parametrize("shape", [(2, 1, 64, 64), (2, 3, 33, 47)])
def test_fused_parts_match_xla(shape, _interpret_mode):
    x, y = _rand_pair(shape)
    c1, c2 = 0.01**2, 0.03**2
    ssimfused.MODE = "off"
    ref = ssim_mod._ssim_parts(x, y, 1.0, 11, 1.5, (0.01, 0.03))
    ssimfused.MODE = "interpret"
    fus = ssim_mod._ssim_parts(x, y, 1.0, 11, 1.5, (0.01, 0.03))
    for a, b in zip(ref, fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_gradients_match_xla(_interpret_mode):
    x, y = _rand_pair((2, 1, 64, 64), seed=3)

    def loss(a, b):
        s, cs = ssim_mod._ssim_parts(a, b, 1.0, 11, 1.5, (0.01, 0.03))
        return s.mean() * 1.3 + cs.mean() * 0.7

    ssimfused.MODE = "off"
    ref = jax.grad(loss, argnums=(0, 1))(x, y)
    ssimfused.MODE = "interpret"
    fus = jax.grad(loss, argnums=(0, 1))(x, y)
    for a, b in zip(ref, fus):
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4 * scale)


def test_fused_ssim_loss_end_to_end(_interpret_mode):
    # the canonical training loss through the fused path: value + grad
    x, y = _rand_pair((2, 1, 192, 192), seed=7)
    loss_fn = SSIMLoss(mix=0.8, ms=True)

    ssimfused.MODE = "off"
    v_ref, g_ref = jax.value_and_grad(loss_fn)(x, y)
    ssimfused.MODE = "interpret"
    v_fus, g_fus = jax.value_and_grad(loss_fn)(x, y)
    assert abs(float(v_ref) - float(v_fus)) < 2e-5
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_fus), atol=1e-4 * scale)


def test_auto_gate_off_cpu():
    # on CPU the auto gate must reject (backend != tpu)
    x = jnp.zeros((1, 1, 64, 64), jnp.float32)
    assert ssimfused.MODE == "auto"
    assert not ssimfused.auto_ok(x, 11)


def test_fused_pool_level_matches_xla(_interpret_mode):
    """One MS level through fused_ssim_parts_pool: s/cs, the pooled
    tensors (bit-identical to _avg_pool2 on even dims), and gradients
    flowing through BOTH the stats and the pooled outputs."""
    from pssr2_tpu.ops.ssim import _avg_pool2, _ssim_parts

    x, y = _rand_pair((2, 1, 64, 96), seed=11)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2

    s, cs, xp, yp = ssimfused.fused_ssim_parts_pool(x, y, c1, c2, 11, 1.5, interpret=True)
    # fp-reassociation level only: the in-kernel pool's 4-term add
    # association differs from XLA's two-axis reduce
    np.testing.assert_allclose(np.asarray(xp), np.asarray(_avg_pool2(x)), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(_avg_pool2(y)), rtol=2e-6, atol=2e-6)
    ssimfused.MODE = "off"
    s_ref, cs_ref = _ssim_parts(x, y, 255.0, 11, 1.5, (0.01, 0.03))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(cs_ref), atol=2e-6)

    def loss_fused(x, y):
        s, cs, xp, yp = ssimfused.fused_ssim_parts_pool(x, y, c1, c2, 11, 1.5, interpret=True)
        return s.sum() + 0.5 * cs.sum() + (xp * yp).sum() * 1e-3

    def loss_ref(x, y):
        s, cs = _ssim_parts(x, y, 255.0, 11, 1.5, (0.01, 0.03))
        return s.sum() + 0.5 * cs.sum() + (_avg_pool2(x) * _avg_pool2(y)).sum() * 1e-3

    g_fus = jax.grad(loss_fused, argnums=(0, 1))(x, y)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    for a, b in zip(g_fus, g_ref):
        scale = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4 * scale)


def test_ms_fused_chain_odd_dims_falls_back(_interpret_mode):
    """Dims not divisible by 2^(levels-1) must take the generic path (the
    torch pool pads odd dims) and still match MODE=off exactly."""
    from pssr2_tpu.ops.ssim import ms_ssim

    x, y = _rand_pair((1, 1, 200, 200), seed=3)  # 200 % 16 != 0
    v_fus = float(ms_ssim(x, y))
    ssimfused.MODE = "off"
    v_ref = float(ms_ssim(x, y))
    assert abs(v_fus - v_ref) < 2e-6


def test_scaled_mixed_loss_matches_divided_path(_interpret_mode):
    """SSIMLoss.scaled(raw, raw, 1/255) (prescale + SSIM + windowed L1 +
    pool all in the level-0 kernel) must match the plain divided path —
    values and gradients."""
    x, y = _rand_pair((2, 1, 192, 192), seed=13)
    x, y = x * 255.0, y * 255.0
    loss_fn = SSIMLoss(mix=0.8, ms=True)

    def fused(x, y):
        return loss_fn.scaled(x, y, 255.0)

    def ref(x, y):
        ssimfused.MODE = "off"
        try:
            return loss_fn(x / 255.0, y / 255.0)
        finally:
            ssimfused.MODE = "interpret"

    v_ref, g_ref = jax.value_and_grad(ref, argnums=(0, 1))(x, y)
    v_fus, g_fus = jax.value_and_grad(fused, argnums=(0, 1))(x, y)
    assert abs(float(v_ref) - float(v_fus)) < 2e-5
    for a, b in zip(g_fus, g_ref):
        scale = float(jnp.abs(b).max())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4 * scale)


def test_per_sample_fused_matches_plain(_interpret_mode):
    """per_sample through the fused chain == MODE=off per_sample."""
    x, y = _rand_pair((3, 1, 192, 192), seed=17)
    loss_fn = SSIMLoss(mix=0.8, ms=True)
    v_fus = loss_fn.per_sample(x, y)
    ssimfused.MODE = "off"
    v_ref = loss_fn.per_sample(x, y)
    np.testing.assert_allclose(np.asarray(v_fus), np.asarray(v_ref), atol=2e-5)


def test_mesh_scope_gates_kernels(_interpret_mode):
    """ops/pallas/guard.mesh_scope must gate every single-chip kernel
    entry point (pallas is not SPMD-partitionable), even in interpret
    mode, and restore cleanly."""
    from pssr2_tpu.ops.pallas import swinblock, winattn
    from pssr2_tpu.ops.pallas.guard import kernels_allowed, mesh_scope

    x = jnp.zeros((1, 1, 64, 64), jnp.float32)
    assert kernels_allowed()
    assert ssimfused.auto_ok(x, 11)
    with mesh_scope():
        assert not kernels_allowed()
        assert not ssimfused.auto_ok(x, 11)
        assert not winattn.eligible(512, 64, 96, 6, None, backend="tpu")
        assert not winattn.eligible_2d(16, 128, 128, 96, 6, 8, backend="tpu")
        assert not swinblock.eligible(16, 128, 128, 96, 6, 8, backend="tpu")
    assert kernels_allowed()
    assert ssimfused.auto_ok(x, 11)
