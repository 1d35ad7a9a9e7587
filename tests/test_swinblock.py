"""Whole-block fused SwinIR kernel (ops/pallas/swinblock) parity tests —
interpret mode on CPU against the XLA reference block and the unfused
model path (reference semantics: swinir.py:270-389)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pssr2_tpu.models.swinir import SwinIR, _shift_attn_mask
from pssr2_tpu.ops.pallas import swinblock

HEADS, WS, C, HIDDEN = 6, 8, 96, 192
N = WS * WS
SCALE = (C // HEADS) ** -0.5


def _params(rng, dtype):
    mk = lambda *s, sc=0.1: jnp.asarray(rng.standard_normal(s).astype(np.float32) * sc)
    return (
        mk(C, sc=0.5) + 1.0, mk(C),
        mk(C, 3 * C), mk(3 * C),
        mk(C, C), mk(C),
        mk(C, sc=0.5) + 1.0, mk(C),
        mk(C, HIDDEN), mk(HIDDEN),
        mk(HIDDEN, C), mk(C),
        jnp.asarray(rng.standard_normal((HEADS, N, N)).astype(np.float32) * 0.02),
    )


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = swinblock.MODE
    swinblock.MODE = "interpret"
    yield
    swinblock.MODE = old


@pytest.mark.parametrize(
    "delta,shift,masked", [(0, 0, False), (4, 4, True), (4, 0, False)]
)
def test_kernel_matches_reference_f32(delta, shift, masked):
    rng = np.random.default_rng(delta * 10 + shift)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, C)).astype(np.float32))
    params = _params(rng, jnp.float32)
    kw = dict(heads=HEADS, scale=SCALE, ws=WS, delta=delta, shift=shift,
              mask_hw=(32, 32) if masked else None, eps=1e-6)
    out = swinblock.fused_swin_block(x, params, **kw)
    ref = swinblock.reference_block(x, params, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_kernel_matches_reference_bf16():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, C)), jnp.bfloat16)
    params = _params(rng, jnp.bfloat16)
    kw = dict(heads=HEADS, scale=SCALE, ws=WS, delta=4, shift=4, mask_hw=(32, 32), eps=1e-6)
    out = np.asarray(swinblock.fused_swin_block(x, params, **kw), np.float32)
    ref = np.asarray(swinblock.reference_block(x, params, **kw), np.float32)
    # kernel scores are f32 where the XLA einsum path is bf16 — agree to
    # bf16 rounding of the output scale (same tolerance as winattn)
    tol = 0.02 * max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(out, ref, atol=tol)


def test_custom_vjp_grad_matches_reference():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, C)).astype(np.float32))
    params = _params(rng, jnp.float32)
    kw = dict(heads=HEADS, scale=SCALE, ws=WS, delta=4, shift=4, mask_hw=(16, 16), eps=1e-6)
    loss_f = lambda x_: jnp.sum(swinblock.fused_swin_block(x_, params, **kw) ** 2)
    loss_r = lambda x_: jnp.sum(swinblock.reference_block(x_, params, **kw) ** 2)
    gf, gr = jax.grad(loss_f)(x), jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("knob", ["TRANSPOSED_HEADS", "NOMAX_SOFTMAX"])
def test_perf_knobs_match_reference(knob):
    """The round-3 perf knobs (head-transposed q/k/v layout, no-max
    softmax) must stay in the same numeric class as the plain kernel."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, C)).astype(np.float32))
    params = _params(rng, jnp.float32)
    kw = dict(heads=HEADS, scale=SCALE, ws=WS, delta=4, shift=4,
              mask_hw=(16, 16), eps=1e-6)
    ref = np.asarray(swinblock.reference_block(x, params, **kw))
    old = getattr(swinblock, knob)
    try:
        setattr(swinblock, knob, True)
        out = np.asarray(swinblock.fused_swin_block(x, params, **kw))
    finally:
        setattr(swinblock, knob, old)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fast_gelu_accuracy():
    """_gelu_fast vs exact gelu: |err| <= max(2.6e-4 abs, 0.5% rel)
    everywhere — the abs term covers the |y| <~ 0.07 band (peaking in the
    ~1e-4 dead zone near x = -4), the rel term everywhere else.  The bf16
    activation rounding itself is 0.39% rel, so the approximation stays in
    the activation-rounding noise class.  Positive tail exact (y = x,
    x > 4)."""
    x = jnp.asarray(np.linspace(-20, 20, 40001, dtype=np.float32))
    fast = np.asarray(swinblock._gelu_fast(x), np.float32)
    exact = np.asarray(jax.nn.gelu(x, approximate=False), np.float32)
    assert np.all(np.abs(fast - exact) <= np.maximum(2.6e-4, 5e-3 * np.abs(exact)))
    # bf16 activations: one more rounding on each side
    xb = x.astype(jnp.bfloat16)
    fb = np.asarray(swinblock._gelu_fast(xb), np.float32)
    eb = np.asarray(jax.nn.gelu(xb, approximate=False), np.float32)
    assert np.all(np.abs(fb - eb) <= np.maximum(5e-4, 1.6e-2 * np.abs(eb)))


def test_knobs_key_the_fused_fn_cache():
    """Flipping a module knob must produce a distinct cached trace — a
    stale cache would silently keep the old kernel configuration."""
    kw = (HEADS, SCALE, WS, 0, 0, None, 1e-6, True)
    f0 = swinblock._fused_fn(*kw, swinblock._knobs())
    old = swinblock.TRANSPOSED_HEADS
    try:
        swinblock.TRANSPOSED_HEADS = not old
        f1 = swinblock._fused_fn(*kw, swinblock._knobs())
    finally:
        swinblock.TRANSPOSED_HEADS = old
    assert f0 is not f1
    assert swinblock._fused_fn(*kw, swinblock._knobs()) is f0


def test_group_labels_factor_the_mask():
    mask = _shift_attn_mask(32, 32, WS, WS // 2)  # (nW, N, N)
    lab = swinblock._window_group_labels(32, 32, WS, WS // 2).reshape(-1, N)
    rebuilt = np.where(lab[:, None, :] != lab[:, :, None], -100.0, 0.0)
    np.testing.assert_array_equal(rebuilt, mask)


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_full_model_chain_matches_unfused(dtype):
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 1, 32, 32)), jnp.float32
    )
    model = SwinIR(image_size=32, depths=[2, 2], num_heads=[6, 6], scale=4, dtype=dtype)
    model.eval()
    swinblock.MODE = "off"
    y_off = np.asarray(model(x), np.float32)
    swinblock.MODE = "interpret"
    y_on = np.asarray(model(x), np.float32)
    tol = 2e-4 if dtype is None else 0.01 * np.abs(y_off).max()
    np.testing.assert_allclose(y_on, y_off, atol=max(tol, 1e-5))


def test_train_mode_with_drop_path_keeps_unfused_path(monkeypatch):
    """drop_path is stochastic in train mode — the fused chain must not
    engage (it would silently skip stochastic depth)."""
    model = SwinIR(image_size=32, depths=[2, 2], num_heads=[6, 6], scale=4)
    model.train()
    layer = model.layers[0].residual_group
    assert not layer._fused_chain_ok(1, 32, 32, C)
    model.eval()
    swinblock.MODE = "interpret"
    assert layer._fused_chain_ok(1, 32, 32, C)


def test_train_mode_gates_fused_paths_even_without_dropout():
    """The INFERENCE fused chain (_fused_chain_ok) stays eval-only via the
    ``deterministic`` flag even with every drop rate 0 — training goes
    through _fused_train_ok (the whole-block VJP kernels) instead, whose
    gradients are the kernel-forward's own VJP rather than bit-equal to
    the eval chain."""
    model = SwinIR(
        image_size=32, depths=[2, 2], num_heads=[6, 6], scale=4, drop_path_rate=0.0
    )
    swinblock.MODE = "interpret"
    layer = model.layers[0].residual_group
    model.train()
    assert not layer.blocks[0].attn.deterministic
    assert not layer._fused_chain_ok(1, 32, 32, C)
    model.eval()
    assert layer.blocks[0].attn.deterministic
    assert layer._fused_chain_ok(1, 32, 32, C)


@pytest.mark.parametrize("delta,shift,masked", [(0, 0, False), (4, 4, True)])
def test_train_kernel_grads_match_reference(delta, shift, masked):
    """fused_swin_block_train's whole-block VJP kernel vs jax.vjp of the
    XLA reference block, f32, all cotangents (x, every param), with live
    per-sample DropPath scales."""
    rng = np.random.default_rng(20 + delta)
    B = 2
    x = jnp.asarray(rng.standard_normal((B, 16, 16, C)).astype(np.float32))
    params = _params(rng, jnp.float32)
    s1 = jnp.asarray([1.25, 0.0], jnp.float32)
    s2 = jnp.asarray([0.0, 1.25], jnp.float32)
    kw = dict(heads=HEADS, scale=SCALE, ws=WS, delta=delta, shift=shift,
              mask_hw=(16, 16) if masked else None, eps=1e-6)

    def loss_f(x_, params_):
        return jnp.sum(swinblock.fused_swin_block_train(x_, params_, s1, s2, **kw) ** 2)

    def loss_r(x_, params_):
        return jnp.sum(
            swinblock.reference_block(x_, params_, scales=(s1, s2), **kw) ** 2
        )

    vf, gf = jax.value_and_grad(loss_f, argnums=(0, 1))(x, params)
    vr, gr = jax.value_and_grad(loss_r, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    for a, e in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-4
        )


def test_train_kernel_bf16_grads_reasonable():
    """bf16 train path: gradients stay in the bf16-rounding class of the
    reference autodiff (the kernel's poly-gelu/no-max-softmax forward is
    itself in that class)."""
    rng = np.random.default_rng(31)
    B = 2
    x = jnp.asarray(rng.standard_normal((B, 16, 16, C)), jnp.bfloat16)
    params = _params(rng, jnp.bfloat16)
    ones = jnp.ones((B,), jnp.float32)
    kw = dict(heads=HEADS, scale=SCALE, ws=WS, delta=4, shift=4,
              mask_hw=(16, 16), eps=1e-6)

    def loss_f(x_):
        return jnp.sum(
            swinblock.fused_swin_block_train(x_, params, ones, ones, **kw).astype(jnp.float32) ** 2
        )

    def loss_r(x_):
        return jnp.sum(
            swinblock.reference_block(x_, params, **kw).astype(jnp.float32) ** 2
        )

    gf = np.asarray(jax.grad(loss_f)(x), np.float32)
    gr = np.asarray(jax.grad(loss_r)(x), np.float32)
    scale_ = max(1.0, np.abs(gr).max())
    assert np.abs(gf - gr).max() <= 0.05 * scale_


def test_full_model_train_step_fused_matches_unfused():
    """Train-mode fused chain (fused fwd + whole-block VJP kernels) vs the
    unfused XLA path: loss and parameter gradients agree (f32,
    drop_path_rate=0 so both paths are deterministic)."""
    from flax import nnx

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 1, 32, 32)), jnp.float32
    )
    tgt = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (1, 1, 128, 128)), jnp.float32
    )
    model = SwinIR(
        image_size=32, depths=[2, 2], num_heads=[6, 6], scale=4, drop_path_rate=0.0
    )
    model.train()

    def loss_fn(m):
        return jnp.mean((m(x) - tgt) ** 2)

    swinblock.MODE = "off"
    l_off = float(loss_fn(model))
    g_off = nnx.grad(loss_fn)(model)
    swinblock.MODE = "interpret"
    l_on = float(loss_fn(model))
    g_on = nnx.grad(loss_fn)(model)
    assert abs(l_on - l_off) <= 1e-3 * max(1.0, abs(l_off))
    leaves_on = jax.tree.leaves(g_on)
    leaves_off = jax.tree.leaves(g_off)
    assert len(leaves_on) == len(leaves_off)
    for a, e in zip(leaves_on, leaves_off):
        a, e = np.asarray(a, np.float32), np.asarray(e, np.float32)
        tol = 1e-4 * max(1.0, np.abs(e).max())
        np.testing.assert_allclose(a, e, atol=max(tol, 1e-7), rtol=2e-3)


def test_drop_path_scales_distribution():
    """drop_path_scales: per-sample {0, 1/keep} values with the DropPathTok
    keep probability; ones when stochastic depth is off or in eval."""
    model = SwinIR(image_size=32, depths=[2], num_heads=[6], scale=4, drop_path_rate=0.5)
    model.train()
    blk = model.layers[0].residual_group.blocks[-1]
    keep = 1.0 - blk.drop_path.drop.rate
    vals = []
    for _ in range(40):
        s1, s2 = blk.drop_path_scales(4)
        vals += [np.asarray(s1), np.asarray(s2)]
    v = np.concatenate(vals)
    assert set(np.unique(v)).issubset({0.0, np.float32(1.0 / keep)})
    frac = (v > 0).mean()
    assert 0.75 * keep <= frac <= 1.25 * keep
    model.eval()
    s1, s2 = blk.drop_path_scales(4)
    assert np.all(np.asarray(s1) == 1.0) and np.all(np.asarray(s2) == 1.0)


def test_full_model_train_step_with_active_drop_path():
    """Fused train chain with stochastic depth LIVE: drop_path keys draw
    from the module's rng stream inside the grad trace; loss/grads stay
    finite and successive steps see different masks (rng state advances)."""
    from flax import nnx

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 1, 32, 32)), jnp.float32
    )
    model = SwinIR(
        image_size=32, depths=[2, 2], num_heads=[6, 6], scale=4, drop_path_rate=0.5
    )
    model.train()

    def loss_fn(m):
        return jnp.mean(m(x) ** 2)

    swinblock.MODE = "interpret"
    layer = model.layers[0].residual_group
    assert layer._fused_train_ok(2, 32, 32, C)
    l1, g1 = nnx.value_and_grad(loss_fn)(model)
    l2, g2 = nnx.value_and_grad(loss_fn)(model)
    for v in (l1, l2, *jax.tree.leaves(g1)):
        assert np.all(np.isfinite(np.asarray(v, np.float32)))
    # different masks across calls: losses differ with rate 0.5 on 8 blocks
    assert float(l1) != float(l2)


def test_reshape_heads_bit_identical():
    """RESHAPE_HEADS (sublane-split reshape head stacking) must be a pure
    re-expression: fwd outputs and train-path grads bit-equal to the
    slice/concat stacking."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, C)).astype(np.float32))
    params = _params(rng, jnp.float32)
    ones = jnp.ones((1,), jnp.float32)
    kw = dict(heads=HEADS, scale=SCALE, ws=WS, delta=4, shift=4, mask_hw=(16, 16), eps=1e-6)

    def train_loss(x_):
        return jnp.sum(swinblock.fused_swin_block_train(x_, params, ones, ones, **kw) ** 2)

    old = swinblock.RESHAPE_HEADS
    try:
        swinblock.RESHAPE_HEADS = False
        y0 = np.asarray(swinblock.fused_swin_block(x, params, **kw))
        g0 = np.asarray(jax.grad(train_loss)(x))
        swinblock.RESHAPE_HEADS = True
        y1 = np.asarray(swinblock.fused_swin_block(x, params, **kw))
        g1 = np.asarray(jax.grad(train_loss)(x))
    finally:
        swinblock.RESHAPE_HEADS = old
    np.testing.assert_array_equal(y0, y1)
    np.testing.assert_array_equal(g0, g1)


def test_rolled_chain_realign_fwd_and_grads_deep_group():
    """Regression for the r4 roll-space chain bug: with >=3 blocks per
    group, the 3rd block (shift 0 after shift ws/2) needs a +ws realign
    roll — the mod-ws delta alone leaves the rest of the group displaced
    by ws in roll space.  Window attention is roll-by-ws equivariant, so
    small-bias forwards agree almost exactly and only the
    relative-position-bias association + RSTB residual misalignment leak
    — the 3-seed convergence gate measured it as a systematic -0.12 dB
    endpoint cost.  Detector: LARGE bias tables + fwd equality + table
    GRADS (the most sensitive leaves) on a depth-4 group."""
    from flax import nnx

    model = SwinIR(image_size=32, depths=[4], num_heads=[6], drop_path_rate=0.0)
    model.train()
    rng = np.random.default_rng(5)
    for blk in model.layers[0].residual_group.blocks:
        t = blk.attn.relative_position_bias_table
        t.value = jnp.asarray(rng.normal(0, 0.5, t.value.shape), jnp.float32)
    x = jnp.asarray(rng.integers(0, 255, (1, 1, 32, 32)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 255, (1, 1, 128, 128)), jnp.float32)

    def loss_fn(m):
        return jnp.mean((m(x) - tgt) ** 2)

    old = swinblock.MODE
    try:
        swinblock.MODE = "off"
        l_off = float(loss_fn(model))
        g_off = nnx.grad(loss_fn)(model)
        swinblock.MODE = "interpret"
        l_on = float(loss_fn(model))
        g_on = nnx.grad(loss_fn)(model)
    finally:
        swinblock.MODE = old
    assert abs(l_on - l_off) <= 1e-4 * max(1.0, abs(l_off))
    for (p1, a), (p2, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_on),
        jax.tree_util.tree_leaves_with_path(g_off),
    ):
        a, e = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.sqrt(np.mean((a - e) ** 2)) / (np.sqrt(np.mean(e**2)) + 1e-30)
        assert rel < 5e-3, (str(p1), rel)
