"""Model shape-contract tests (reference-style: tests/test_models.py) plus
SwinIR coverage, which the reference leaves untested (test_models.py:52)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from pssr2_tpu.models import RDResUNet, RDResUNetA, ResUNet, ResUNetA, SwinIR

from _util import get_shape

# Smaller spatial sizes than the reference's 128->512 (CPU test budget);
# the bench exercises full 128->512 on TPU.
LR_RES = 32
HR_RES = 128


def _image(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random(shape) * 255, dtype=jnp.float32)


def _run(model, channels):
    model.eval()
    lr_shape = get_shape(LR_RES, channels[0])
    hr_shape = get_shape(HR_RES, channels[1])
    out = model(_image(lr_shape))
    assert tuple(out.shape) == hr_shape


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        dict(channels=[3, 3]),
        dict(channels=[3, 1]),
        dict(dilations=[[1, 3, 15, 31], [1, 3, 15], [1, 3], [1], [1]]),
        dict(pool_sizes=[1, 2, 4, 8]),
        dict(pool_sizes=[1, 2, 4, 8], encoder_pool=True),
    ],
    ids=["default", "ch33", "ch31", "atrous", "psp", "psp_enc"],
)
def test_resunet(kwargs):
    # hidden must double layer-to-layer (decoder channel formula, as in the
    # reference's defaults); encoder_pool needs smaller pool sizes at this res
    small = dict(hidden=[16, 32, 64, 128])
    if "dilations" in kwargs:
        kwargs = dict(kwargs, dilations=kwargs["dilations"][1:])  # match 4 layers
    if kwargs.get("encoder_pool"):
        kwargs = dict(kwargs, pool_sizes=[1, 2])
    model = ResUNet(**small, **kwargs)
    assert str(model)
    _run(model, kwargs.get("channels", [1, 1]))


def test_resuneta():
    model = ResUNetA(hidden=[16, 32, 64, 128], dilations=[[1, 3], [1, 3], [1], [1]])
    assert str(model)
    _run(model, [1, 1])


RD_SMALL = dict(
    hidden=[64, 64, 32],
    rdnet_init=32,
    growth_rates=[16, 16, 16],
    ds_blocks=[False, True, True],
    ese_blocks=[False, True, True],
    n_blocks=[2, 2, 2],
)


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        dict(channels=[3, 3]),
        dict(channels=[3, 1]),
        dict(dilations=[[1], [1], [1, 3]]),
        dict(pool_sizes=[1, 2, 4, 8]),
        dict(pool_sizes=[1, 2, 4, 8], encoder_pool=True),
    ],
    ids=["default", "ch33", "ch31", "atrous", "psp", "psp_enc"],
)
def test_rdresunet(kwargs):
    if kwargs.get("encoder_pool"):
        kwargs = dict(kwargs, pool_sizes=[1, 2])
    model = RDResUNet(**RD_SMALL, **kwargs)
    assert str(model)
    _run(model, kwargs.get("channels", [1, 1]))


def test_rdresuneta():
    model = RDResUNetA(**RD_SMALL, dilations=[[1], [1], [1, 3]])
    assert str(model)
    _run(model, [1, 1])


SWIN_SMALL = dict(image_size=LR_RES, embed_dim=24, depths=[2, 2], num_heads=[2, 2], window_size=8)


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        dict(channels=[3, 3]),
        dict(upsampler="pixelshuffledirect"),
        dict(upsampler="nearest+conv"),
        dict(resi_connection="3conv"),
        dict(ape=True),
        dict(use_checkpoint=True),
    ],
    ids=["default", "ch33", "direct", "nearest", "3conv", "ape", "remat"],
)
def test_swinir(kwargs):
    model = SwinIR(**SWIN_SMALL, **kwargs)
    assert str(model)
    _run(model, kwargs.get("channels", [1, 1]))


def test_swinir_nonmultiple_input():
    # pad-to-window-multiple path (reference: swinir.py:208-213)
    model = SwinIR(image_size=30, embed_dim=24, depths=[2], num_heads=[2], window_size=8, scale=2)
    model.eval()
    out = model(_image((1, 1, 30, 30)))
    assert tuple(out.shape) == (1, 1, 60, 60)


def test_swinir_denoise_head():
    model = SwinIR(**SWIN_SMALL, scale=1, upsampler=None)
    model.eval()
    out = model(_image((1, 1, LR_RES, LR_RES)))
    assert tuple(out.shape) == (1, 1, LR_RES, LR_RES)


def test_resunet_train_eval_batchnorm():
    model = ResUNet(hidden=[8, 16])
    x = _image((2, 1, 16, 16))
    model.train()
    out_train = model(x / 1.0)
    model.eval()
    out_eval = model(x)
    assert out_train.shape == out_eval.shape
    # batch stats updated during train mode
    assert float(jnp.abs(model.norm.mean.value).sum()) > 0


def test_reconstruction_fused_head_matches_standard():
    """The phase-space fused head (ops/smallconv.py) computes exactly
    conv3x3(pixel_shuffle(x, s)) for small C_out — the TPU-native
    re-expression of the reference head (pssr/models/_blocks.py:6-18)."""
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.models.blocks import Reconstruction

    for cout, scale in [(1, 4), (3, 2), (2, 4)]:
        rec = Reconstruction(1, cout, 8, scale, rngs=nnx.Rngs(0))
        assert rec.fused_head
        x = jnp.asarray(np.random.default_rng(1).random((2, 12, 12, 9)).astype(np.float32))
        fused = np.asarray(rec(x))
        rec.fused_head = False
        std = np.asarray(rec(x))
        np.testing.assert_allclose(fused, std, atol=1e-4)
        assert np.abs(fused - std).max() < 1e-5


def test_swinir_fused_tail_matches_standard():
    """SwinIR's fused shuffle+conv_last tail equals the naive path."""
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.models import SwinIR
    from pssr2_tpu.ops.shuffle import pixel_shuffle
    from pssr2_tpu.ops.smallconv import fused_upsample_tail

    model = SwinIR(image_size=16, embed_dim=8, depths=[1], num_heads=[2], window_size=4, scale=4)
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 8)).astype(np.float32))
    # exercise just the tail pair on a matching-shaped input
    feat = jnp.asarray(np.random.default_rng(1).random((1, 32, 32, model.upsample[-1].kernel.shape[2])).astype(np.float32))
    fused = np.asarray(fused_upsample_tail(feat, model.upsample[-1], model.conv_last, 2))
    std = np.asarray(model.conv_last(pixel_shuffle(model.upsample[-1](feat), 2, channels_last=True)))
    np.testing.assert_allclose(fused, std, atol=1e-5)


def test_fused_head_gradient_matches_autodiff_reference():
    """The custom VJP on the phase-resolve step (ops/smallconv.py) is the
    hand-written transpose of a linear op; its gradients must equal autodiff
    through the naive shuffle+conv formulation for all inputs (y, kernel,
    bias).  The custom VJP exists because XLA materializes the phase-
    extended tensor (3.2 GB on canonical shapes) in the autodiff backward
    when composed with the SSIM loss (experiments/mxu_probe10)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pssr2_tpu.ops import smallconv as sc
    from pssr2_tpu.ops.shuffle import pixel_shuffle

    rng = np.random.default_rng(0)
    for s, B, H, W, C, Cout in [(4, 2, 8, 8, 5, 1), (2, 1, 6, 7, 3, 2), (3, 2, 5, 5, 4, 3)]:
        y_cm = jnp.asarray(rng.random((B, H, W, s * s * C), np.float32))
        perm = sc.phase_major_perm(C, s)
        k = jnp.asarray(rng.random((3, 3, C, Cout), np.float32) - 0.5)
        b = jnp.asarray(rng.random((Cout,), np.float32))

        def ref(y_cm, k, b):
            xs = pixel_shuffle(y_cm, s, channels_last=True)
            o = lax.conv_general_dilated(
                xs, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            return o + b

        def fused(y_cm, k, b):
            return sc.shuffle_conv_small(y_cm[..., perm], k, b, scale=s)

        np.testing.assert_allclose(
            np.asarray(fused(y_cm, k, b)), np.asarray(ref(y_cm, k, b)), rtol=1e-5, atol=1e-5
        )
        g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(fused(*a))), argnums=(0, 1, 2))(y_cm, k, b)
        g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))), argnums=(0, 1, 2))(y_cm, k, b)
        for got, want in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_fast_batchnorm_matches_nnx_batchnorm():
    """ops/batchnorm.py FastBatchNorm (analytic-VJP BN) must match
    nnx.BatchNorm: forward train/eval values, running stats, and
    gradients (f32 exact; bf16 within bf16 quantization — nnx rounds its
    scale grad through a bf16 cast, the analytic form accumulates f32)."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.ops.batchnorm import FastBatchNorm

    rng = np.random.default_rng(0)
    for dtype, ytol, gtol in ((None, 1e-6, 1e-5), (jnp.bfloat16, 2e-2, None)):
        x = jnp.asarray(rng.random((4, 8, 8, 5), np.float32) * 3 - 1)
        if dtype:
            x = x.astype(dtype)
        scale = jnp.asarray(rng.random(5, np.float32) + 0.5)
        bias = jnp.asarray(rng.random(5, np.float32) - 0.5)

        def make(cls):
            m = (
                FastBatchNorm(5, momentum=0.9, epsilon=1e-5, dtype=dtype)
                if cls is FastBatchNorm
                else nnx.BatchNorm(5, momentum=0.9, epsilon=1e-5, dtype=dtype, rngs=nnx.Rngs(0))
            )
            m.scale[...] = scale
            m.bias[...] = bias
            return m

        ref, fast = make(nnx.BatchNorm), make(FastBatchNorm)
        ref.train(), fast.train()
        np.testing.assert_allclose(
            np.asarray(fast(x), np.float32), np.asarray(ref(x), np.float32), atol=ytol, rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(fast.mean[...]), np.asarray(ref.mean[...]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fast.var[...]), np.asarray(ref.var[...]), rtol=1e-5)

        def loss(cls, scale, bias, x):
            m = make(cls)
            m.train()
            m.scale[...] = scale
            m.bias[...] = bias
            return jnp.sum(jnp.sin(m(x).astype(jnp.float32)) * 1.7)

        g_ref = jax.grad(lambda s, b, xx: loss(nnx.BatchNorm, s, b, xx), argnums=(0, 1, 2))(scale, bias, x)
        g_fast = jax.grad(lambda s, b, xx: loss(FastBatchNorm, s, b, xx), argnums=(0, 1, 2))(scale, bias, x)
        for got, want in zip(g_fast, g_ref):
            if gtol is None:  # bf16: compare at bf16 resolution
                np.testing.assert_allclose(
                    np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=8e-3, atol=5e-2
                )
            else:
                np.testing.assert_allclose(
                    np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=1e-4, atol=gtol
                )

        ref.eval(), fast.eval()
        np.testing.assert_allclose(
            np.asarray(fast(x), np.float32), np.asarray(ref(x), np.float32), atol=ytol, rtol=1e-5
        )


def test_sgbias_conv_semantics():
    """SGBiasConv: identical forward (bitwise) with/without sg_bias; bias
    gradient exactly zero only when the conv feeds a TRAIN-mode BN (the BN
    backward annihilates constant shifts — ops/batchnorm.py derivation);
    eval-mode and non-BN (respass) biases keep real gradients."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.models.blocks import ResBlock, conv

    rng = np.random.default_rng(0)
    for ks, dil in [(3, 1), (1, 1), (3, 2)]:
        c = conv(5, 7, ks, rngs=nnx.Rngs(0), dilation=dil)
        x = jnp.asarray(rng.random((2, 16, 16, 5), np.float32))
        np.testing.assert_array_equal(np.asarray(c(x, sg_bias=True)), np.asarray(c(x)))

    blk = ResBlock(4, 8, depth=1, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.random((2, 8, 8, 4), np.float32))

    def blk_loss(model, x):
        return jnp.sum(model(x) ** 2)

    def bias_grads(grads):
        out = {}
        for p, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
            s = jax.tree_util.keystr(p)
            if "'bias'" in s and hasattr(leaf, "shape"):
                out[s] = float(jnp.abs(leaf).max())
        return out

    blk.train()
    g = bias_grads(nnx.grad(blk_loss)(blk, x))
    assert all(v == 0.0 for k, v in g.items() if "'convs'" in k)
    assert all(v > 0.0 for k, v in g.items() if "'respass'" in k)
    blk.eval()
    ge = bias_grads(nnx.grad(blk_loss)(blk, x))
    assert any(v > 0.0 for k, v in ge.items() if "'convs'" in k)


def test_phase_resolve_conv_form_matches_slices(monkeypatch):
    """Z_RESOLVE="conv" expresses the phase resolve as one 3x3 selection
    conv — identical terms to the slice-add form, conv-order f32
    accumulation, so values/grads must match to fp-reassociation level."""
    import jax
    import jax.numpy as jnp

    from pssr2_tpu.ops import smallconv as sc

    rng = np.random.default_rng(3)
    for s, B, H, W, C, Cout in [(4, 2, 8, 8, 5, 1), (2, 1, 6, 7, 3, 2), (4, 1, 5, 6, 2, 3)]:
        y_pm = jnp.asarray(rng.random((B, H, W, s * s * C), np.float32))
        k = jnp.asarray(rng.random((3, 3, C, Cout), np.float32) - 0.5)
        b = jnp.asarray(rng.random((Cout,), np.float32))

        def run(y_pm, k, b):
            return sc.shuffle_conv_small(y_pm, k, b, scale=s)

        monkeypatch.setattr(sc, "Z_RESOLVE", "slices")
        ref = np.asarray(run(y_pm, k, b))
        g_ref = jax.grad(lambda *a: jnp.sum(jnp.sin(run(*a))), argnums=(0, 1, 2))(y_pm, k, b)
        monkeypatch.setattr(sc, "Z_RESOLVE", "conv")
        got = np.asarray(run(y_pm, k, b))
        g_got = jax.grad(lambda *a: jnp.sum(jnp.sin(run(*a))), argnums=(0, 1, 2))(y_pm, k, b)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
        for a, e in zip(g_got, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-5)

    # bf16 activations (the canonical bench model's dtype): the conv form's
    # custom VJP must pair dtypes itself — autodiff over the raw conv fails
    # with f32-cotangent x bf16-kernel (the mxu_probe36 crash).
    y16 = jnp.asarray(rng.random((2, 8, 8, 16 * 5), np.float32), jnp.bfloat16)
    k16 = jnp.asarray(rng.random((3, 3, 5, 1), np.float32) - 0.5, jnp.bfloat16)

    def run16(y_pm):
        return sc.shuffle_conv_small(y_pm, k16, None, scale=4)

    monkeypatch.setattr(sc, "Z_RESOLVE", "slices")
    ref16 = np.asarray(run16(y16), np.float32)
    g_ref16 = np.asarray(
        jax.grad(lambda a: jnp.sum(run16(a).astype(jnp.float32)))(y16), np.float32
    )
    monkeypatch.setattr(sc, "Z_RESOLVE", "conv")
    got16 = np.asarray(run16(y16), np.float32)
    g_got16 = np.asarray(
        jax.grad(lambda a: jnp.sum(run16(a).astype(jnp.float32)))(y16), np.float32
    )
    np.testing.assert_allclose(got16, ref16, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(g_got16, g_ref16, rtol=2e-2, atol=2e-2)


def test_fast_batchnorm_stats_modes_match(monkeypatch):
    """STATS_FWD variants (split reduces / MXU gram) compute the same
    statistics as the dual-sum path to fp-reassociation level — values,
    running stats, and gradients."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.ops import batchnorm as bn

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((4, 8, 8, 16), np.float32) * 3 - 1)

    def run(mode):
        monkeypatch.setattr(bn, "STATS_FWD", mode)
        m = bn.FastBatchNorm(16)
        y, grads = jax.value_and_grad(
            lambda s, b: (bn.bn_train(x * s, s, b, 1e-5)[0] ** 2).sum(), argnums=(0, 1)
        )(jnp.ones((16,)) * 1.3, jnp.ones((16,)) * 0.1)
        out = m(x)
        return y, grads, out, m.mean[...], m.var[...]

    ref = run("dual")
    for mode in ("split", "gram", "axes", "tpallas"):
        got = run(mode)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)

    # backward-stats formulations: same grads through every STATS_BWD mode
    monkeypatch.setattr(bn, "STATS_FWD", "dual")
    for mode in ("split", "gram", "axes", "tpallas"):
        monkeypatch.setattr(bn, "STATS_BWD", mode)
        got = run("dual")
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
