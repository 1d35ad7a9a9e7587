"""int8 post-training quantization (pssr2_tpu/quant.py).

The int8 serving path has no reference counterpart (the reference serves
the f32 eval forward only — reference: pssr/predict.py:39); these tests
pin its own correctness: exact integer conv math, bounded error vs the
fp forward, calibration/site coverage, and the eval-mode guard.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from pssr2_tpu.models import ResUNet, ResUNetA
from pssr2_tpu.quant import (
    QuantizedResUNet,
    int8_conv,
    quantize_resunet,
    quantize_tensor,
    _weight_scales,
)


def _tiny_model(dtype=None):
    model = ResUNet(hidden=[8, 16], scale=2, depth=1, dtype=dtype, rngs=nnx.Rngs(0))
    model.eval()
    return model


def _batches(n=2, b=2, res=16, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.random((b, 1, res, res)).astype(np.float32) * 255 for _ in range(n)]


def test_int8_conv_matches_numpy_integer_math():
    rng = np.random.default_rng(1)
    x8 = rng.integers(-127, 128, (1, 6, 6, 3)).astype(np.int8)
    w8 = rng.integers(-127, 128, (3, 3, 3, 4)).astype(np.int8)
    y = np.asarray(int8_conv(jnp.asarray(x8), jnp.asarray(w8)))
    xp = np.pad(x8.astype(np.int64), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((1, 6, 6, 4), np.int64)
    for i in range(6):
        for j in range(6):
            patch = xp[0, i : i + 3, j : j + 3, :]
            ref[0, i, j] = np.tensordot(patch, w8.astype(np.int64), axes=3)
    assert y.dtype == np.int32
    np.testing.assert_array_equal(y, ref)


def test_weight_scales_reconstruct():
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 5)).astype(np.float32))
    w8, s = _weight_scales(k)
    assert w8.dtype == jnp.int8
    err = np.abs(np.asarray(w8, np.float32) * np.asarray(s) - np.asarray(k))
    # per-channel quantization step is s; rounding error bounded by s/2
    assert (err <= np.asarray(s)[None, None, None, :] / 2 + 1e-7).all()


def test_quantize_tensor_range():
    x = jnp.asarray([[-300.0, -1.0, 0.0, 1.0, 300.0]])
    q = quantize_tensor(x, jnp.float32(1.0))
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q), [[-127, -1, 0, 1, 127]])


def test_quantized_forward_close_to_fp():
    model = _tiny_model()
    q = quantize_resunet(model, _batches())
    x = jnp.asarray(_batches(n=1, seed=7)[0])
    ref = np.asarray(model(x), np.float32)
    out = np.asarray(q(x), np.float32)
    assert out.shape == ref.shape
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, f"int8 relative L2 error {rel:.4f}"
    # and it actually lost SOME precision (the path is not secretly fp)
    assert not np.array_equal(out, ref)


def test_quantized_forward_bf16_glue():
    model = _tiny_model(dtype=jnp.bfloat16)
    q = quantize_resunet(model, _batches())
    x = jnp.asarray(_batches(n=1, seed=8)[0])
    ref = np.asarray(model(x), np.float32)
    out = np.asarray(q(x), np.float32)
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05


def test_quantized_deterministic_and_pure():
    model = _tiny_model()
    q = quantize_resunet(model, _batches())
    x = jnp.asarray(_batches(n=1, seed=9)[0])
    a = np.asarray(q(x))
    b = np.asarray(q(x))
    np.testing.assert_array_equal(a, b)
    # pure-functional core: apply(params, x) == __call__(x)
    c = np.asarray(q.apply(q.params, x))
    np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-5)


def test_bn_folding_with_scrambled_running_stats():
    """Random-init BN stats (mean 0, var 1) would hide folding bugs; this
    scrambles every BN's running stats + affine and demands the int8
    forward still track fp closely (folding is algebraically exact; the
    residual is quantization noise only)."""
    model = _tiny_model()
    rng = np.random.default_rng(11)

    def scramble(norm):
        c = norm.mean[...].shape[-1]
        norm.mean[...] = jnp.asarray(rng.normal(0, 0.5, c), jnp.float32)
        norm.var[...] = jnp.asarray(rng.uniform(0.3, 2.0, c), jnp.float32)
        norm.scale[...] = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
        norm.bias[...] = jnp.asarray(rng.normal(0, 0.3, c), jnp.float32)

    scramble(model.norm)
    for blk in list(model.encoder) + list(model.decoder):
        for n in blk.norms:
            if n is not None:
                scramble(n)
    q = quantize_resunet(model, _batches())
    x = jnp.asarray(_batches(n=1, seed=12)[0])
    ref = np.asarray(model(x), np.float32)
    out = np.asarray(q(x), np.float32)
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.02, f"int8 relative L2 error with scrambled BN stats: {rel:.4f}"


def test_site_coverage_counts():
    model = _tiny_model()
    q = quantize_resunet(model, _batches())
    conv_sites = [k for k in q.params if k.startswith(("enc", "dec"))]
    # hidden [8,16], depth 1 -> n_layers 2: 2 enc + 1 dec blocks,
    # each with 2 convs + 1 respass
    assert len(conv_sites) == 3 * 3
    assert "recon" in q.params and "norm.a" in q.params
    for k in conv_sites:
        assert q.params[k]["w8"].dtype == jnp.int8


def test_requires_eval_mode():
    model = ResUNet(hidden=[8, 16], scale=2, depth=1, rngs=nnx.Rngs(0))
    model.train()
    with pytest.raises(ValueError, match="eval"):
        quantize_resunet(model, _batches())


def test_quantized_resuneta_close_to_fp():
    """Atrous branches (pre-BN as glue affine, dilated int8 convs) + PSP
    pooling (1x1 int8 convs) + encoder_pool all quantize."""
    model = ResUNetA(hidden=[8, 16], scale=2, depth=1,
                     dilations=[[1, 2], [1]], pool_sizes=[1, 2],
                     encoder_pool=True, rngs=nnx.Rngs(0))
    model.eval()
    q = quantize_resunet(model, _batches(res=32))
    x = jnp.asarray(_batches(n=1, res=32, seed=7)[0])
    ref = np.asarray(model(x), np.float32)
    out = np.asarray(q(x), np.float32)
    assert out.shape == ref.shape
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, f"int8 relative L2 error {rel:.4f}"
    assert not np.array_equal(out, ref)
    # atrous sites: branch-layer convs carry the pre-BN affine
    assert "bn_a" in q.params["enc0.b0.l0"]
    # PSP sites present for both pools
    assert "encp.out" in q.params and "reconp.s0" in q.params
    # atrous models have no input norm
    assert "norm.a" not in q.params


def test_resuneta_eval_mode_guard():
    model = ResUNetA(hidden=[8, 16], scale=2, depth=1,
                     dilations=[[1, 2], [1]], pool_sizes=[1, 2], rngs=nnx.Rngs(0))
    model.train()
    with pytest.raises(ValueError, match="eval"):
        quantize_resunet(model, _batches(res=32))


def test_unsupported_configs_raise():
    class NotAResUNet:
        pass

    with pytest.raises(NotImplementedError, match="ResUNet family"):
        quantize_resunet(NotAResUNet(), _batches())


def _tiny_rdres():
    from pssr2_tpu.models import RDResUNet

    model = RDResUNet(hidden=[16, 16], scale=2, depth=1, rdnet_init=16,
                      growth_rates=[4, 4], ds_blocks=[False, True],
                      ese_blocks=[False, True], n_blocks=[1, 1], rngs=nnx.Rngs(0))
    model.eval()
    return model


def test_quantized_rdresunet_close_to_fp():
    """Hybrid quant: FP RDNet encoder + int8 decoder/recon matches the fp
    forward closely (the encoder is bit-identical; only the decoder-side
    convs carry quantization error)."""
    from pssr2_tpu.quant import quantize_rdresunet

    model = _tiny_rdres()
    q = quantize_rdresunet(model, _batches(res=32))
    x = jnp.asarray(_batches(n=1, res=32, seed=7)[0])
    ref = np.asarray(model(x), np.float32)
    out = np.asarray(q(x), np.float32)
    assert out.shape == ref.shape
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 0.05, f"int8 relative L2 error {rel:.4f}"
    assert not np.array_equal(out, ref)
    # encoder state ships FP, decoder convs int8
    assert "fp_enc" in q.params and q.params["dec0.c0"]["w8"].dtype == jnp.int8


def test_quantized_mesh_inference_matches_single_device():
    """The int8 executor tile-shards over a data mesh (predict._eval_forward
    shard_map path) with outputs identical to the single-device run."""
    from pssr2_tpu.parallel import data_mesh
    from pssr2_tpu.predict import _eval_forward

    model = _tiny_model()
    q = quantize_resunet(model, _batches())
    x = _batches(n=1, b=8, seed=9)[0]
    single = np.asarray(q(jnp.asarray(x)))
    sharded = np.asarray(_eval_forward(q, mesh=data_mesh())(x))
    np.testing.assert_array_equal(sharded, single)


def test_rdresunet_quant_guards():
    from pssr2_tpu.quant import quantize_rdresunet

    model = _tiny_rdres()
    model.train()
    with pytest.raises(ValueError, match="eval"):
        quantize_rdresunet(model, _batches(res=32))
    with pytest.raises(NotImplementedError, match="RDResUNet"):
        quantize_rdresunet(object(), _batches(res=32))


def test_empty_calibration_raises():
    with pytest.raises(ValueError, match="calib"):
        quantize_resunet(_tiny_model(), [])


def test_calibrate_from_dataset(tmp_path):
    """Calibration batches come from the train split (LR side), batched."""
    import os

    from pssr2_tpu.data import ImageDataset, tiff

    rng = np.random.default_rng(4)
    os.makedirs(tmp_path / "imgs")
    for i in range(6):
        tiff.imwrite(tmp_path / "imgs" / f"{i}.tif", rng.integers(0, 255, (32, 32)).astype(np.uint8))
    ds = ImageDataset(tmp_path / "imgs", hr_res=32, lr_scale=2, val_split=0.5)
    from pssr2_tpu.quant import calibrate_from_dataset

    batches = calibrate_from_dataset(ds, n_batches=2, batch_size=2)
    assert len(batches) >= 1
    for b in batches:
        assert b.ndim == 4 and b.shape[1:] == (1, 16, 16)  # NCHW LR

    # val_split=1 (predict-mode) datasets fall back to the val indices
    ds_all = ImageDataset(tmp_path / "imgs", hr_res=32, lr_scale=2, val_split=1)
    assert len(calibrate_from_dataset(ds_all, n_batches=1, batch_size=2)) == 1


def test_cli_int8_predict_and_export(tmp_path, monkeypatch):
    """`pssr2-tpu -q8` quantizes before predict; `-q8 -ex` exports the
    int8 artifact (calibrated on -dp)."""
    import os
    import sys

    from pssr2_tpu.checkpoint import save_weights
    from pssr2_tpu.data import tiff
    from pssr2_tpu.__main__ import main

    rng = np.random.default_rng(5)
    os.makedirs(tmp_path / "imgs")
    for i in range(3):
        tiff.imwrite(tmp_path / "imgs" / f"{i}.tif", rng.integers(0, 255, (32, 32)).astype(np.uint8))
    model = ResUNet(hidden=[8, 16], depth=1, scale=2)
    save_weights(model, str(tmp_path / "w.npz"))
    monkeypatch.chdir(tmp_path)

    common = [
        "-dp", str(tmp_path / "imgs"),
        "-dt", "ImageDataset(hr_res=32, lr_scale=2)",
        "-mt", "ResUNet(hidden=[8, 16], depth=1, scale=2)",
        "-mp", str(tmp_path / "w.npz"),
    ]
    monkeypatch.setattr(sys, "argv", ["pssr2-tpu", *common, "-q8"])
    main()
    assert list((tmp_path / "preds").glob("*.tif"))

    monkeypatch.setattr(
        sys, "argv", ["pssr2-tpu", *common, "-q8", "-ex", "m8.shlo", "-lres", "16"]
    )
    main()
    from pssr2_tpu.export import load_exported

    serve = load_exported(str(tmp_path / "m8.shlo"))
    assert serve(np.zeros((2, 1, 16, 16), np.float32)).shape == (2, 1, 32, 32)


def test_cli_int8_guards(tmp_path, monkeypatch, capsys):
    """-q8 with --train or without -dp exits with an actionable message."""
    import sys

    from pssr2_tpu.__main__ import main

    monkeypatch.setattr(sys, "argv", ["pssr2-tpu", "-q8", "-t", "-dp", "x"])
    main()
    assert "cannot be combined with --train" in capsys.readouterr().out

    monkeypatch.setattr(sys, "argv", ["pssr2-tpu", "-q8", "-mp", "w.npz"])
    main()
    assert "calibration" in capsys.readouterr().out


def test_quantized_in_predict_loop():
    """QuantizedResUNet satisfies the predict-path model contract."""
    import os
    import tempfile

    from pssr2_tpu.data import PairedImageDataset
    from pssr2_tpu.data import tiff
    from pssr2_tpu.predict import predict_images

    model = _tiny_model()
    q = quantize_resunet(model, _batches(res=16))
    rng = np.random.default_rng(3)
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(f"{d}/hr"), os.makedirs(f"{d}/lr")
        for i in range(2):
            tiff.imwrite(f"{d}/hr/{i}.tif", rng.integers(0, 255, (32, 32)).astype(np.uint8))
            tiff.imwrite(f"{d}/lr/{i}.tif", rng.integers(0, 255, (16, 16)).astype(np.uint8))
        ds = PairedImageDataset(f"{d}/hr", f"{d}/lr", hr_res=32, lr_scale=2)
        out_dir = f"{d}/preds"
        predict_images(q, ds, out_dir=out_dir)
        assert len(os.listdir(out_dir)) == 2


def test_quantized_resblock_chain_path_matches_xla_engine():
    """The fused int8 conv-chain (ops/pallas/q8chain, interpret mode)
    vs the per-conv XLA int8 engine on a chain-eligible model
    (32-aligned channels, lane-packable 16x16 input): same scheme, so
    outputs must agree to fp-glue noise (the chain skips the XLA path's
    mid-chain glue-dtype round-trip, so bitwise equality is not
    expected; closeness IS)."""
    from pssr2_tpu.ops.pallas import q8chain

    model = ResUNet(hidden=[32, 64], scale=2, depth=1, rngs=nnx.Rngs(0))
    model.eval()
    q = quantize_resunet(model, _batches())
    x = jnp.asarray(_batches(n=1, seed=7)[0])

    from pssr2_tpu.quant import QuantizedResUNet

    old = q8chain.MODE
    try:
        # eligibility is consulted at TRACE time, so each mode needs a
        # fresh executor (q's cached jit pinned the mode of its first call)
        q8chain.MODE = "off"
        ref = np.asarray(QuantizedResUNet(q.params, q._meta)(x), np.float32)
        q8chain.MODE = "interpret"
        calls = []
        orig = q8chain.q8_conv_layer
        q8chain.q8_conv_layer = lambda *a, **k: (calls.append(a[0].shape), orig(*a, **k))[1]
        try:
            out = np.asarray(QuantizedResUNet(q.params, q._meta)(x), np.float32)
        finally:
            q8chain.q8_conv_layer = orig
    finally:
        q8chain.MODE = old
    assert calls, "q8chain never engaged — test is vacuous"
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 5e-3, f"chain-vs-XLA int8 relative L2 error {rel:.5f}"
