"""Serving-export round trips (pssr2_tpu/export.py): serialize the eval
forward via jax.export, reload, and match the live model's outputs."""

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

from pssr2_tpu.export import export_model, load_exported
from pssr2_tpu.models import ResUNet, SwinIR


def _lr(batch, res=16):
    rng = np.random.default_rng(0)
    return rng.random((batch, 1, res, res)).astype(np.float32) * 255


def test_export_round_trip_dynamic_batch(tmp_path):
    model = ResUNet(hidden=[8, 16], depth=1, scale=2)
    model.eval()
    path = tmp_path / "resunet.shlo"
    export_model(model, str(path), lr_res=16)
    serve = load_exported(str(path))
    for batch in (1, 3):
        lr = _lr(batch)
        out = np.asarray(serve(lr))
        ref = np.asarray(model(jnp.asarray(lr)))
        assert out.shape == (batch, 1, 32, 32)
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_export_static_batch_rejects_other_batch(tmp_path):
    model = ResUNet(hidden=[8, 16], depth=1, scale=2)
    model.eval()
    path = tmp_path / "resunet_b1.shlo"
    export_model(model, str(path), lr_res=16, dynamic_batch=False)
    serve = load_exported(str(path))
    assert serve(_lr(1)).shape == (1, 1, 32, 32)
    with pytest.raises(Exception):
        serve(_lr(2))


def test_export_restores_training_mode(tmp_path):
    model = ResUNet(hidden=[8, 16], depth=1, scale=2)
    model.train()
    export_model(model, str(tmp_path / "m.shlo"), lr_res=16)
    # the first BatchNorm must still be in training mode afterwards
    bn = model.norm
    assert bn.use_running_average is False


def test_export_swinir(tmp_path):
    model = SwinIR(
        image_size=16, window_size=4, embed_dim=16, depths=[1], num_heads=[4],
        mlp_ratio=2, scale=2, drop_path_rate=0.0,
    )
    model.eval()
    path = tmp_path / "swinir.shlo"
    export_model(model, str(path), lr_res=16)
    serve = load_exported(str(path))
    lr = _lr(2)
    np.testing.assert_allclose(
        np.asarray(serve(lr)), np.asarray(model(jnp.asarray(lr))), atol=1e-5
    )


def test_export_quantized_executor(tmp_path):
    """The int8 executor exports like any other forward (quant.py docstring
    promise): weights + scales baked in, round-trips bit-exactly."""
    from pssr2_tpu.quant import quantize_resunet

    model = ResUNet(hidden=[8, 16], depth=1, scale=2)
    model.eval()
    calib = [_lr(2)]
    q = quantize_resunet(model, calib)
    path = tmp_path / "resunet_int8.shlo"
    export_model(q, str(path), lr_res=16)
    serve = load_exported(str(path))
    lr = _lr(3)
    out = np.asarray(serve(lr))
    ref = np.asarray(q(jnp.asarray(lr)))
    assert out.shape == (3, 1, 32, 32)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_export_hybrid_rdres_executor(tmp_path):
    """The hybrid int8 RDResUNet executor (FP encoder state inside the
    params pytree) exports and round-trips too."""
    from pssr2_tpu.models import RDResUNet
    from pssr2_tpu.quant import quantize_rdresunet

    model = RDResUNet(hidden=[16, 16], scale=2, depth=1, rdnet_init=16,
                      growth_rates=[4, 4], ds_blocks=[False, True],
                      ese_blocks=[False, True], n_blocks=[1, 1], rngs=nnx.Rngs(0))
    model.eval()
    q = quantize_rdresunet(model, [_lr(2)])
    path = tmp_path / "rdres_int8.shlo"
    export_model(q, str(path), lr_res=16)
    serve = load_exported(str(path))
    lr = _lr(3)
    out = np.asarray(serve(lr))
    ref = np.asarray(q(jnp.asarray(lr)))
    assert out.shape == (3, 1, 32, 32)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_cli_export(tmp_path, monkeypatch):
    """`pssr2-tpu -mt ... -mp weights.npz -ex out.shlo` writes a servable
    artifact (the CLI serving surface; docs/guide/serving.md)."""
    import sys

    from pssr2_tpu.checkpoint import save_weights
    from pssr2_tpu.__main__ import main

    model = ResUNet(hidden=[8, 16], depth=1, scale=2)
    save_weights(model, str(tmp_path / "w.npz"))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "pssr2-tpu",
            "-mt", "ResUNet(hidden=[8, 16], depth=1, scale=2)",
            "-mp", str(tmp_path / "w.npz"),
            "-ex", "m.shlo", "-lres", "16",
        ],
    )
    main()
    serve = load_exported(str(tmp_path / "m.shlo"))
    assert serve(_lr(2)).shape == (2, 1, 32, 32)
