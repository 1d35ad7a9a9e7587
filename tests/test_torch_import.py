"""Reference .pth checkpoint import/export (pssr2_tpu/torch_import.py).

Reference users hold torch state_dicts named per pssr/models/_blocks.py's
Sequential layouts; importing them must reproduce the reference model's
outputs.  Uses the torch twin from test_torch_parity as the oracle.
"""

import sys

import numpy as np
import torch

from pssr2_tpu.models import ResUNet, ResUNetA
from pssr2_tpu.torch_import import (
    export_torch_state_dict,
    load_torch_state_dict,
    load_torch_weights,
    save_torch_weights,
    torch_key_map,
)

sys.path.insert(0, "tests")
from test_torch_parity import TorchResUNet  # noqa: E402


def _twin_state_dict(t):
    sd = {k: v.numpy() for k, v in t.state_dict().items()}
    return {
        (
            k.replace("pre.", "reconstruction.pre.").replace("post.", "reconstruction.conv.")
            if k.startswith(("pre.", "post."))
            else k
        ): v
        for k, v in sd.items()
    }


def test_pth_import_forward_parity():
    hidden, depth = [8, 16], 1
    t = TorchResUNet(hidden, depth)
    t.eval()
    m = ResUNet(hidden=hidden, depth=depth)
    loaded, skipped = load_torch_state_dict(m, _twin_state_dict(t))
    assert len(loaded) == 50 and all(k.endswith("num_batches_tracked") for k in skipped)
    m.eval()
    x = np.random.default_rng(0).random((2, 1, 32, 32), np.float32) * 255
    ours = np.asarray(m(x))
    with torch.no_grad():
        theirs = t(torch.from_numpy(x)).numpy()
    assert np.abs(ours - theirs).max() < 0.05  # [0,255] scale


def test_pth_file_roundtrip(tmp_path):
    m = ResUNet(hidden=[8, 16], depth=1)
    path = str(tmp_path / "m.pth")
    save_torch_weights(m, path)
    m2 = ResUNet(hidden=[8, 16], depth=1, rngs=None)
    # perturb then restore
    m2.reconstruction.conv.bias[...] = m2.reconstruction.conv.bias[...] + 1.0
    load_torch_weights(m2, path)
    a = np.asarray(m.reconstruction.conv.bias[...])
    b = np.asarray(m2.reconstruction.conv.bias[...])
    np.testing.assert_array_equal(a, b)
    # export -> import keys are a bijection over the mapping
    sd = export_torch_state_dict(m)
    assert set(sd) == set(torch_key_map(m))


def test_pth_import_resuneta_and_psp_keys():
    """Atrous + PSP variants produce complete mappings with the reference
    Sequential index layouts."""
    m = ResUNetA(hidden=[8, 16], depth=1, dilations=[[1, 2], [1]], pool_sizes=[1, 2])
    keys = torch_key_map(m)
    assert "encoder.0.dilations.0.0.weight" in keys  # BN at seq index 0
    assert "encoder.0.dilations.0.2.weight" in keys  # conv at seq index 2
    assert "reconstruction_pool.convs.0.0.weight" in keys
    assert "reconstruction_pool.norm_out.running_mean" in keys
    # every mapped path exists in the model state (export exercises them all)
    sd = export_torch_state_dict(m)
    assert set(sd) == set(keys)


def test_pth_import_error_paths():
    import pytest

    m = ResUNet(hidden=[8, 16], depth=1)
    good = export_torch_state_dict(m)
    bad = dict(good)
    bad["not.a.key"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        load_torch_state_dict(m, bad)
    # non-strict skips unknowns
    _, skipped = load_torch_state_dict(m, bad, strict=False)
    assert "not.a.key" in skipped
    wrong = dict(good)
    wrong["reconstruction.conv.bias"] = np.zeros(5, np.float32)
    with pytest.raises(ValueError):
        load_torch_state_dict(m, wrong)

    from pssr2_tpu.crappifiers import Poisson

    with pytest.raises(NotImplementedError):
        torch_key_map(Poisson())  # not a supported model type


def test_pth_swinir_mapping_bijective():
    """SwinIR .pth mapping covers reference swinir.py names (norm1/attn/
    mlp linears with (O,I)->(I,O) transposes, RSTB conv Sequential
    indices, Upsample conv positions 2s) and round-trips export->import."""
    from pssr2_tpu.models import SwinIR

    m = SwinIR(image_size=16, window_size=4, embed_dim=16, depths=[1, 1], num_heads=[2, 2], scale=4)
    keys = torch_key_map(m)
    for expected in (
        "conv_first.weight",
        "patch_embed.norm.weight",
        "layers.0.residual_group.blocks.0.attn.qkv.weight",
        "layers.0.residual_group.blocks.0.attn.relative_position_bias_table",
        "layers.1.conv.weight",
        "norm.weight",
        "conv_before_upsample.0.weight",
        "upsample.0.weight",
        "upsample.2.weight",  # scale 4 -> two shuffle stages at Sequential 0, 2
        "conv_last.weight",
    ):
        assert expected in keys, expected
    sd = export_torch_state_dict(m)
    assert set(sd) == set(keys)
    # qkv transpose: torch (3C, C) vs our kernel (C, 3C)
    assert sd["layers.0.residual_group.blocks.0.attn.qkv.weight"].shape == (48, 16)

    m2 = SwinIR(image_size=16, window_size=4, embed_dim=16, depths=[1, 1], num_heads=[2, 2], scale=4, rngs=None)
    m2.conv_last.bias[...] = m2.conv_last.bias[...] + 1.0
    sd["layers.0.residual_group.blocks.0.attn_mask"] = np.zeros(1)  # buffer -> skipped
    loaded, skipped = load_torch_state_dict(m2, sd)
    assert "layers.0.residual_group.blocks.0.attn_mask" in skipped
    np.testing.assert_array_equal(
        np.asarray(m2.conv_last.bias[...]), np.asarray(m.conv_last.bias[...])
    )
    # forward equality after import
    m.eval(), m2.eval()
    x = np.random.default_rng(0).random((1, 1, 16, 16), np.float32) * 255
    np.testing.assert_allclose(np.asarray(m2(x)), np.asarray(m(x)), atol=1e-5)


def test_pth_rdresunet_mapping_roundtrip():
    """RDResUNet .pth mapping covers the reference _rdnet.py Sequential
    layouts (stem.stem.{0,1}, dense_stages transitions at {0,1},
    dense_block{k}.layers.layers.{0,1,2,4,5}) and round-trips."""
    from pssr2_tpu.models import RDResUNet

    kwargs = dict(
        hidden=[64, 64, 32], rdnet_init=32, growth_rates=[16, 16, 16],
        ds_blocks=[False, True, True], ese_blocks=[False, True, True], n_blocks=[2, 2, 2],
    )
    m = RDResUNet(**kwargs)
    keys = torch_key_map(m)
    for k in (
        "encoder.stem.stem.0.weight",
        "encoder.stem.stem.1.weight",
        "encoder.dense_stages.0.0.dense_block0.gamma",
        "encoder.dense_stages.1.0.weight",  # transition LN2d
        "encoder.dense_stages.1.1.weight",  # transition conv
        "encoder.dense_stages.1.2.dense_block1.layers.layers.5.fc.weight",  # ESE
        "decoder.0.conv.0.weight",
        "reconstruction.pre.weight",
    ):
        assert k in keys, k
    sd = export_torch_state_dict(m)
    assert set(sd) == set(keys)

    m2 = RDResUNet(**kwargs, rngs=None)
    m2.reconstruction.conv.bias[...] = m2.reconstruction.conv.bias[...] + 1.0
    load_torch_state_dict(m2, sd)
    m.eval(), m2.eval()
    x = np.random.default_rng(0).random((1, 1, 32, 32), np.float32) * 255
    np.testing.assert_allclose(np.asarray(m2(x)), np.asarray(m(x)), atol=1e-5)
