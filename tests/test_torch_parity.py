"""Architecture-parity test: a torch twin of ResUNet built from the
reference's published structure (pssr/models/resunet.py, _blocks.py), loaded
with THIS framework's weights, must produce the same outputs.

This is the strongest single piece of parity evidence available in this
environment (the reference package itself cannot be imported here — its
tifffile/skimage deps are absent): it proves layer structure, weight
shapes, scaling conventions and op semantics all line up.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from pssr2_tpu.models import ResUNet

from _util import get_image


class TorchResBlock(tnn.Module):
    def __init__(self, c_in, c_out, depth):
        super().__init__()
        layers = []
        n_layers = depth + 1
        for i in range(n_layers):
            layers.append(tnn.Conv2d(c_in if i == 0 else c_out, c_out, 3, padding=1))
            layers.append(tnn.BatchNorm2d(c_out))
            if i + 1 < n_layers:
                layers.append(tnn.ReLU())
        self.conv = tnn.Sequential(*layers)
        self.respass = tnn.Conv2d(c_in, c_out, 1)

    def forward(self, x):
        return tF.relu(self.conv(x) + self.respass(x))


class TorchResUNet(tnn.Module):
    def __init__(self, hidden, depth, channels=1, scale=4):
        super().__init__()
        self.norm = tnn.BatchNorm2d(channels)
        layers = [channels, *hidden]
        n = len(layers) - 1
        self.encoder = tnn.ModuleList()
        self.decoder = tnn.ModuleList()
        for i in range(n):
            self.encoder.append(TorchResBlock(layers[i], layers[i + 1], depth))
            if i + 1 < n:
                self.decoder.append(TorchResBlock(layers[-i - 1] - int(layers[-i - 2] / 2), layers[-i - 2], depth))
        self.pre = tnn.Conv2d(hidden[0] + channels, scale**2 * hidden[0], 3, padding=1)
        self.post = tnn.Conv2d(hidden[0], channels, 3, padding=1)
        self.scale = scale

    def forward(self, x):
        x = x / 128 - 1
        x = self.norm(x)
        skips = [x]
        for i, layer in enumerate(self.encoder):
            x = layer(x)
            if i + 1 < len(self.encoder):
                skips.append(x)
                x = tF.max_pool2d(x, 2)
        for layer in self.decoder:
            x = tF.pixel_shuffle(x, 2)
            x = torch.cat([x, skips.pop()], dim=1)
            x = layer(x)
        x = torch.cat([x, skips.pop()], dim=1)
        x = tF.relu(self.pre(x))
        x = self.post(tF.pixel_shuffle(x, self.scale))
        return x * 128 + 128


def _copy_conv(tconv, nconv):
    tconv.weight.data = torch.from_numpy(np.transpose(np.asarray(nconv.kernel[...]), (3, 2, 0, 1)).copy())
    tconv.bias.data = torch.from_numpy(np.asarray(nconv.bias[...]).copy())


def _copy_bn(tbn, nbn):
    tbn.weight.data = torch.from_numpy(np.asarray(nbn.scale[...]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(nbn.bias[...]).copy())
    tbn.running_mean.data = torch.from_numpy(np.asarray(nbn.mean[...]).copy())
    tbn.running_var.data = torch.from_numpy(np.asarray(nbn.var[...]).copy())


def _copy_resblock(tblock, nblock):
    convs = [m for m in tblock.conv if isinstance(m, tnn.Conv2d)]
    bns = [m for m in tblock.conv if isinstance(m, tnn.BatchNorm2d)]
    for tconv, nconv in zip(convs, nblock.convs):
        _copy_conv(tconv, nconv)
    for tbn, nbn in zip(bns, nblock.norms):
        _copy_bn(tbn, nbn)
    _copy_conv(tblock.respass, nblock.respass)


def test_resunet_matches_torch_twin():
    hidden, depth = [16, 32, 64], 2
    model = ResUNet(hidden=hidden, depth=depth)
    model.eval()

    twin = TorchResUNet(hidden, depth)
    _copy_bn(twin.norm, model.norm)
    for tb, nb in zip(twin.encoder, model.encoder):
        _copy_resblock(tb, nb)
    for tb, nb in zip(twin.decoder, model.decoder):
        _copy_resblock(tb, nb)
    _copy_conv(twin.pre, model.reconstruction.pre)
    _copy_conv(twin.post, model.reconstruction.conv)
    twin.eval()

    x = get_image((2, 1, 32, 32), seed=0).astype(np.float32)
    ours = np.asarray(model(x))
    with torch.no_grad():
        theirs = twin(torch.from_numpy(x)).numpy()

    assert ours.shape == theirs.shape == (2, 1, 128, 128)
    np.testing.assert_allclose(ours, theirs, atol=2e-2, rtol=1e-4)
    # tight agreement on the [0,255]-scale outputs
    assert np.abs(ours - theirs).max() < 0.05


def test_window_attention_matches_torch():
    """SwinIR window attention vs a torch twin of the reference formulation
    (swinir.py:516-597): qkv projection, scaled scores, relative position
    bias, softmax, output projection."""
    from pssr2_tpu.models.swinir import WindowAttention, _relative_position_index
    from flax import nnx

    dim, heads, ws = 16, 2, 4
    attn = WindowAttention(dim, (ws, ws), heads, rngs=nnx.Rngs(0))

    n = ws * ws
    x = get_image((3, n, dim), seed=1).astype(np.float32) / 255.0
    ours = np.asarray(attn(x))

    qkv_w = torch.from_numpy(np.asarray(attn.qkv.kernel[...]).copy())   # (dim, 3*dim)
    qkv_b = torch.from_numpy(np.asarray(attn.qkv.bias[...]).copy())
    proj_w = torch.from_numpy(np.asarray(attn.proj.kernel[...]).copy())
    proj_b = torch.from_numpy(np.asarray(attn.proj.bias[...]).copy())
    bias_table = torch.from_numpy(np.asarray(attn.relative_position_bias_table[...]).copy())
    rel_idx = torch.from_numpy(np.asarray(_relative_position_index(ws, ws)).copy()).reshape(-1)

    with torch.no_grad():
        xt = torch.from_numpy(x)
        b_, _, c = xt.shape
        head_dim = c // heads
        qkv = (xt @ qkv_w + qkv_b).reshape(b_, n, 3, heads, head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        score = (q * head_dim**-0.5) @ k.transpose(-2, -1)
        bias = bias_table[rel_idx].reshape(n, n, heads).permute(2, 0, 1)
        score = score + bias.unsqueeze(0)
        out = (score.softmax(-1) @ v).transpose(1, 2).reshape(b_, n, c)
        theirs = (out @ proj_w + proj_b).numpy()

    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_rdnet_block_matches_torch():
    """RDNet Block/BlockESE vs a torch twin of the reference formulation
    (_rdnet.py:177-206): 7x7 depthwise conv, LayerNorm2d(eps=1e-6), 1x1 MLP
    with exact GELU, EffectiveSE (hardsigmoid gate)."""
    from flax import nnx

    from pssr2_tpu.models.rdnet import Block

    c_in, c_mid, c_out = 8, 16, 8
    block = Block(c_in, c_mid, c_out, ese=True, rngs=nnx.Rngs(0))

    x = get_image((2, 12, 12, c_in), seed=2).astype(np.float32) / 50.0
    ours = np.asarray(block(x))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())  # NCHW

    def conv_t(nconv, groups=1):
        t = tnn.Conv2d(nconv.kernel.shape[2] * groups, nconv.kernel.shape[3], nconv.kernel.shape[0],
                       padding=nconv.kernel.shape[0] // 2, groups=groups)
        _copy_conv(t, nconv)
        return t

    with torch.no_grad():
        dw = conv_t(block.dw, groups=c_in)
        h = dw(xt)
        ln_w = torch.from_numpy(np.asarray(block.norm.norm.scale[...]).copy())
        ln_b = torch.from_numpy(np.asarray(block.norm.norm.bias[...]).copy())
        h = tF.layer_norm(h.permute(0, 2, 3, 1), (c_in,), ln_w, ln_b, eps=1e-6).permute(0, 3, 1, 2)
        h = conv_t(block.fc1)(h)
        h = tF.gelu(h)
        h = conv_t(block.fc2)(h)
        se = h.mean((2, 3), keepdim=True)
        se = conv_t(block.ese.fc)(se)
        h = h * tF.hardsigmoid(se)
        theirs = np.transpose(h.numpy(), (0, 2, 3, 1))

    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_psp_upsample_semantics_match_torch():
    """PSP pooling's bilinear upsample must equal torch
    F.interpolate(mode='bilinear', align_corners=False) (reference
    _blocks.py:87)."""
    import jax
    import jax.numpy as jnp

    small = get_image((1, 2, 2, 1), seed=3).astype(np.float32) / 255
    uj = np.asarray(jax.image.resize(jnp.asarray(small), (1, 8, 8, 1), method="bilinear")).squeeze()
    ut = (
        tF.interpolate(torch.from_numpy(np.transpose(small, (0, 3, 1, 2))), size=(8, 8), mode="bilinear")
        .numpy()
        .squeeze()
    )
    np.testing.assert_allclose(uj, ut, atol=1e-6)


def test_resblocka_matches_torch():
    """Atrous residual block: BN -> ReLU -> dilated conv ordering and the
    parallel-branch sum (reference _blocks.py:43-68)."""
    from flax import nnx

    from pssr2_tpu.models.blocks import ResBlockA

    c_in, c_out, dils, depth = 4, 8, [1, 3], 1
    block = ResBlockA(c_in, c_out, dils, depth, rngs=nnx.Rngs(0))
    block.eval()  # running BatchNorm stats, matching the torch twin

    x = get_image((1, 16, 16, c_in), seed=4).astype(np.float32) / 50
    ours = np.asarray(block(x))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        total = None
        for b_idx, dilation in enumerate(dils):
            h = xt
            for l_idx in range(depth + 1):
                bn_n, conv_n = block.branches[b_idx][l_idx]
                cin = h.shape[1]
                tbn = tnn.BatchNorm2d(cin)
                _copy_bn(tbn, bn_n)
                tbn.eval()
                h = tF.relu(tbn(h))
                tconv = tnn.Conv2d(cin, c_out, 3, padding=dilation, dilation=dilation)
                _copy_conv(tconv, conv_n)
                h = tconv(h)
            total = h if total is None else total + h
        tres = tnn.Conv2d(c_in, c_out, 1)
        _copy_conv(tres, block.respass)
        theirs = tF.relu(total + tres(xt)).numpy()

    np.testing.assert_allclose(ours, np.transpose(theirs, (0, 2, 3, 1)), atol=1e-4)
