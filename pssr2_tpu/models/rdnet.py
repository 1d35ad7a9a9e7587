"""RDNet encoder (Revitalized DenseNet, Kim et al., 2024) in NNX/NHWC.

Re-implementation of the behavior of the reference's vendored RDNet
(reference: pssr/models/_rdnet.py) without timm: DropPath, LayerNorm2d and
EffectiveSE are implemented in-repo.  Dense stages concatenate features
along the channel axis; skips are emitted before each downsample
(reference: _rdnet.py:95-104).
"""

import jax
import jax.numpy as jnp
from flax import nnx

from .blocks import torch_bias_init

# RDNet reference init: kaiming_normal on conv weights (_rdnet.py:208-213)
kaiming_normal_init = jax.nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _conv(in_f, out_f, kernel, stride=1, *, groups=1, padding=0, rngs, dtype=None):
    ks = (kernel, kernel)
    pad = padding if isinstance(padding, str) else [(padding, padding)] * 2
    fan_in = (in_f // groups) * kernel * kernel
    return nnx.Conv(
        in_f,
        out_f,
        kernel_size=ks,
        strides=(stride, stride),
        padding=pad,
        feature_group_count=groups,
        kernel_init=kaiming_normal_init,
        bias_init=torch_bias_init(fan_in),
        dtype=dtype,
        rngs=rngs,
    )


class LayerNorm2d(nnx.Module):
    """Channelwise LayerNorm for image features (timm LayerNorm2d parity; in
    NHWC this is a plain LayerNorm over the trailing channel axis)."""

    def __init__(self, features, eps=1e-6, *, rngs, dtype=None):
        self.norm = nnx.LayerNorm(features, epsilon=eps, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        return self.norm(x)


class DropPath(nnx.Module):
    """Stochastic depth: drop whole residual branches per sample
    (timm DropPath parity)."""

    def __init__(self, rate, *, rngs):
        self.rate = rate
        # Dropout with the mask broadcast over all non-batch dims == DropPath
        self.drop = nnx.Dropout(rate, broadcast_dims=(1, 2, 3), rngs=rngs) if rate > 0 else None

    def __call__(self, x):
        if self.drop is None:
            return x
        return self.drop(x)


class EffectiveSE(nnx.Module):
    """Effective Squeeze-Excitation (timm EffectiveSEModule parity):
    x * hardsigmoid(conv1x1(mean_HW(x)))."""

    def __init__(self, channels, *, rngs, dtype=None):
        self.fc = _conv(channels, channels, 1, rngs=rngs, dtype=dtype)

    def __call__(self, x):
        se = x.mean(axis=(-3, -2), keepdims=True)
        se = self.fc(se)
        return x * (jnp.clip(se + 3.0, 0.0, 6.0) / 6.0)


class Block(nnx.Module):
    """7x7 depthwise conv -> LN -> 1x1 MLP -> GELU -> 1x1
    (reference: _rdnet.py:177-190)."""

    def __init__(self, in_chs, inter_chs, out_chs, ese=False, *, rngs, dtype=None):
        self.dw = _conv(in_chs, in_chs, 7, groups=in_chs, padding=3, rngs=rngs, dtype=dtype)
        self.norm = LayerNorm2d(in_chs, rngs=rngs, dtype=dtype)
        self.fc1 = _conv(in_chs, inter_chs, 1, rngs=rngs, dtype=dtype)
        self.fc2 = _conv(inter_chs, out_chs, 1, rngs=rngs, dtype=dtype)
        self.ese = EffectiveSE(out_chs, rngs=rngs, dtype=dtype) if ese else None

    def __call__(self, x):
        from ..ops.pallas import rdtail

        x = self.dw(x)
        n_, h_, w_, c = x.shape
        inter, out = self.fc1.out_features, self.fc2.out_features
        if rdtail.eligible(n_ * h_ * w_, c, inter, out, x.dtype, train=True):
            # fused LN -> fc1 -> GELU -> fc2 Pallas pass on flattened rows
            # (ops/pallas/rdtail.py); the dw conv stays XLA — it is at its
            # VPU FLOP floor (experiments/profile_rdres).
            hwnc = rdtail.ORDER == "hwnc"
            x2 = (x.transpose(1, 2, 0, 3) if hwnc else x).reshape(-1, c)
            y2 = rdtail.fused_rd_tail(
                x2,
                self.norm.norm.scale.value,
                self.norm.norm.bias.value,
                self.fc1.kernel.value.reshape(c, inter),
                self.fc1.bias.value,
                self.fc2.kernel.value.reshape(inter, out),
                self.fc2.bias.value,
                eps=self.norm.norm.epsilon,
            )
            if hwnc:
                x = y2.reshape(h_, w_, n_, out).transpose(2, 0, 1, 3)
            else:
                x = y2.reshape(n_, h_, w_, out)
        else:
            x = self.norm(x)
            x = nnx.gelu(self.fc1(x), approximate=False)
            x = self.fc2(x)
        if self.ese is not None:
            x = self.ese(x)
        return x


class DenseBlock(nnx.Module):
    """(reference: _rdnet.py:140-175)"""

    def __init__(
        self,
        num_input_features,
        growth_rate,
        bottleneck_width_ratio,
        drop_path_rate,
        ese=False,
        ls_init_value=1e-6,
        *,
        rngs,
        dtype=None,
    ):
        self.gamma = nnx.Param(ls_init_value * jnp.ones(growth_rate)) if ls_init_value > 0 else None
        inter_chs = int(num_input_features * bottleneck_width_ratio / 8) * 8
        self.drop_path = DropPath(drop_path_rate, rngs=rngs)
        self.layers = Block(num_input_features, inter_chs, growth_rate, ese=ese, rngs=rngs, dtype=dtype)

    def __call__(self, x):
        x = self.layers(x)
        if self.gamma is not None:
            x = x * self.gamma.value.reshape(1, 1, 1, -1).astype(x.dtype)
        return x


class DenseStage(nnx.Module):
    """Dense feature concatenation over blocks (reference: _rdnet.py:118-138)."""

    def __init__(self, num_block, num_input_features, growth_rate, drop_path_rates, ese, bottleneck_width_ratio, ls_init_value, *, rngs, dtype=None):
        self.blocks = nnx.List([])
        for i in range(num_block):
            self.blocks.append(
                DenseBlock(
                    num_input_features,
                    growth_rate,
                    bottleneck_width_ratio,
                    drop_path_rates[i],
                    ese=ese,
                    ls_init_value=ls_init_value,
                    rngs=rngs,
                    dtype=dtype,
                )
            )
            num_input_features += growth_rate
        self.num_out_features = num_input_features

    def __call__(self, x):
        features = [x]
        for block in self.blocks:
            new = block(jnp.concatenate(features, axis=-1) if len(features) > 1 else features[0])
            new = block.drop_path(new)
            features.append(new)
        return jnp.concatenate(features, axis=-1)


class PatchifyStem(nnx.Module):
    """(reference: _rdnet.py:106-116)"""

    def __init__(self, in_channels, num_init_features, patch_size, *, rngs, dtype=None):
        self.conv = _conv(in_channels, num_init_features, patch_size, stride=patch_size, rngs=rngs, dtype=dtype)
        self.norm = LayerNorm2d(num_init_features, rngs=rngs, dtype=dtype)

    def __call__(self, x):
        return self.norm(self.conv(x))


class RDNet(nnx.Module):
    """(reference: _rdnet.py:15-104). Forward returns (*skips, x) with a skip
    captured before each downsampling stage."""

    def __init__(
        self,
        in_channels=1,
        n_init_features=128,
        patch_size=2,
        growth_rates=(64, 104, 128, 128, 128, 128, 224),
        ds_blocks=(False, True, True, False, False, False, True),
        ese_blocks=(False, False, True, True, True, True, True),
        n_blocks=(3, 3, 3, 3, 3, 3, 3),
        bottleneck_width_ratio=4,
        drop_path_rate=0.0,
        transition_compression_ratio=0.5,
        ls_init_value=1e-6,
        *,
        rngs,
        dtype=None,
    ):
        ese_blocks = [bool(b) for b in ese_blocks]
        n_blocks = [n_blocks] * len(growth_rates) if isinstance(n_blocks, int) else list(n_blocks)

        if len(growth_rates) != len(ds_blocks):
            raise ValueError(
                f"growth_rates and ds_blocks must have the same length. Given values are "
                f"{len(growth_rates)} and {len(ds_blocks)} respectively."
            )
        if len(growth_rates) != len(ese_blocks):
            raise ValueError(
                f"growth_rates and block_type must have the same length. Given values are "
                f"{len(growth_rates)} and {len(ese_blocks)} respectively."
            )
        if len(growth_rates) != len(n_blocks):
            raise ValueError(
                f"growth_rates and n_blocks must have the same length. Given values are "
                f"{len(growth_rates)} and {len(n_blocks)} respectively."
            )

        self.stem = PatchifyStem(in_channels, n_init_features, patch_size, rngs=rngs, dtype=dtype)

        self.feature_info = []
        self.num_stages = len(growth_rates)
        curr_stride = 4  # stem stride bookkeeping (reference keeps this constant)
        num_features = n_init_features

        # linearly spaced drop-path rates over all blocks, split per stage
        total_blocks = sum(n_blocks)
        import numpy as _np

        flat_rates = _np.linspace(0, drop_path_rate, total_blocks).tolist()
        dp_rates, pos = [], 0
        for nb in n_blocks:
            dp_rates.append(flat_rates[pos : pos + nb])
            pos += nb

        self.transitions = nnx.List([])  # (norm, conv) or None per stage
        self.stages = nnx.List([])
        for i in range(self.num_stages):
            if i != 0:
                compressed = int(num_features * transition_compression_ratio / 8) * 8
                k = 2 if ds_blocks[i] else 1
                if ds_blocks[i]:
                    curr_stride *= 2
                self.transitions.append(
                    nnx.List([
                        LayerNorm2d(num_features, rngs=rngs, dtype=dtype),
                        _conv(num_features, compressed, k, stride=k, rngs=rngs, dtype=dtype),
                    ])
                )
                num_features = compressed
            else:
                self.transitions.append(None)

            self.stages.append(
                DenseStage(
                    n_blocks[i],
                    num_features,
                    growth_rates[i],
                    dp_rates[i],
                    ese_blocks[i],
                    bottleneck_width_ratio,
                    ls_init_value,
                    rngs=rngs,
                    dtype=dtype,
                )
            )
            num_features += n_blocks[i] * growth_rates[i]

            if i + 1 == self.num_stages or (i + 1 != self.num_stages and ds_blocks[i + 1]):
                self.feature_info.append(
                    dict(
                        num_chs=num_features,
                        reduction=curr_stride,
                        module=f"dense_stages.{i}",
                        growth_rate=growth_rates[i],
                    )
                )

        self.ds_blocks = list(ds_blocks)

    def __call__(self, x):
        x = self.stem(x)
        skips = []
        for idx in range(self.num_stages):
            if self.ds_blocks[idx]:
                skips.append(x)
            if self.transitions[idx] is not None:
                norm, cv = self.transitions[idx]
                x = cv(norm(x))
            x = self.stages[idx](x)
        return (*skips, x)
