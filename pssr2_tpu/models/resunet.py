"""ResUNet / ResUNetA super-resolution models (reference: pssr/models/resunet.py).

A Residual UNet (Zhang et al., 2017) with an upscaling reconstruction head;
with ``dilations`` it becomes the Atrous Residual UNet (Diakogiannis et al.,
2019).  TPU-first details:

- NHWC layout internally; the public ``__call__`` keeps the reference's
  NCHW float [0,255] contract (scale x/128-1 in, x*128+128 out,
  reference: resunet.py:66,95).
- pixel-shuffle decoding is pure reshape/transpose (XLA-native).
- all convs are MXU-shaped 3x3/1x1 NHWC convolutions.
"""

import jax.numpy as jnp
from flax import nnx

from ..ops.pooling import max_pool_2x2
from ..ops.shuffle import pixel_shuffle
from .blocks import PSPPooling, Reconstruction, batch_norm, force_list, get_resblock, resolve_dtype

# Lane-fold execution toggle for the C<=64 @full-resolution stages.
# bf16 NHWC tensors with C<=64 are physically lane-padded to 128 in HBM
# (2x traffic; layouts in experiments/mxu_probe20.hlo), so the stem +
# first encoder block + last decoder block CAN run with TWO batch samples
# folded into the channel dim (block-diagonal conv weights + fold-aware
# BN statistics, ops/batchnorm.bn_train_folded) — identical math at full
# lane occupancy.
#
# MEASURED NEGATIVE composed (kept as the documented negative result, the
# repo's standard for closed perf levers): the canonical train step is
# +4.6 ms WITH the fold (experiments/mxu_probe24: 46.5 -> 51.2 ms f32
# loss, 42.7 -> 46.1 bf16 loss) although the standalone micro won
# (mxu_probe22) — the fold/unfold boundary copies and the changed conv
# emitter tiling cost more than the padding saves.  Another
# standalone-vs-composed reversal (see CLAUDE.md).  "auto" is therefore
# OFF everywhere; True forces it (parity tests exercise the folded path).
FOLD_LANES = "auto"


def _fold_lanes_enabled(batch: int) -> bool:
    if batch % 2:
        return False
    if FOLD_LANES == "auto":
        return False
    return bool(FOLD_LANES)


def _fold2(x):
    """(B, H, W, C) -> (B/2, H, W, 2C): channel half h holds sample group h."""
    b = x.shape[0]
    return jnp.concatenate([x[: b // 2], x[b // 2 :]], axis=-1)


def _unfold2(x):
    c = x.shape[-1] // 2
    return jnp.concatenate([x[..., :c], x[..., c:]], axis=0)


def _fold_concat(a, b):
    """Channel-concat of two folded tensors, keeping the folded layout
    (half0 = [a0, b0], half1 = [a1, b1]) the block-diagonal weights expect."""
    ca, cb = a.shape[-1] // 2, b.shape[-1] // 2
    return jnp.concatenate([a[..., :ca], b[..., :cb], a[..., ca:], b[..., cb:]], axis=-1)


class ResUNet(nnx.Module):
    def __init__(
        self,
        channels: list[int] = 1,
        hidden: list[int] = None,
        scale: int = 4,
        depth: int = 3,
        dilations: list[list[int]] = None,
        pool_sizes: list[int] = None,
        encoder_pool: bool = False,
        *,
        dtype=None,
        rngs: nnx.Rngs = None,
    ):
        """A Residual UNet with an additional image upscaling block.

        Args:
            channels (list[int]) : Number of image channels, or [in, out].

            hidden (list[int]) : Channels per residual block. Default
                [64, 128, 256, 512, 1024].

            scale (int) : Upscaling factor. Default 4.

            depth (int) : Hidden layers per residual block. Default 3.

            dilations (list[list[int]]) : Per-layer dilation values; enables
                the atrous variant. Default None.

            pool_sizes (list[int]) : PSP pooling ratios (None disables).

            encoder_pool (bool) : Extra PSP pooling at end of encoder.

            dtype : Compute dtype (e.g. jnp.bfloat16). Params stay float32.

            rngs : NNX random state. Default Rngs(0).
        """
        rngs = nnx.Rngs(0) if rngs is None else rngs
        dtype = resolve_dtype(dtype)
        hidden = [64, 128, 256, 512, 1024] if hidden is None else hidden
        channels = force_list(channels)
        channels = channels * 2 if len(channels) == 1 else channels

        if dilations and len(dilations) != len(hidden):
            raise ValueError(
                f"Amount of dilations must equal amount of hidden residual blocks. "
                f"Given values are {len(dilations)} and {len(hidden)} respectively."
            )
        if pool_sizes:
            if hidden[0] % len(pool_sizes) != 0:
                raise ValueError(
                    f"hidden[0] must be divisible by len(pool_sizes). Given values are "
                    f"{hidden[0]} and {len(pool_sizes)} respectively."
                )
            if encoder_pool and hidden[-1] % len(pool_sizes) != 0:
                raise ValueError(
                    f"hidden[-1] must be divisible by len(pool_sizes) if encoder_pool is True. "
                    f"Given values are {hidden[-1]} and {len(pool_sizes)} respectively."
                )
        elif encoder_pool:
            raise ValueError("encoder_pool cannot be True if pool_sizes are not provided.")

        self.norm = batch_norm(channels[0], rngs=rngs, dtype=dtype) if not dilations else None

        self.encoder, self.decoder = nnx.List([]), nnx.List([])
        layers = [channels[0], *hidden]
        n_layers = len(layers) - 1
        for layer_idx in range(n_layers):
            self.encoder.append(
                get_resblock(
                    layers[layer_idx],
                    layers[layer_idx + 1],
                    dilations[layer_idx] if dilations else None,
                    depth,
                    rngs=rngs,
                    dtype=dtype,
                )
            )
            if layer_idx + 1 < n_layers:
                # decoder block input: pixel-shuffled deep features + skip
                self.decoder.append(
                    get_resblock(
                        layers[-layer_idx - 1] - int(layers[-layer_idx - 2] / 2),
                        layers[-layer_idx - 2],
                        dilations[-layer_idx - 1] if dilations else None,
                        depth,
                        rngs=rngs,
                        dtype=dtype,
                    )
                )

        self.encoder_pool = (
            PSPPooling(hidden[-1], pool_sizes, rngs=rngs, dtype=dtype) if pool_sizes and encoder_pool else None
        )
        self.reconstruction_pool = PSPPooling(hidden[0], pool_sizes, rngs=rngs, dtype=dtype) if pool_sizes else None
        self.reconstruction = Reconstruction(channels[0], channels[1], hidden[0], scale, rngs=rngs, dtype=dtype)
        self.scale = scale
        self.depth = depth
        self.channels = channels
        self.dtype = dtype

    def __call__(self, x):
        # NCHW [0,255] in -> NCHW [0,255] out (reference contract)
        x = x / 128.0 - 1.0
        x = jnp.transpose(x, (0, 2, 3, 1))  # -> NHWC
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # lane-fold the highest-resolution C<=64 stages (see FOLD_LANES)
        fold = (
            self.norm is not None
            and self.reconstruction_pool is None
            and len(self.encoder) >= 2
            and self.encoder[0].convs[0].kernel.shape[-1] * 2 <= 128
            and _fold_lanes_enabled(x.shape[0])
        )

        skips = []  # (tensor, is_folded)
        if fold:
            xf = self.norm(_fold2(x), folded=True)
            skips.append((xf, True))
            hf = self.encoder[0].folded_call(xf)
            skips.append((hf, True))
            x = _unfold2(max_pool_2x2(hf))
            enc_rest = list(self.encoder)[1:]
        else:
            if self.norm is not None:
                x = self.norm(x)
            skips.append((x, False))
            enc_rest = list(self.encoder)

        for idx, layer in enumerate(enc_rest):
            x = layer(x)
            if idx + 1 < len(enc_rest):
                skips.append((x, False))
                x = max_pool_2x2(x)

        if self.encoder_pool is not None:
            x = self.encoder_pool(x)

        x_folded = False
        for layer in self.decoder:
            x = pixel_shuffle(x, 2, channels_last=True)
            skip, skip_folded = skips.pop()
            if skip_folded:
                x = layer.folded_call(_fold_concat(_fold2(x), skip))
                x_folded = True
            else:
                x = layer(jnp.concatenate([x, skip], axis=-1))

        if self.reconstruction_pool is not None:
            x = self.reconstruction_pool(x)

        skip, skip_folded = skips.pop()
        if x_folded and skip_folded:
            x = _unfold2(_fold_concat(x, skip))
        else:
            x = jnp.concatenate([x, skip], axis=-1)
        if skips:
            raise IndexError(
                f"Skip connection mismatch between encoder and decoder. "
                f"{len(skips)} skip connections are unused."
            )
        x = self.reconstruction(x)

        x = jnp.transpose(x, (0, 3, 1, 2))  # -> NCHW
        return x.astype(jnp.float32) * 128.0 + 128.0

    def extra_repr(self):
        return (
            f"{'Atrous ' if self.norm is None else ''}ResUNet with {self.reconstruction.scale}x upscaling\n"
            f"{len(self.encoder)} residual decoder blocks with {self.encoder[0].depth} hidden layers each\n"
            f"PSP pooling {'enabled' if self.reconstruction_pool else 'disabled'}"
        )

    def __str__(self):
        return f"{type(self).__name__}(\n{self.extra_repr()}\n)"


class ResUNetA:
    def __new__(
        cls,
        channels: list[int] = 1,
        hidden: list[int] = None,
        scale: int = 4,
        depth: int = 3,
        dilations: list[list[int]] = None,
        pool_sizes: list[int] = None,
        encoder_pool: bool = False,
        *,
        dtype=None,
        rngs: nnx.Rngs = None,
    ):
        """:class:`ResUNet` wrapper with atrous defaults
        (reference: pssr/models/resunet.py:101-139)."""
        dilations = [[1, 3, 15, 31], [1, 3, 15], [1, 3], [1], [1]] if dilations is None else dilations
        pool_sizes = [1, 2, 4, 8] if pool_sizes is None else pool_sizes
        return ResUNet(
            channels,
            hidden,
            scale,
            depth,
            dilations,
            pool_sizes,
            encoder_pool,
            dtype=dtype,
            rngs=rngs,
        )
