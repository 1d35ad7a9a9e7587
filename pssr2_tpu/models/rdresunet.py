"""RDResUNet / RDResUNetA: RDNet encoder + ResUNet decoder
(reference: pssr/models/rdresunet.py).

Channel bookkeeping follows the reference: encoder skips are taken from
``feature_info`` (reversed), decoder pixel-shuffle ratios are
``[1, 2, ..., 2, patch_size]`` (reference: rdresunet.py:84-102,115-127).

Note: the reference constructs DropPath but never applies it in its vendored
DenseBlock forward; this implementation applies stochastic depth as intended
by RDNet (identical behavior at the default drop_rate=0).
"""

import jax.numpy as jnp
from flax import nnx

from ..ops.shuffle import pixel_shuffle
from .blocks import PSPPooling, Reconstruction, batch_norm, force_list, get_resblock, resolve_dtype
from .rdnet import RDNet


class RDResUNet(nnx.Module):
    def __init__(
        self,
        channels: list[int] = 1,
        hidden: list[int] = None,
        scale: int = 4,
        depth: int = 3,
        dilations: list[list[int]] = None,
        pool_sizes: list[int] = None,
        encoder_pool: bool = False,
        rdnet_init: int = 128,
        growth_rates: list[int] = None,
        ds_blocks: list[bool] = None,
        ese_blocks: list[bool] = None,
        n_blocks: list[int] = 3,
        patch_size: int = 2,
        bottleneck: int = 4,
        compression: float = 0.5,
        drop_rate: float = 0,
        *,
        dtype=None,
        rngs: nnx.Rngs = None,
    ):
        """RDNet (Revitalized DenseNet) encoder with a ResUNet decoder and an
        image upscaling head.  Same argument surface as the reference
        (rdresunet.py:8-101); see there for arg docs.
        """
        rngs = nnx.Rngs(0) if rngs is None else rngs
        dtype = resolve_dtype(dtype)
        hidden = [1024, 1024, 512, 256] if hidden is None else hidden
        growth_rates = [64, 104, 128, 128, 128, 128, 224] if growth_rates is None else growth_rates
        ds_blocks = [False, True, True, False, False, False, True] if ds_blocks is None else ds_blocks
        ese_blocks = [False, False, True, True, True, True, True] if ese_blocks is None else ese_blocks

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

        if sum(ds_blocks) != len(hidden) - 1:
            raise ValueError(
                f"Number of downsampling blocks must be one less than ResUNet hidden layers. "
                f"Given {sum(ds_blocks)} downsampling blocks but {len(hidden)} hidden layers."
            )

        self.encoder = RDNet(
            channels[0],
            rdnet_init,
            patch_size,
            growth_rates,
            ds_blocks,
            ese_blocks,
            n_blocks,
            bottleneck,
            drop_rate,
            compression,
            rngs=rngs,
            dtype=dtype,
        )
        skips = [feature["num_chs"] for feature in self.encoder.feature_info]
        skips.reverse()

        if len(skips) != len(hidden):
            raise ValueError(
                f"Each encoder skip connection must have a corresponding decoder hidden layer. "
                f"There are {len(skips)} skip connections but {len(hidden)} hidden layers."
            )

        self.ratios = [1] + [2] * (len(skips) - 1) + [patch_size]

        layers = [0, *hidden]
        self.decoder = nnx.List([])
        for layer_idx in range(len(layers) - 1):
            self.decoder.append(
                get_resblock(
                    layers[layer_idx] // self.ratios[layer_idx] ** 2 + skips[layer_idx],
                    layers[layer_idx + 1],
                    dilations[layer_idx] if dilations else None,
                    depth,
                    rngs=rngs,
                    dtype=dtype,
                )
            )

        self.encoder_pool = (
            PSPPooling(skips[0], pool_sizes, rngs=rngs, dtype=dtype) if pool_sizes and encoder_pool else None
        )
        self.reconstruction_pool = (
            PSPPooling(hidden[-1] // self.ratios[-1] ** 2, pool_sizes, rngs=rngs, dtype=dtype) if pool_sizes else None
        )
        self.reconstruction = Reconstruction(
            channels[0], channels[1], hidden[-1] // self.ratios[-1] ** 2, scale, rngs=rngs, dtype=dtype
        )
        self.skips = skips
        self.scale = scale
        self.depth = depth
        self.channels = channels
        self.dtype = dtype

    def __call__(self, x):
        x = x / 128.0 - 1.0
        x = jnp.transpose(x, (0, 2, 3, 1))  # -> NHWC
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.norm is not None:
            x = self.norm(x)

        skips = [x]
        skips.extend(self.encoder(x))

        if self.encoder_pool is not None:
            skips[-1] = self.encoder_pool(skips[-1])

        for idx, layer in enumerate(self.decoder):
            x = jnp.concatenate([x, skips.pop()], axis=-1) if idx != 0 else skips.pop()
            x = layer(x)
            x = pixel_shuffle(x, self.ratios[idx + 1], channels_last=True)

        if self.reconstruction_pool is not None:
            x = self.reconstruction_pool(x)

        x = jnp.concatenate([x, skips.pop()], axis=-1)
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
            f"{'Atrous ' if self.norm is None else ''}RDResUNet with {self.reconstruction.scale}x upscaling\n"
            f"{len(self.decoder)} residual blocks with {self.decoder[0].depth} hidden layers each\n"
            f"Skip connection sizes: {self.skips}\n"
            f"PSP pooling {'enabled' if self.reconstruction_pool else 'disabled'}"
        )

    def __str__(self):
        return f"{type(self).__name__}(\n{self.extra_repr()}\n)"


class RDResUNetA:
    def __new__(
        cls,
        channels: list[int] = 1,
        hidden: list[int] = None,
        scale: int = 4,
        depth: int = 3,
        dilations: list[list[int]] = None,
        pool_sizes: list[int] = None,
        encoder_pool: bool = False,
        rdnet_init: int = 128,
        growth_rates: list[int] = None,
        ds_blocks: list[bool] = None,
        ese_blocks: list[bool] = None,
        n_blocks: list[int] = 3,
        patch_size: int = 2,
        bottleneck: int = 4,
        compression: float = 0.5,
        drop_rate: float = 0,
        *,
        dtype=None,
        rngs: nnx.Rngs = None,
    ):
        """:class:`RDResUNet` wrapper with atrous decoder defaults
        (reference: rdresunet.py:135-211)."""
        dilations = [[1], [1], [1, 3], [1, 3, 15]] if dilations is None else dilations
        pool_sizes = [1, 2, 4, 8] if pool_sizes is None else pool_sizes
        return RDResUNet(
            channels,
            hidden,
            scale,
            depth,
            dilations,
            pool_sizes,
            encoder_pool,
            rdnet_init,
            growth_rates,
            ds_blocks,
            ese_blocks,
            n_blocks,
            patch_size,
            bottleneck,
            compression,
            drop_rate,
            dtype=dtype,
            rngs=rngs,
        )
