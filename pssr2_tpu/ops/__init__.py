"""TPU-native compute primitives: resize, pixel shuffle, SSIM/MS-SSIM,
on-device degradation (crappification), metrics, and Pallas kernels.
"""

from .resize import resize_bilinear, downscale_matrix
from .shuffle import pixel_shuffle, pixel_unshuffle
from .ssim import ssim, ms_ssim
from .degrade import to_device_fn, crappify_batch

__all__ = [
    "resize_bilinear",
    "downscale_matrix",
    "pixel_shuffle",
    "pixel_unshuffle",
    "ssim",
    "ms_ssim",
    "to_device_fn",
    "crappify_batch",
]
