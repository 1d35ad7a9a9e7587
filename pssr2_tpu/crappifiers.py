"""Host-side (numpy) crappifiers: synthetic degradation operators.

These are the parity implementations of the reference degradation zoo
(reference: pssr/crappifiers.py:6-124).  They run on the host and follow
identical math/distribution semantics, so they can be dropped into the same
data-loading position as the reference.  The TPU-native fast path lives in
:mod:`pssr2_tpu.ops.degrade`, where each crappifier lowers to a pure
``(key, image) -> image`` JAX function fused into the on-device input
pipeline; use :func:`pssr2_tpu.ops.degrade.to_device_fn` to convert.

Value convention: images are float arrays holding uint8-range values
[0, 255] (channel-first ``(C, H, W)``).  Crappifiers only inject noise; the
downscale happens upstream (reference: pssr/data.py:471-495).
"""

from abc import ABC, abstractmethod

import numpy as np
from scipy.ndimage import gaussian_filter


class Crappifier(ABC):
    """Base class for custom crappifiers. Override :meth:`crappify` for logic.

    (reference: pssr/crappifiers.py:6-24)
    """

    @abstractmethod
    def crappify(self, image: np.ndarray):
        """Degrade a low-resolution image to simulate undersampling.

        This method is not responsible for downscaling the image, only for
        injecting noise.

        Args:
            image (np.ndarray) : Low resolution image to crappify.

        Returns:
            crap (np.ndarray) : The crappified low resolution image.
        """
        raise NotImplementedError('"crappify" method not implemented.')

    def __call__(self, image: np.ndarray):
        return self.crappify(image)


class MultiCrappifier(Crappifier):
    def __init__(self, *args: Crappifier, clip: bool = True):
        """Chains multiple crappifiers sequentially.

        Args:
            args (Crappifier) : Crappifiers applied in order, first to last.

            clip (bool) : Clip values to image range between each step.
                Default is True.

        (reference: pssr/crappifiers.py:26-43)
        """
        self.crappifiers = args
        self.clip = clip

    def crappify(self, image: np.ndarray):
        for crappifier in self.crappifiers:
            image = crappifier.crappify(image)
            if self.clip:
                image = np.clip(image, 0, 255)
        return image


class _SpreadMixin:
    """Shared ``spread`` semantics: per-call intensity jitter for training on
    a range of degradations (reference: pssr/crappifiers.py:63, 85, 104, 123).
    """

    def _draw_intensity(self) -> float:
        if self.spread > 0:
            return max(np.random.normal(self.intensity, self.spread), 0)
        return self.intensity


class AdditiveGaussian(Crappifier, _SpreadMixin):
    def __init__(self, intensity: float = 13, gain: float = 0, spread: float = 0):
        """Additive Gaussian (read) noise. Approximates :class:`Poisson` noise
        at high photon counts.

        Args:
            intensity (float) : Standard deviation of the Gaussian. Default 13.

            gain (float) : Mean of the Gaussian. Default 0.

            spread (float) : Std-dev of per-call intensity jitter. Default 0.

        (reference: pssr/crappifiers.py:45-64)
        """
        self.intensity = intensity
        self.gain = gain
        self.spread = spread

    def crappify(self, image: np.ndarray):
        intensity = self._draw_intensity()
        return image.astype(np.float32) + np.random.normal(self.gain, intensity, image.shape)


class Poisson(Crappifier, _SpreadMixin):
    def __init__(self, intensity: float = 1, gain: float = 0, spread: float = 0):
        """Poisson (shot) noise: interpolates the image toward a Poisson
        sample of itself.

        Args:
            intensity (float) : Mix of the Poisson sample. 1 is the standard
                distribution, 0 is none, >1 amplifies noise. Default 1.

            gain (float) : Value gain added to the output. Default 0.

            spread (float) : Std-dev of per-call intensity jitter. Default 0.

        (reference: pssr/crappifiers.py:66-86)
        """
        self.intensity = intensity
        self.gain = gain
        self.spread = spread

    def crappify(self, image: np.ndarray):
        sample = np.random.poisson(np.clip(image, 0, np.inf))
        intensity = self._draw_intensity()
        x = image.astype(np.float32)
        return x * (1 - intensity) + sample * intensity + self.gain


class SaltPepper(Crappifier, _SpreadMixin):
    def __init__(self, intensity: float = 0.5, gain: float = 0, spread: float = 0):
        """Salt & pepper noise (full value addition/deletion).

        Args:
            intensity (float) : Percent of values replaced with noise.
                Default 0.5.

            gain (float) : Value gain added BEFORE the noise. Default 0.

            spread (float) : Std-dev of per-call intensity jitter. Default 0.

        (reference: pssr/crappifiers.py:88-105)
        """
        self.intensity = intensity / 100
        self.gain = gain
        self.spread = spread

    def crappify(self, image: np.ndarray):
        intensity = self._draw_intensity()
        out = np.clip(image.astype(np.float32) + self.gain, 0, 255)
        # Same semantics as skimage.util.random_noise(mode="s&p",
        # salt_vs_pepper=0.5): a fraction `intensity` of pixels is replaced,
        # half with the max value and half with the min value.
        flipped = np.random.random(out.shape) <= intensity
        salted = np.random.random(out.shape) <= 0.5
        out[flipped & salted] = 255.0
        out[flipped & ~salted] = 0.0
        return out


class Blur(Crappifier, _SpreadMixin):
    def __init__(self, intensity: float = 2, gain: float = 0, spread: float = 0):
        """Gaussian blur degradation.

        Args:
            intensity (float) : Sigma of the Gaussian kernel. Default 2.

            gain (float) : Value gain added to the output. Default 0.

            spread (float) : Std-dev of per-call intensity jitter. Default 0.

        (reference: pssr/crappifiers.py:107-124)
        """
        self.intensity = intensity
        self.gain = gain
        self.spread = spread

    def crappify(self, image: np.ndarray):
        intensity = self._draw_intensity()
        # Matches skimage.filters.gaussian(image, sigma, channel_axis=0):
        # per-channel scipy gaussian_filter, "nearest" boundary, truncate=4.0,
        # on the unrescaled float image.
        image = image.astype(np.float32)
        if intensity == 0:
            return image + self.gain
        out = np.stack(
            [gaussian_filter(channel, sigma=intensity, mode="nearest", truncate=4.0) for channel in image]
        )
        return out + self.gain
