"""On-device crappification: the degradation zoo as pure JAX transforms.

TPU-first redesign of the reference's host/numpy crappifiers
(reference: pssr/crappifiers.py): each degradation lowers to a pure
``(key, image_f32) -> image_f32`` function that is vmapped over the batch
and fused by XLA into the on-device input pipeline, so semi-synthetic LR
patches are generated in HBM instead of on dataloader CPUs.

Distribution parity with the host implementations is statistical (different
RNG streams, same distributions) — tested with the reference's own
noise-histogram distance (reference: pssr/train.py:372-384).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..crappifiers import (
    AdditiveGaussian,
    Blur,
    MultiCrappifier,
    Poisson,
    SaltPepper,
)


def _draw_intensity(key, intensity: float, spread: float):
    """Per-sample intensity jitter: max(N(intensity, spread), 0)."""
    if spread <= 0:
        return jnp.float32(intensity)
    return jnp.maximum(intensity + spread * jax.random.normal(key, ()), 0.0)


def additive_gaussian(key, image, intensity: float = 13.0, gain: float = 0.0, spread: float = 0.0):
    k_int, k_noise = jax.random.split(key)
    sigma = _draw_intensity(k_int, intensity, spread)
    noise = jax.random.normal(k_noise, image.shape, dtype=jnp.float32)
    return image.astype(jnp.float32) + gain + sigma * noise


def poisson(key, image, intensity: float = 1.0, gain: float = 0.0, spread: float = 0.0):
    k_int, k_noise = jax.random.split(key)
    mix = _draw_intensity(k_int, intensity, spread)
    lam = jnp.clip(image, 0, jnp.inf).astype(jnp.float32)
    sample = jax.random.poisson(k_noise, lam, dtype=jnp.int32).astype(jnp.float32)
    x = image.astype(jnp.float32)
    return x * (1 - mix) + sample * mix + gain


def salt_pepper(key, image, intensity: float = 0.5, gain: float = 0.0, spread: float = 0.0):
    # intensity is a percentage, matching the host class (crappifiers.py:88-105)
    k_int, k_flip, k_salt = jax.random.split(key, 3)
    amount = _draw_intensity(k_int, intensity / 100.0, spread)
    out = jnp.clip(image.astype(jnp.float32) + gain, 0, 255)
    flipped = jax.random.uniform(k_flip, image.shape) <= amount
    salted = jax.random.uniform(k_salt, image.shape) <= 0.5
    out = jnp.where(flipped & salted, 255.0, out)
    out = jnp.where(flipped & ~salted, 0.0, out)
    return out


def blur(key, image, intensity: float = 2.0, gain: float = 0.0, spread: float = 0.0):
    """Gaussian blur over the trailing two dims ('nearest' boundary,
    truncate=4 like scipy/skimage). Kernel radius is static (jit-friendly);
    weights use the (possibly jittered) traced sigma."""
    sigma = _draw_intensity(key, intensity, spread)
    max_sigma = intensity + 4 * spread if spread > 0 else intensity
    radius = max(int(math.ceil(4.0 * max_sigma)), 1)
    coords = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    safe_sigma = jnp.maximum(sigma, 1e-6)
    w = jnp.exp(-(coords**2) / (2 * safe_sigma**2))
    # truncate at radius = int(4*sigma + 0.5), matching scipy's kernel support
    w = jnp.where(jnp.abs(coords) <= jnp.floor(4.0 * safe_sigma + 0.5), w, 0.0)
    w = w / w.sum()

    x = image.astype(jnp.float32)
    lead = x.shape[:-2]
    h, wd = x.shape[-2], x.shape[-1]
    x = x.reshape((-1, 1, h, wd))
    x = jnp.pad(x, ((0, 0), (0, 0), (radius, radius), (radius, radius)), mode="edge")
    kern_h = w.reshape(1, 1, -1, 1)
    kern_w = w.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kern_h.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kern_h, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kern_w, (1, 1), "VALID", dimension_numbers=dn)
    out = x.reshape(*lead, h, wd)
    blurred = jnp.where(sigma > 0, out, image.astype(jnp.float32))
    return blurred + gain


def to_device_fn(crappifier):
    """Lower a host :class:`Crappifier` instance to a pure JAX
    ``(key, image) -> image`` function, or None if it has no device
    equivalent (custom host crappifiers fall back to the host path).
    """
    if crappifier is None:
        return None
    if isinstance(crappifier, MultiCrappifier):
        fns = [to_device_fn(c) for c in crappifier.crappifiers]
        if any(fn is None for fn in fns):
            return None
        clip = crappifier.clip

        def multi(key, image, _fns=tuple(fns), _clip=clip):
            keys = jax.random.split(key, len(_fns))
            for k, fn in zip(keys, _fns):
                image = fn(k, image)
                if _clip:
                    image = jnp.clip(image, 0, 255)
            return image

        return multi
    if isinstance(crappifier, AdditiveGaussian):
        return partial(additive_gaussian, intensity=crappifier.intensity, gain=crappifier.gain, spread=crappifier.spread)
    if isinstance(crappifier, Poisson):
        return partial(poisson, intensity=crappifier.intensity, gain=crappifier.gain, spread=crappifier.spread)
    if isinstance(crappifier, SaltPepper):
        # host class stores intensity already divided by 100
        return partial(salt_pepper, intensity=crappifier.intensity * 100.0, gain=crappifier.gain, spread=crappifier.spread)
    if isinstance(crappifier, Blur):
        return partial(blur, intensity=crappifier.intensity, gain=crappifier.gain, spread=crappifier.spread)
    return None


def crappify_batch(fn, key, images):
    """vmap a device crappifier over the leading batch axis with per-sample keys."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(fn)(keys, images)
