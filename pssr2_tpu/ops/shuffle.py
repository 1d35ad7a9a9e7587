"""Pixel shuffle (depth-to-space) as pure reshape/transpose — XLA-native.

Equivalent of torch.nn.functional.pixel_shuffle used throughout the
reference decoders (reference: pssr/models/resunet.py:82,
pssr/models/_blocks.py:17).  Both NCHW (reference convention) and NHWC
(TPU conv layout) variants are provided; the NHWC variant is the hot path.
"""

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, scale: int, *, channels_last: bool = True) -> jnp.ndarray:
    """Depth-to-space: (…, H, W, C*r^2) -> (…, H*r, W*r, C) for channels_last,
    or (…, C*r^2, H, W) -> (…, C, H*r, W*r) otherwise.

    Matches torch.pixel_shuffle semantics: input channels are interpreted as
    (C, r, r) in row-major order.
    """
    r = scale
    if r == 1:
        return x
    if channels_last:
        *lead, h, w, c = x.shape
        nc = c // (r * r)
        # channel index = ((cc * r) + rh) * r + rw  (torch ordering)
        x = x.reshape(*lead, h, w, nc, r, r)
        # -> (..., h, rh, w, rw, nc)
        ndim_lead = len(lead)
        perm = list(range(ndim_lead)) + [
            ndim_lead + 0,  # h
            ndim_lead + 3,  # rh
            ndim_lead + 1,  # w
            ndim_lead + 4,  # rw
            ndim_lead + 2,  # nc
        ]
        x = x.transpose(*perm)
        return x.reshape(*lead, h * r, w * r, nc)
    else:
        *lead, c, h, w = x.shape
        nc = c // (r * r)
        x = x.reshape(*lead, nc, r, r, h, w)
        ndim_lead = len(lead)
        perm = list(range(ndim_lead)) + [
            ndim_lead + 0,  # nc
            ndim_lead + 3,  # h
            ndim_lead + 1,  # rh
            ndim_lead + 4,  # w
            ndim_lead + 2,  # rw
        ]
        x = x.transpose(*perm)
        return x.reshape(*lead, nc, h * r, w * r)


def pixel_unshuffle(x: jnp.ndarray, scale: int, *, channels_last: bool = True) -> jnp.ndarray:
    """Space-to-depth, the inverse of :func:`pixel_shuffle`."""
    r = scale
    if r == 1:
        return x
    if channels_last:
        *lead, h, w, c = x.shape
        x = x.reshape(*lead, h // r, r, w // r, r, c)
        ndim_lead = len(lead)
        perm = list(range(ndim_lead)) + [
            ndim_lead + 0,  # h
            ndim_lead + 2,  # w
            ndim_lead + 4,  # c
            ndim_lead + 1,  # rh
            ndim_lead + 3,  # rw
        ]
        x = x.transpose(*perm)
        return x.reshape(*lead, h // r, w // r, c * r * r)
    else:
        *lead, c, h, w = x.shape
        x = x.reshape(*lead, c, h // r, r, w // r, r)
        ndim_lead = len(lead)
        perm = list(range(ndim_lead)) + [
            ndim_lead + 0,  # c
            ndim_lead + 2,  # rh
            ndim_lead + 4,  # rw
            ndim_lead + 1,  # h
            ndim_lead + 3,  # w
        ]
        x = x.transpose(*perm)
        return x.reshape(*lead, c * r * r, h // r, w // r)
