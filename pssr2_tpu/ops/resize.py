"""Separable image resize as two matrix multiplies (MXU-friendly).

The reference downscales HR patches with PIL's BILINEAR filter
(reference: pssr/data.py:483).  PIL's bilinear *downscale* is an
antialiased triangle filter whose support is scaled by the downscale
ratio — not naive bilinear sampling.  We precompute the identical
row/column weight matrices on the host and apply them on device as two
dense matmuls, which XLA tiles directly onto the MXU.  This both matches
PIL numerics (float path; uint8 fixed-point rounding differs by <=1 LSB)
and turns the hot downscale into pure MXU work.
"""

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """PIL-compatible triangle-filter weight matrix of shape (in_size, out_size).

    Mirrors PIL's precompute_coeffs (triangle filter, support=1.0, scaled by
    the resize ratio when downscaling).
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter support, antialias-scaled

    weights = np.zeros((in_size, out_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        ww = 0.0
        ws = np.zeros(xmax - xmin)
        for x in range(xmin, xmax):
            # triangle filter evaluated at scaled distance
            w = (x + 0.5 - center) / filterscale
            w = 1.0 - abs(w) if abs(w) < 1.0 else 0.0
            ws[x - xmin] = w
            ww += w
        if ww != 0:
            ws /= ww
        weights[xmin:xmax, i] = ws
    return weights.astype(np.float32)


def downscale_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Public accessor for the (in_size, out_size) resize weight matrix."""
    return _resize_weights(in_size, out_size)


def resize_bilinear(image: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize the trailing two spatial dims with a PIL-BILINEAR-matched filter.

    Works for any leading batch/channel dims.  Implemented as two matmuls so
    the (usually hot) downscale runs on the MXU:

        out[..., i, j] = sum_{h,w} image[..., h, w] * Wh[h, i] * Ww[w, j]
    """
    in_h, in_w = image.shape[-2], image.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return image
    wh = jnp.asarray(_resize_weights(in_h, out_h))
    ww = jnp.asarray(_resize_weights(in_w, out_w))
    # precision="highest": full-f32 MXU passes — this op defines data parity
    # with the reference's PIL downscale, so low-precision dot is not ok.
    out = jnp.einsum(
        "...hw,hi,wj->...ij", image.astype(jnp.float32), wh, ww,
        preferred_element_type=jnp.float32, precision="highest",
    )
    return out


def resize_bilinear_np(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host/numpy version of :func:`resize_bilinear` (same weights)."""
    in_h, in_w = image.shape[-2], image.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return image.astype(np.float32)
    wh = _resize_weights(in_h, out_h)
    ww = _resize_weights(in_w, out_w)
    # optimize=True: force pairwise matmul contraction (naive einsum is
    # O(H*W*out_h*out_w))
    return np.einsum("...hw,hi,wj->...ij", image.astype(np.float32), wh, ww, optimize=True)
