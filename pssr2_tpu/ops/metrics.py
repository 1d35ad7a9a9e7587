"""Image-restoration metrics.

Host (numpy) implementations match the reference's eval metrics, which used
skimage (reference: pssr/predict.py:194-203) — reimplemented here since the
formulas are standard and skimage is not a dependency of this framework:

- ``psnr``: peak_signal_noise_ratio parity (10*log10(R^2/MSE), float64).
- ``ssim_np``: structural_similarity parity (7x7 uniform filter, sample
  covariance, crop of the filter margin).

Device (JAX) implementations provide the same quantities for on-device
batched evaluation inside jitted loops.
"""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import uniform_filter


def mse_np(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.mean((a - b) ** 2))


def psnr(im_true: np.ndarray, im_test: np.ndarray, data_range: float = 255.0) -> float:
    """skimage.metrics.peak_signal_noise_ratio parity."""
    err = mse_np(im_true, im_test)
    if err == 0:
        return float("inf")
    return float(10 * np.log10((data_range**2) / err))


def ssim_np(
    im1: np.ndarray,
    im2: np.ndarray,
    data_range: float = 255.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
    use_sample_covariance: bool = True,
) -> float:
    """skimage.metrics.structural_similarity parity (default arguments:
    uniform window, sample covariance, margin crop)."""
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    if im1.shape != im2.shape:
        raise ValueError("Input images must have the same shape.")
    ndim = im1.ndim
    np_win = win_size**ndim
    cov_norm = np_win / (np_win - 1) if use_sample_covariance else 1.0

    filt = lambda x: uniform_filter(x, size=win_size, mode="reflect")
    ux, uy = filt(im1), filt(im2)
    uxx, uyy, uxy = filt(im1 * im1), filt(im2 * im2), filt(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1, a2 = 2 * ux * uy + c1, 2 * vxy + c2
    b1, b2 = ux**2 + uy**2 + c1, vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    crop = tuple(slice(pad, dim - pad) for dim in s.shape)
    return float(s[crop].mean())


# --- device-side (JAX) metrics for jitted eval loops ---------------------


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def psnr_from_mse(err: jnp.ndarray) -> jnp.ndarray:
    """PSNR from an MSE computed on [0,1]-normalized images
    (reference logging formula: pssr/util.py:217-218)."""
    return 20 * jnp.log10(1.0 / jnp.sqrt(err))


def pixel_metric(err, image_range: float = 255.0):
    """sqrt(MSE) * range — average pixel error
    (reference: pssr/util.py:207-215). Accepts scalars or arrays."""
    if isinstance(err, (float, int)):
        return float(np.sqrt(err) * image_range)
    return jnp.sqrt(err) * image_range
