"""SSIM / MS-SSIM in JAX, numerically matched to ``pytorch_msssim``.

The reference trains with an (MS-)SSIM + Gaussian-L1 mix loss built on
pytorch_msssim (reference: pssr/util.py:10-52, train logging at
pssr/train.py:109).  This module reimplements that math as pure JAX so the
loss runs inside the jitted train step on TPU:

- separable 1-D Gaussian window, VALID depthwise convolutions
- K = (0.01, 0.03), compensation = 1.0
- MS-SSIM: 5 levels, weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333],
  2x2 avg-pool between levels with pad = (dim % 2), relu on cs terms.

Layout: NCHW, matching the reference's tensor convention.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)

# Matmul precision for the Gaussian-blur banded matmuls.  "highest" forces
# exact f32 passes (6x bf16 passes on the MXU) — the parity-safe default;
# experiments/mxu_probe4.py measures the train-step cost of alternatives.
BLUR_PRECISION = "highest"


@functools.lru_cache(maxsize=16)
def _gaussian_window(win_size: int, win_sigma: float) -> np.ndarray:
    coords = np.arange(win_size, dtype=np.float32) - win_size // 2
    g = np.exp(-(coords**2) / (2 * win_sigma**2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _band_matrix(size: int, win_size: int, win_sigma: float) -> np.ndarray:
    """(size, size - win + 1) banded Gaussian matrix: multiplying by it is a
    VALID 1-D Gaussian conv.  TPU note: single-channel depthwise convs use
    1/128 of the vector lanes; as dense matmuls the blurs run on the MXU
    (~100x faster at PSSR shapes — this op dominated the train step)."""
    g = _gaussian_window(win_size, win_sigma)
    out = size - win_size + 1
    m = np.zeros((size, out), dtype=np.float32)
    for t in range(win_size):
        m[np.arange(out) + t, np.arange(out)] = g[t]
    return m


def _blur(x: jnp.ndarray, win_size: int, win_sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur over H and W, VALID padding, per channel —
    implemented as two banded matmuls (MXU) instead of depthwise convs."""
    h, w = x.shape[-2], x.shape[-1]
    if min(h, w) < win_size:
        raise ValueError(
            f"Image spatial dims {(h, w)} are smaller than the SSIM window "
            f"({win_size}); pass a smaller win_size."
        )
    gh = jnp.asarray(_band_matrix(h, win_size, win_sigma), dtype=x.dtype)
    gw = jnp.asarray(_band_matrix(w, win_size, win_sigma), dtype=x.dtype)
    # BLUR_PRECISION="highest" default: the SSIM loss defines quality parity
    # with the reference; these matmuls are tiny next to model FLOPs.
    # Two PAIRWISE einsums, deliberately not one three-operand einsum: the
    # latter lowers to a form that de-optimizes the whole surrounding model
    # backward (+23 ms on the canonical train step — measured in
    # experiments/mxu_probe6.json; the pairwise form composes cleanly).
    y = jnp.einsum("...hw,hi->...iw", x, gh, preferred_element_type=x.dtype, precision=BLUR_PRECISION)
    return jnp.einsum("...iw,wj->...ij", y, gw, preferred_element_type=x.dtype, precision=BLUR_PRECISION)


def _moments_to_ssim_maps(mu1, mu2, xx_b, yy_b, xy_b, c1, c2):
    """(ssim_map, cs_map) from the five blurred moment maps (pure autodiff
    reference formulation; `_moments_to_ssim` wraps it with an analytic
    VJP for the train-step hot path)."""
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = xx_b - mu1_sq
    sigma2_sq = yy_b - mu2_sq
    sigma12 = xy_b - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map, cs_map


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _moments_to_ssim(mu1, mu2, xx_b, yy_b, xy_b, c1, c2):
    """Per-channel (ssim, cs) means from the five blurred moment maps.

    Carries an analytic VJP: the autodiff backward of the map arithmetic
    fragments into many (B,C,H,W)-sized fusions (measured ~6 ms of f32 map
    traffic on the canonical composed train step, experiments/mxu_probe10);
    the hand-derived gradient is one fused elementwise pass over the five
    saved inputs.
    """
    ssim_map, cs_map = _moments_to_ssim_maps(mu1, mu2, xx_b, yy_b, xy_b, c1, c2)
    return (
        ssim_map.reshape(*ssim_map.shape[:2], -1).mean(-1),
        cs_map.reshape(*cs_map.shape[:2], -1).mean(-1),
    )


def _moments_to_ssim_fwd(mu1, mu2, xx_b, yy_b, xy_b, c1, c2):
    out = _moments_to_ssim(mu1, mu2, xx_b, yy_b, xy_b, c1, c2)
    return out, (mu1, mu2, xx_b, yy_b, xy_b)


def _moments_to_ssim_bwd(c1, c2, res, g):
    # With A1 = 2 mu1 mu2 + c1, B1 = mu1^2 + mu2^2 + c1, A2 = 2 sigma12 + c2,
    # B2 = sigma1^2 + sigma2^2 + c2, R = A1/B1, S = A2/B2:
    #   ssim_pc = mean(R S),  cs_pc = mean(S)
    # d/dA1 = gs S / B1;  d/dB1 = -gs S R / B1
    # d/dA2 = t / B2;     d/dB2 = -t S / B2        with t = gs R + gcs
    # chain to the moments:  g_xx = g_yy = dB2,  g_xy = 2 dA2,
    #   g_mu1 = 2 [mu2 (dA1 - dA2) + mu1 (dB1 - dB2)]   (and symmetrically).
    mu1, mu2, xx_b, yy_b, xy_b = res
    g_s, g_cs = g
    n = mu1.shape[-2] * mu1.shape[-1]
    extra = mu1.ndim - 2
    gs = (g_s / n).reshape(g_s.shape + (1,) * extra).astype(mu1.dtype)
    gcs = (g_cs / n).reshape(g_cs.shape + (1,) * extra).astype(mu1.dtype)

    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    a1 = 2 * mu1_mu2 + c1
    b1 = mu1_sq + mu2_sq + c1
    a2 = 2 * (xy_b - mu1_mu2) + c2
    b2 = (xx_b - mu1_sq) + (yy_b - mu2_sq) + c2
    r = a1 / b1
    s = a2 / b2

    t = gs * r + gcs
    da1 = gs * s / b1
    db1 = -da1 * r
    da2 = t / b2
    db2 = -da2 * s

    g_xx = db2
    g_xy = 2 * da2
    g_mu1 = 2 * (mu2 * (da1 - da2) + mu1 * (db1 - db2))
    g_mu2 = 2 * (mu1 * (da1 - da2) + mu2 * (db1 - db2))
    return g_mu1, g_mu2, g_xx, g_xx, g_xy


_moments_to_ssim.defvjp(_moments_to_ssim_fwd, _moments_to_ssim_bwd)


def _ssim_parts(x, y, data_range, win_size, win_sigma, k):
    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    # Fused Pallas path (TPU): products + VALID blurs + map arithmetic +
    # reduction in one kernel per scale, band-chunked dots — identical f32
    # formulation, none of the 5-map HBM traffic (see ops/pallas/ssimfused).
    from .pallas import ssimfused

    if x.ndim == 4 and ssimfused.auto_ok(x, win_size):
        return ssimfused.ssim_parts(x, y, float(c1), float(c2), win_size, win_sigma)

    # one batched blur for all five moment maps instead of five separate
    # blurs: identical numerics (same matmuls, batched); the composed
    # backward fuses best with a single einsum pair per scale
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=0)
    blurred = _blur(stacked, win_size, win_sigma)
    mu1, mu2, xx_b, yy_b, xy_b = jnp.split(blurred, 5, axis=0)
    return _moments_to_ssim(mu1, mu2, xx_b, yy_b, xy_b, float(c1), float(c2))


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 255.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k=(0.01, 0.03),
    size_average: bool = True,
    nonnegative: bool = False,
):
    """Single-scale SSIM over NCHW batches (pytorch_msssim ``ssim`` parity)."""
    s, _ = _ssim_parts(x, y, data_range, win_size, win_sigma, k)
    if nonnegative:
        s = jax.nn.relu(s)
    return s.mean() if size_average else s.mean(1)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pool, stride 2, with zero pad = dim % 2 (torch semantics:
    padded zeros are counted in the divisor, and for odd dims the trailing
    padded row/col is dropped by the output-size floor — so only the front
    pad survives).  Reshape-mean instead of reduce_window: single-channel
    windows underuse the TPU lanes."""
    pad_h, pad_w = x.shape[2] % 2, x.shape[3] % 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_h, 0), (pad_w, 0)))
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return x.sum(axis=(3, 5)) / 4.0


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 255.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights=None,
    k=(0.01, 0.03),
    size_average: bool = True,
):
    """Multi-scale SSIM over NCHW batches (pytorch_msssim ``ms_ssim`` parity).

    The smallest spatial dim must be > (win_size - 1) * 2**(levels-1).
    """
    weights = jnp.asarray(_MS_WEIGHTS if weights is None else weights, dtype=x.dtype)
    levels = weights.shape[0]
    smaller = min(x.shape[-2], x.shape[-1])
    if smaller <= (win_size - 1) * (2 ** (levels - 1)):
        raise ValueError(
            f"Image size {x.shape[-2:]} too small for {levels}-level MS-SSIM "
            f"with win_size={win_size}; needs > {(win_size - 1) * 2 ** (levels - 1)}."
        )

    # Fused per-level kernels with the 2x2 pool computed in VMEM (saves
    # the XLA pool's full extra read+write pass per level; pool matches
    # _avg_pool2 to fp-reassociation level — ops/pallas/ssimfused
    # ._pool_matrix).  Odd dims at any level fall back to the generic
    # path (torch pads odd dims).
    from .pallas import ssimfused

    fused_chain = (
        x.ndim == 4
        and ssimfused.auto_ok(x, win_size)
        and x.shape[-2] % (1 << (levels - 1)) == 0
        and x.shape[-1] % (1 << (levels - 1)) == 0
    )

    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mcs = []
    ssim_per_channel = None
    for i in range(levels):
        if fused_chain and i < levels - 1:
            ssim_per_channel, cs, x, y = ssimfused.fused_ssim_parts_pool(
                x, y, float(c1), float(c2), win_size, win_sigma,
                interpret=ssimfused.MODE == "interpret",
            )
            mcs.append(jax.nn.relu(cs))
            continue
        ssim_per_channel, cs = _ssim_parts(x, y, data_range, win_size, win_sigma, k)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2(x)
            y = _avg_pool2(y)

    ssim_per_channel = jax.nn.relu(ssim_per_channel)
    stacked = jnp.stack(mcs + [ssim_per_channel], axis=0)  # (levels, B, C)
    val = jnp.prod(stacked ** weights.reshape(-1, 1, 1), axis=0)
    return val.mean() if size_average else val.mean(1)
