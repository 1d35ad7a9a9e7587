"""Pallas TPU kernel: fused single-scale SSIM statistics (fwd + analytic
bwd) — the five moment maps (mu1, mu2, E[x^2], E[y^2], E[xy]) are
produced, blurred, combined and reduced entirely in VMEM.

Why: the XLA lowering of ``ops/ssim._ssim_parts`` materializes a stacked
5-map tensor plus its blurred twin in HBM per MS-SSIM level (~4.5 ms of
f32 map traffic + blur dots on the canonical train step,
experiments/results_r3.md), and its banded Gaussian matmuls are DENSE
(H x H) dots of an 11-wide band — 97% wasted FLOPs.  The kernel
processes one (H, W) image per grid step: products, VALID separable
blurs (as chunked band-local dots, ~3.6x fewer FLOPs), the SSIM/cs map
arithmetic, and the spatial mean, writing only two scalars per image.
The backward recomputes the moments and applies the analytic gradient
chain (same math as ``ops/ssim._moments_to_ssim_bwd`` fused with the
transpose blurs), writing only the (N, H, W) input gradients.

Numerics are plain f32 — same formulation as the XLA path (pytorch_msssim
semantics, reference loss: pssr/util.py:10-52); parity is tested in
tests/test_ssim_fused.py via the interpreter and against the XLA path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ssim import _band_matrix

# "auto" (TPU + supported shapes), "off", or "interpret" (CPU tests).
MODE = "auto"

_CHUNK = 128
# Matmul precision for the in-kernel dots.  Mosaic's DEFAULT lowers f32
# dots as single bf16 MXU passes, which reintroduces exactly the
# variance-cancellation shift that disqualified the bf16 loss (loss value
# 0.734 -> 0.673 on the canonical step, mxu_probe25) — so the kernel
# forces true-f32 passes.  "highest" = exact f32; mxu_probe25 A/Bs the
# cost against "high" (bf16x3).
DOT_PRECISION = "highest"
# VMEM ceiling for auto mode: the bwd kernel's peak live set is ~12 maps
# of (H, W) f32 (x, y, five blurred moments, temps, gx, gy).
_MAX_PIXELS = 1 << 19  # 512 * 1024

# The merged level-0 kernel's scoped (stack) VMEM peaks at ~19 MB for a
# 512x512 image — over Mosaic's 16 MB default check (v5e VMEM is 128 MB,
# so the allocation itself is fine; the limit is an occupancy lint).
# Raise it for every kernel in this file; harmless where unneeded.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _band_chunks(size: int, win: int):
    """Static chunk plan for the VALID band matmul: list of
    (out_start, out_len, in_start, in_len) with out = size - win + 1."""
    out = size - win + 1
    plan = []
    a = 0
    while a < out:
        olen = min(_CHUNK, out - a)
        plan.append((a, olen, a, olen + win - 1))
        a += olen
    return tuple(plan)


def _band_chunks_t(size: int, win: int):
    """Chunk plan for the TRANSPOSE band matmul (FULL correlation):
    out index i <- in cols j in [i - win + 1, i] clipped to [0, size-win]."""
    n_in = size - win + 1
    plan = []
    a = 0
    while a < size:
        olen = min(_CHUNK, size - a)
        j0 = max(0, a - win + 1)
        j1 = min(n_in, a + olen)
        plan.append((a, olen, j0, j1 - j0))
        a += olen
    return tuple(plan)


def _blur2(m, gh, gw, h, w, win):
    """VALID separable blur of (h, w) map via band-chunked dots."""
    rows = []
    for oa, ol, ia, il in _band_chunks(h, win):
        gh_c = jax.lax.slice(gh, (ia, oa), (ia + il, oa + ol))
        m_c = jax.lax.slice(m, (ia, 0), (ia + il, w))
        rows.append(
            jax.lax.dot_general(
                gh_c, m_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=DOT_PRECISION,
            )
        )
    t = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    hp = h - win + 1
    cols = []
    for oa, ol, ia, il in _band_chunks(w, win):
        gw_c = jax.lax.slice(gw, (ia, oa), (ia + il, oa + ol))
        t_c = jax.lax.slice(t, (0, ia), (hp, ia + il))
        cols.append(
            jax.lax.dot_general(
                t_c, gw_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=DOT_PRECISION,
            )
        )
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def _blur2_t(d, gh, gw, h, w, win):
    """Transpose of :func:`_blur2`: (h - win + 1, w - win + 1) -> (h, w)."""
    hp, wp = h - win + 1, w - win + 1
    rows = []
    for oa, ol, ia, il in _band_chunks_t(h, win):
        gh_c = jax.lax.slice(gh, (oa, ia), (oa + ol, ia + il))
        d_c = jax.lax.slice(d, (ia, 0), (ia + il, wp))
        rows.append(
            jax.lax.dot_general(
                gh_c, d_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=DOT_PRECISION,
            )
        )
    t = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    cols = []
    for oa, ol, ia, il in _band_chunks_t(w, win):
        gw_c = jax.lax.slice(gw, (oa, ia), (oa + ol, ia + il))
        t_c = jax.lax.slice(t, (0, ia), (h, ia + il))
        cols.append(
            jax.lax.dot_general(
                t_c, gw_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=DOT_PRECISION,
            )
        )
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def _band_matrix_same(size: int, win: int, sigma: float) -> np.ndarray:
    """(size, size) SAME-pad correlation band: B[i, j] = g[j - i + pad],
    equal to zero-pad-then-VALID blur (util.SSIMLoss._l1_windowed).  The
    Gaussian is symmetric, so B^T == B exactly (borders just clip the
    band), and the L1 blur transpose reuses the same matrix."""
    from ..ssim import _gaussian_window

    g = _gaussian_window(win, sigma).reshape(-1)
    pad = (win - 1) // 2
    b = np.zeros((size, size), np.float32)
    for i in range(size):
        lo = max(0, i - pad)
        hi = min(size, i + pad + 1)
        b[i, lo:hi] = g[lo - i + pad : hi - i + pad]
    return b


def _band_chunks_same(size: int, win: int):
    """Chunk plan for the SAME band matmul: out rows [a, a+ol) read in
    rows [a - pad, a + ol + pad) clipped."""
    pad = (win - 1) // 2
    plan = []
    a = 0
    while a < size:
        ol = min(_CHUNK, size - a)
        i0 = max(0, a - pad)
        i1 = min(size, a + ol + pad)
        plan.append((a, ol, i0, i1 - i0))
        a += ol
    return tuple(plan)


def _blur2_same(m, bh, bw, h, w, win):
    """SAME-size separable blur of an (h, w) map via band-chunked dots
    (both axes keep their size; B^T == B so this is also the transpose)."""
    rows = []
    for oa, ol, ia, il in _band_chunks_same(h, win):
        bh_c = jax.lax.slice(bh, (oa, ia), (oa + ol, ia + il))
        m_c = jax.lax.slice(m, (ia, 0), (ia + il, w))
        rows.append(
            jax.lax.dot_general(
                bh_c, m_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=DOT_PRECISION,
            )
        )
    t = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    cols = []
    for oa, ol, ia, il in _band_chunks_same(w, win):
        bw_c = jax.lax.slice(bw, (oa, ia), (oa + ol, ia + il))
        t_c = jax.lax.slice(t, (0, ia), (h, ia + il))
        cols.append(
            jax.lax.dot_general(
                t_c, bw_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=DOT_PRECISION,
            )
        )
    return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]


def _moments(x, y, gh, gw, h, w, win):
    mu1 = _blur2(x, gh, gw, h, w, win)
    mu2 = _blur2(y, gh, gw, h, w, win)
    xx_b = _blur2(x * x, gh, gw, h, w, win)
    yy_b = _blur2(y * y, gh, gw, h, w, win)
    xy_b = _blur2(x * y, gh, gw, h, w, win)
    return mu1, mu2, xx_b, yy_b, xy_b


def _pool_matrix(size: int) -> np.ndarray:
    """(size/2, size) matrix with two 0.5 entries per row: P @ x @ P^T is
    the 2x2 mean pool, matching ops/ssim._avg_pool2 on even dims to
    fp-reassociation level (the 0.5 scalings are exact; only the 4-term
    add association differs from XLA's two-axis reduce)."""
    p = np.zeros((size // 2, size), np.float32)
    idx = np.arange(size // 2)
    p[idx, 2 * idx] = 0.5
    p[idx, 2 * idx + 1] = 0.5
    return p


def _pool2(m, ph, pw):
    t = jax.lax.dot_general(
        ph, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=DOT_PRECISION,
    )
    return jax.lax.dot_general(
        t, pw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=DOT_PRECISION,
    )


def _pool2_t(g, ph, pw):
    """Transpose of :func:`_pool2`: (h/2, w/2) -> (h, w)."""
    t = jax.lax.dot_general(
        ph, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=DOT_PRECISION,
    )
    return jax.lax.dot_general(
        t, pw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=DOT_PRECISION,
    )


def _fwd_kernel(x_ref, y_ref, gh_ref, gw_ref, s_ref, cs_ref, *, c1, c2, win, h, w):
    x = x_ref[0]
    y = y_ref[0]
    gh = gh_ref[...]
    gw = gw_ref[...]
    mu1, mu2, xx_b, yy_b, xy_b = _moments(x, y, gh, gw, h, w, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    cs_map = (2 * (xy_b - mu1_mu2) + c2) / ((xx_b - mu1_sq) + (yy_b - mu2_sq) + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    # lane-width output rows (Mosaic requires (8,128)-tileable or full-dim
    # blocks); only lane 0 is read back
    s_ref[...] = jnp.broadcast_to(jnp.sum(ssim_map)[None, None, None], s_ref.shape)
    cs_ref[...] = jnp.broadcast_to(jnp.sum(cs_map)[None, None, None], cs_ref.shape)


def _bwd_kernel(
    x_ref, y_ref, gh_ref, gw_ref, gs_ref, gcs_ref, gx_ref, gy_ref, *, c1, c2, win, h, w
):
    # Same gradient chain as ops/ssim._moments_to_ssim_bwd, fused with the
    # transpose blurs and the product rule for the moment maps:
    #   g_x = B^T(g_mu1) + 2 x B^T(g_xx) + y B^T(g_xy)   (B = VALID blur)
    x = x_ref[0]
    y = y_ref[0]
    gh = gh_ref[...]
    gw = gw_ref[...]
    inv_n = 1.0 / float((h - win + 1) * (w - win + 1))
    gs = gs_ref[0, 0, 0] * inv_n
    gcs = gcs_ref[0, 0, 0] * inv_n
    mu1, mu2, xx_b, yy_b, xy_b = _moments(x, y, gh, gw, h, w, win)
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
    u = da1 - da2
    v = db1 - db2
    g_mu1 = 2 * (mu2 * u + mu1 * v)
    g_mu2 = 2 * (mu1 * u + mu2 * v)
    t1 = _blur2_t(g_mu1, gh, gw, h, w, win)
    t2 = _blur2_t(g_mu2, gh, gw, h, w, win)
    t3 = _blur2_t(db2, gh, gw, h, w, win)  # g_xx == g_yy == db2
    t4 = _blur2_t(2 * da2, gh, gw, h, w, win)
    gx_ref[0] = t1 + 2 * x * t3 + y * t4
    gy_ref[0] = t2 + 2 * y * t3 + x * t4


def _fwd_pool_kernel(
    x_ref, y_ref, gh_ref, gw_ref, ph_ref, pw_ref, s_ref, cs_ref, xp_ref, yp_ref,
    *, c1, c2, win, h, w
):
    """Single-scale fwd + the 2x2 mean pool feeding the next MS level,
    computed in VMEM (saves the XLA pool's extra read+write pass)."""
    x = x_ref[0]
    y = y_ref[0]
    gh = gh_ref[...]
    gw = gw_ref[...]
    mu1, mu2, xx_b, yy_b, xy_b = _moments(x, y, gh, gw, h, w, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    cs_map = (2 * (xy_b - mu1_mu2) + c2) / ((xx_b - mu1_sq) + (yy_b - mu2_sq) + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    s_ref[...] = jnp.broadcast_to(jnp.sum(ssim_map)[None, None, None], s_ref.shape)
    cs_ref[...] = jnp.broadcast_to(jnp.sum(cs_map)[None, None, None], cs_ref.shape)
    ph = ph_ref[...]
    pw = pw_ref[...]
    xp_ref[0] = _pool2(x, ph, pw)
    yp_ref[0] = _pool2(y, ph, pw)


def _bwd_pool_kernel(
    x_ref, y_ref, gh_ref, gw_ref, ph_ref, pw_ref, gs_ref, gcs_ref, gxp_ref, gyp_ref,
    gx_ref, gy_ref, *, c1, c2, win, h, w
):
    """Transpose of :func:`_fwd_pool_kernel`: the single-scale gradient
    chain plus the unpooled cotangents from the next level."""
    x = x_ref[0]
    y = y_ref[0]
    gh = gh_ref[...]
    gw = gw_ref[...]
    inv_n = 1.0 / float((h - win + 1) * (w - win + 1))
    gs = gs_ref[0, 0, 0] * inv_n
    gcs = gcs_ref[0, 0, 0] * inv_n
    mu1, mu2, xx_b, yy_b, xy_b = _moments(x, y, gh, gw, h, w, win)
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
    u = da1 - da2
    v = db1 - db2
    g_mu1 = 2 * (mu2 * u + mu1 * v)
    g_mu2 = 2 * (mu1 * u + mu2 * v)
    t1 = _blur2_t(g_mu1, gh, gw, h, w, win)
    t2 = _blur2_t(g_mu2, gh, gw, h, w, win)
    t3 = _blur2_t(db2, gh, gw, h, w, win)
    t4 = _blur2_t(2 * da2, gh, gw, h, w, win)
    ph = ph_ref[...]
    pw = pw_ref[...]
    gx_ref[0] = t1 + 2 * x * t3 + y * t4 + _pool2_t(gxp_ref[0], ph, pw)
    gy_ref[0] = t2 + 2 * y * t3 + x * t4 + _pool2_t(gyp_ref[0], ph, pw)


def _fwd_l0_kernel(
    x_ref, y_ref, gh_ref, gw_ref, bh_ref, bw_ref, ph_ref, pw_ref,
    s_ref, cs_ref, l1_ref, xp_ref, yp_ref, *, c1, c2, win, h, w, divisor
):
    """MS level 0 of the canonical mixed loss in one pass: the train
    loop's /IMAGE_RANGE (an exact f32 divide, bit-matching the XLA
    ``x / 255``), single-scale SSIM stats, the Gaussian-windowed L1 map
    sum (util.SSIMLoss._l1_windowed), and the 2x2 pool feeding level 1."""
    x = x_ref[0] / divisor if divisor != 1.0 else x_ref[0]
    y = y_ref[0] / divisor if divisor != 1.0 else y_ref[0]
    gh = gh_ref[...]
    gw = gw_ref[...]
    mu1, mu2, xx_b, yy_b, xy_b = _moments(x, y, gh, gw, h, w, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    cs_map = (2 * (xy_b - mu1_mu2) + c2) / ((xx_b - mu1_sq) + (yy_b - mu2_sq) + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    s_ref[...] = jnp.broadcast_to(jnp.sum(ssim_map)[None, None, None], s_ref.shape)
    cs_ref[...] = jnp.broadcast_to(jnp.sum(cs_map)[None, None, None], cs_ref.shape)
    l1b = _blur2_same(jnp.abs(x - y), bh_ref[...], bw_ref[...], h, w, win)
    l1_ref[...] = jnp.broadcast_to(jnp.sum(l1b)[None, None, None], l1_ref.shape)
    ph = ph_ref[...]
    pw = pw_ref[...]
    xp_ref[0] = _pool2(x, ph, pw)
    yp_ref[0] = _pool2(y, ph, pw)


def _bwd_l0_kernel(
    x_ref, y_ref, gh_ref, gw_ref, bh_ref, bw_ref, ph_ref, pw_ref,
    gs_ref, gcs_ref, gl1_ref, gxp_ref, gyp_ref, gx_ref, gy_ref,
    *, c1, c2, win, h, w, divisor
):
    x = x_ref[0] / divisor if divisor != 1.0 else x_ref[0]
    y = y_ref[0] / divisor if divisor != 1.0 else y_ref[0]
    gh = gh_ref[...]
    gw = gw_ref[...]
    inv_n = 1.0 / float((h - win + 1) * (w - win + 1))
    gs = gs_ref[0, 0, 0] * inv_n
    gcs = gcs_ref[0, 0, 0] * inv_n
    mu1, mu2, xx_b, yy_b, xy_b = _moments(x, y, gh, gw, h, w, win)
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
    u = da1 - da2
    v = db1 - db2
    g_mu1 = 2 * (mu2 * u + mu1 * v)
    g_mu2 = 2 * (mu1 * u + mu2 * v)
    t1 = _blur2_t(g_mu1, gh, gw, h, w, win)
    t2 = _blur2_t(g_mu2, gh, gw, h, w, win)
    t3 = _blur2_t(db2, gh, gw, h, w, win)
    t4 = _blur2_t(2 * da2, gh, gw, h, w, win)
    # L1: d(sum(Bh |x-y| Bw^T))/d|x-y| = rowsums(Bh) (x) rowsums(Bw),
    # then the abs chain (sign(0) = 0, matching jnp.abs autodiff)
    bh = bh_ref[...]
    bw = bw_ref[...]
    gl1 = gl1_ref[0, 0, 0] / float(h * w)
    gmap = (gl1 * jnp.sum(bh, axis=0))[:, None] * jnp.sum(bw, axis=0)[None, :]
    l1g = gmap * jnp.sign(x - y)
    ph = ph_ref[...]
    pw = pw_ref[...]
    pgx = _pool2_t(gxp_ref[0], ph, pw)
    pgy = _pool2_t(gyp_ref[0], ph, pw)
    gx = t1 + 2 * x * t3 + y * t4 + l1g + pgx
    gy = t2 + 2 * y * t3 + x * t4 - l1g + pgy
    if divisor != 1.0:
        gx = gx / divisor
        gy = gy / divisor
    gx_ref[0] = gx
    gy_ref[0] = gy


@functools.lru_cache(maxsize=32)
def _fused_l0_fn(c1, c2, win_size, win_sigma, h, w, divisor, interpret):
    """custom_vjp for the level-0 mixed-loss kernel: (x_raw, y_raw) ->
    (ssim_mean, cs_mean, l1_mean, x_pooled, y_pooled), all in the
    prescaled domain; the pooled tensors feed level 1."""
    gh = _band_matrix(h, win_size, win_sigma)
    gw = gh if w == h else _band_matrix(w, win_size, win_sigma)
    bh = _band_matrix_same(h, win_size, win_sigma)
    bw = bh if w == h else _band_matrix_same(w, win_size, win_sigma)
    ph = _pool_matrix(h)
    pw = ph if w == h else _pool_matrix(w)
    hp, wp = h - win_size + 1, w - win_size + 1
    inv_n = 1.0 / (hp * wp)

    @jax.custom_vjp
    def parts(x, y):
        n = x.shape[0]
        s_sum, cs_sum, l1_sum, xp, yp = pl.pallas_call(
            functools.partial(
                _fwd_l0_kernel, c1=c1, c2=c2, win=win_size, h=h, w=w, divisor=divisor
            ),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((h, hp), lambda i: (0, 0)),
                pl.BlockSpec((w, wp), lambda i: (0, 0)),
                pl.BlockSpec((h, h), lambda i: (0, 0)),
                pl.BlockSpec((w, w), lambda i: (0, 0)),
                pl.BlockSpec((h // 2, h), lambda i: (0, 0)),
                pl.BlockSpec((w // 2, w), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n, h // 2, w // 2), jnp.float32),
                jax.ShapeDtypeStruct((n, h // 2, w // 2), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(x, y, gh, gw, bh, bw, ph, pw)
        return (
            s_sum[:, 0, 0] * inv_n,
            cs_sum[:, 0, 0] * inv_n,
            l1_sum[:, 0, 0] / (h * w),
            xp,
            yp,
        )

    def fwd(x, y):
        return parts(x, y), (x, y)

    def bwd(res, g):
        x, y = res
        g_s, g_cs, g_l1, g_xp, g_yp = g
        n = x.shape[0]
        gx, gy = pl.pallas_call(
            functools.partial(
                _bwd_l0_kernel, c1=c1, c2=c2, win=win_size, h=h, w=w, divisor=divisor
            ),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((h, hp), lambda i: (0, 0)),
                pl.BlockSpec((w, wp), lambda i: (0, 0)),
                pl.BlockSpec((h, h), lambda i: (0, 0)),
                pl.BlockSpec((w, w), lambda i: (0, 0)),
                pl.BlockSpec((h // 2, h), lambda i: (0, 0)),
                pl.BlockSpec((w // 2, w), lambda i: (0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(
            x,
            y,
            gh,
            gw,
            bh,
            bw,
            ph,
            pw,
            jnp.broadcast_to(g_s.astype(jnp.float32)[:, None, None], (n, 8, 128)),
            jnp.broadcast_to(g_cs.astype(jnp.float32)[:, None, None], (n, 8, 128)),
            jnp.broadcast_to(g_l1.astype(jnp.float32)[:, None, None], (n, 8, 128)),
            g_xp.astype(jnp.float32),
            g_yp.astype(jnp.float32),
        )
        return gx, gy

    parts.defvjp(fwd, bwd)
    return parts


def fused_level0_parts(x, y, c1, c2, win_size, win_sigma, divisor=1.0, interpret=False):
    """Level 0 of the canonical mixed MS-SSIM+L1 loss for NCHW f32
    batches: (ssim_pc, cs_pc, l1_pc, x_pooled, y_pooled), computed on
    ``x / divisor`` (exact f32 divide) without materializing the scaled
    tensors."""
    b, c, h, w = x.shape
    fn = _fused_l0_fn(
        float(c1), float(c2), int(win_size), float(win_sigma), h, w, float(divisor), interpret
    )
    xs = x.reshape(b * c, h, w).astype(jnp.float32)
    ys = y.reshape(b * c, h, w).astype(jnp.float32)
    s, cs, l1, xp, yp = fn(xs, ys)
    return (
        s.reshape(b, c),
        cs.reshape(b, c),
        l1.reshape(b, c),
        xp.reshape(b, c, h // 2, w // 2),
        yp.reshape(b, c, h // 2, w // 2),
    )


@functools.lru_cache(maxsize=64)
def _fused_pool_fn(c1, c2, win_size, win_sigma, h, w, interpret):
    """(s_mean, cs_mean, x_pooled, y_pooled) for one MS-SSIM level — the
    pooled tensors feed the next level, so autodiff chains the per-level
    custom VJPs without any graph-level pool ops."""
    gh = _band_matrix(h, win_size, win_sigma)
    gw = gh if w == h else _band_matrix(w, win_size, win_sigma)
    ph = _pool_matrix(h)
    pw = ph if w == h else _pool_matrix(w)
    hp, wp = h - win_size + 1, w - win_size + 1
    inv_n = 1.0 / (hp * wp)

    @jax.custom_vjp
    def parts(x, y):
        n = x.shape[0]
        s_sum, cs_sum, xp, yp = pl.pallas_call(
            functools.partial(_fwd_pool_kernel, c1=c1, c2=c2, win=win_size, h=h, w=w),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((h, hp), lambda i: (0, 0)),
                pl.BlockSpec((w, wp), lambda i: (0, 0)),
                pl.BlockSpec((h // 2, h), lambda i: (0, 0)),
                pl.BlockSpec((w // 2, w), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n, h // 2, w // 2), jnp.float32),
                jax.ShapeDtypeStruct((n, h // 2, w // 2), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(x, y, gh, gw, ph, pw)
        return s_sum[:, 0, 0] * inv_n, cs_sum[:, 0, 0] * inv_n, xp, yp

    def fwd(x, y):
        return parts(x, y), (x, y)

    def bwd(res, g):
        x, y = res
        g_s, g_cs, g_xp, g_yp = g
        n = x.shape[0]
        gx, gy = pl.pallas_call(
            functools.partial(_bwd_pool_kernel, c1=c1, c2=c2, win=win_size, h=h, w=w),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((h, hp), lambda i: (0, 0)),
                pl.BlockSpec((w, wp), lambda i: (0, 0)),
                pl.BlockSpec((h // 2, h), lambda i: (0, 0)),
                pl.BlockSpec((w // 2, w), lambda i: (0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h // 2, w // 2), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(
            x,
            y,
            gh,
            gw,
            ph,
            pw,
            jnp.broadcast_to(g_s.astype(jnp.float32)[:, None, None], (n, 8, 128)),
            jnp.broadcast_to(g_cs.astype(jnp.float32)[:, None, None], (n, 8, 128)),
            g_xp.astype(jnp.float32),
            g_yp.astype(jnp.float32),
        )
        return gx, gy

    parts.defvjp(fwd, bwd)
    return parts


def fused_ssim_parts_pool(x, y, c1, c2, win_size, win_sigma, interpret=False):
    """One MS-SSIM level: (ssim_pc, cs_pc, x_pooled, y_pooled) for NCHW
    f32 batches with even H/W — the pool runs inside the kernel (torch
    pool semantics on even dims, ops/ssim._avg_pool2)."""
    b, c, h, w = x.shape
    fn = _fused_pool_fn(float(c1), float(c2), int(win_size), float(win_sigma), h, w, interpret)
    xs = x.reshape(b * c, h, w).astype(jnp.float32)
    ys = y.reshape(b * c, h, w).astype(jnp.float32)
    s, cs, xp, yp = fn(xs, ys)
    return (
        s.reshape(b, c),
        cs.reshape(b, c),
        xp.reshape(b, c, h // 2, w // 2),
        yp.reshape(b, c, h // 2, w // 2),
    )


@functools.lru_cache(maxsize=64)
def _fused_fn(c1, c2, win_size, win_sigma, h, w, interpret):
    # NUMPY constants — a jnp conversion here would run inside whatever
    # trace first hits this lru_cache entry and leak its tracer into later
    # traces (same foot-gun as ops/pallas/winattn._fused_fn)
    gh = _band_matrix(h, win_size, win_sigma)
    gw = gh if w == h else _band_matrix(w, win_size, win_sigma)
    hp, wp = h - win_size + 1, w - win_size + 1
    inv_n = 1.0 / (hp * wp)

    @jax.custom_vjp
    def parts(x, y):
        n = x.shape[0]
        s_sum, cs_sum = pl.pallas_call(
            functools.partial(_fwd_kernel, c1=c1, c2=c2, win=win_size, h=h, w=w),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((h, hp), lambda i: (0, 0)),
                pl.BlockSpec((w, wp), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(x, y, gh, gw)
        return s_sum[:, 0, 0] * inv_n, cs_sum[:, 0, 0] * inv_n

    def fwd(x, y):
        return parts(x, y), (x, y)

    def bwd(res, g):
        x, y = res
        g_s, g_cs = g
        n = x.shape[0]
        gx, gy = pl.pallas_call(
            functools.partial(_bwd_kernel, c1=c1, c2=c2, win=win_size, h=h, w=w),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((h, hp), lambda i: (0, 0)),
                pl.BlockSpec((w, wp), lambda i: (0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            ],
            interpret=interpret,
            compiler_params=None if interpret else _COMPILER_PARAMS,
        )(
            x,
            y,
            gh,
            gw,
            jnp.broadcast_to(g_s.astype(jnp.float32)[:, None, None], (n, 8, 128)),
            jnp.broadcast_to(g_cs.astype(jnp.float32)[:, None, None], (n, 8, 128)),
        )
        return gx, gy

    parts.defvjp(fwd, bwd)
    return parts


def fused_ssim_parts(x, y, c1, c2, win_size, win_sigma, interpret=False):
    """Fused (ssim_per_channel, cs_per_channel) for NCHW f32 batches —
    drop-in for the tail of ``ops/ssim._ssim_parts`` (VALID windows,
    pytorch_msssim semantics).  Returns two (B, C) arrays."""
    b, c, h, w = x.shape
    fn = _fused_fn(float(c1), float(c2), int(win_size), float(win_sigma), h, w, interpret)
    xs = x.reshape(b * c, h, w).astype(jnp.float32)
    ys = y.reshape(b * c, h, w).astype(jnp.float32)
    s, cs = fn(xs, ys)
    return s.reshape(b, c), cs.reshape(b, c)


def auto_ok(x, win_size: int) -> bool:
    """Gate for the fused path: TPU backend, f32 maps, VMEM-sized images,
    and no active mesh scope (pallas is not SPMD-partitionable)."""
    from .guard import kernels_allowed

    if not kernels_allowed():
        return False
    if MODE == "off":
        return False
    if MODE == "interpret":
        return True
    if jax.default_backend() != "tpu":
        return False
    if x.dtype != jnp.float32:
        return False
    h, w = x.shape[-2], x.shape[-1]
    if min(h, w) < win_size:
        return False
    return h * w <= _MAX_PIXELS


def ssim_parts(x, y, c1, c2, win_size, win_sigma):
    """MODE-aware entry used by ops/ssim: fused kernel (real or interpret)."""
    return fused_ssim_parts(x, y, c1, c2, win_size, win_sigma, interpret=MODE == "interpret")
