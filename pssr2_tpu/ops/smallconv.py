"""Fused pixel-shuffle + small-C_out conv — the reconstruction-head tail.

The reference upscaling head ends with ``conv3x3(pixel_shuffle(x, s))``
into 1 output channel (reference: pssr/models/_blocks.py:6-18).  On TPU
that final conv is the single worst op in the canonical model: with
C_out=1 the MXU pads the output-lane dimension 1 -> 128, so the 512^2
conv runs at 0.4% MXU and ~6.4 ms (measured, experiments/mxu_probe.json),
and the materialized 512^2 x 64 shuffled tensor costs another 1.6 ms of
HBM traffic.

This module computes the SAME function (bitwise-equivalent contraction
order per tap, fp-rounding-level differences only) without materializing
the shuffled tensor:

1. the producer conv's output channels are permuted to PHASE-MAJOR order
   (channel = phase * C + c; torch pixel_shuffle is c-major) — a weight
   permutation, free at runtime;
2. one MXU matmul contracts the C channels against all 9 taps * C_out
   filters at LR resolution: z[b,i,j,p,t*C_out+o] (N = 9*C_out lanes
   instead of C_out);
3. the 3x3 spatial structure is resolved in PHASE space: output phase
   (di,dj) at LR pixel (i,j) reads input phase ((di+u-1) mod s,
   (dj+v-1) mod s) at LR offset ((di+u-1)//s, (dj+v-1)//s) — nine
   slice-adds over a phase-extended view of z (VPU, fused by XLA);
4. a 16*C_out-channel mini pixel-shuffle produces the s*H x s*W output
   (67 MB moved instead of 537 MB).

Measured on v5e (bf16, canonical shapes): 2.9 ms vs 7.3 ms for
shuffle+conv (experiments/mxu_probe2.json).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# Composition knobs for the z contraction (see the comment at the use
# site); defaults chosen by the full-train-step probe, not standalone
# micro-benchmarks (experiments/mxu_probe14.json: dense+barrier 49.9 ms
# step vs sparse+barrier 52.8, sparse-plain 54.5, dense-plain 60.9).
Z_MODE = "dense"
Z_BARRIER = True
Z_BARRIER_POS = "pre"  # "pre" = before the 7-D reshape, "post" = after
# Phase-resolve formulation: "slices" = nine shifted slice-adds over the
# phase-extended view (_phase_resolve); "conv" = the SAME linear map as a
# single 3x3 conv with a 0/1 selection kernel (3, 3, s^2*9*Cout, s^2*Cout)
# — one MXU pass with the halo handled by the conv emitter, no extended
# tensors materialized.  Identical terms, conv-order f32 accumulation.
Z_RESOLVE = "slices"


def phase_major_perm(channels: int, scale: int) -> np.ndarray:
    """Out-channel permutation turning a c-major (torch pixel_shuffle)
    conv into a phase-major one: new channel p*C + c reads old channel
    c*s^2 + p."""
    s2 = scale * scale
    return (np.arange(channels)[None, :] * s2 + np.arange(s2)[:, None]).reshape(-1)


def _phase_extend(z, s):
    """Phase-extended view of a (B, H, W, pr, pc, ...) phase tensor: entry
    e on a phase axis corresponds to a = e-1, i.e. phase a mod s at LR
    offset a//s; the out-of-range entries wrap to the neighboring LR
    row/column (zero at the sheet edge, matching SAME zero padding).
    Returns (B, H, W, pr+2, pc+2, ...)."""
    nd = z.ndim
    pad_h = [(0, 0)] * nd
    pad_h[1] = (1, 0)
    zm = jnp.pad(z[:, :-1, :, s - 1 : s], pad_h)
    pad_h[1] = (0, 1)
    zq = jnp.pad(z[:, 1:, :, 0:1], pad_h)
    ze = jnp.concatenate([zm, z, zq], axis=3)
    pad_w = [(0, 0)] * nd
    pad_w[2] = (1, 0)
    zl = jnp.pad(ze[:, :, :-1, :, s - 1 : s], pad_w)
    pad_w[2] = (0, 1)
    zr = jnp.pad(ze[:, :, 1:, :, 0:1], pad_w)
    return jnp.concatenate([zl, ze, zr], axis=4)


@functools.lru_cache(maxsize=32)
def _phase_resolve_fn(s: int, dtype_name: str):
    """custom_vjp phase-resolve for a given (scale, input dtype).

    The op is linear in z, so the VJP needs NO residuals and its transpose
    is the same phase-extend + shifted-slice pattern applied to the
    cotangent (window (2-u, 2-v) instead of (u, v)).  Without this, XLA
    materializes the (B,H,W,s+2,s+2,9,Cout) extended tensor repeatedly in
    the autodiff backward when the surrounding graph is complex (measured:
    3.2 GB of temps and ~+20 ms on the canonical train step when composed
    with the SSIM loss — experiments/mxu_probe10).
    """

    @jax.custom_vjp
    def resolve(z):
        # z: (B,H,W,s,s,9,Cout) -> f32 (B,H,W,s,s,Cout); out[d] += ze[d+u]
        ze = _phase_extend(z, s)
        return sum(
            ze[:, :, :, u : u + s, v : v + s, 3 * u + v].astype(jnp.float32)
            for u in range(3)
            for v in range(3)
        )

    def fwd(z):
        return resolve(z), None

    def bwd(_, g):
        # dz[a, tap (u,v)] = EXT(g)[a+2-u, a+2-v]  (see module docstring)
        ge = _phase_extend(g, s)
        taps = [
            ge[:, :, :, 2 - u : 2 - u + s, 2 - v : 2 - v + s].astype(dtype_name)
            for u in range(3)
            for v in range(3)
        ]
        return (jnp.stack(taps, axis=5),)

    resolve.defvjp(fwd, bwd)
    return resolve


def _phase_resolve(z, s):
    return _phase_resolve_fn(s, z.dtype.name)(z)


@functools.lru_cache(maxsize=8)
def _resolve_kernel_np(s: int, cout: int):
    """0/1 selection kernel (3, 3, s^2*9*cout, s^2*cout) expressing the
    phase resolve as a 3x3 SAME conv: output phase (dr, dc) tap (u, v)
    reads input phase ((dr+u-1) mod s, (dc+v-1) mod s) at LR offset
    ((dr+u-1) // s, (dc+v-1) // s) — identical terms to _phase_resolve,
    f32 MXU accumulation instead of nine extended-view slice-adds."""
    k = np.zeros((3, 3, s * s * 9 * cout, s * s * cout), np.float32)
    for dr in range(s):
        for dc in range(s):
            for u in range(3):
                for v in range(3):
                    ar, ac = dr + u - 1, dc + v - 1
                    rr, rho = ar // s, ar % s
                    cc, sig = ac // s, ac % s
                    ci = ((rho * s + sig) * 9 + 3 * u + v) * cout
                    co = (dr * s + dc) * cout
                    for o in range(cout):
                        k[rr + 1, cc + 1, ci + o, co + o] = 1.0
    return k


@functools.lru_cache(maxsize=8)
def _phase_resolve_conv_fn(s: int, cout: int, dtype_name: str):
    """custom_vjp conv-form phase resolve for (scale, cout, z dtype).

    Linear in z, so no residuals; the transpose is the same SAME 3x3 conv
    with the selection kernel spatially flipped and IO-transposed.  The
    explicit VJP (a) keeps autodiff from pairing the f32 cotangent with a
    compute-dtype kernel (a lax.conv dtype error under bf16 models) and
    (b) matches the slice path's numerics: every z element feeds exactly
    one output, so the f32 transpose conv + one final cast is the same
    single-value cast :func:`_phase_resolve_fn`'s bwd performs per tap.
    """
    kf = _resolve_kernel_np(s, cout)

    @jax.custom_vjp
    def resolve(z_flat):
        k = jnp.asarray(kf, z_flat.dtype)
        out = lax.conv_general_dilated(
            z_flat, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        b, h, w, _ = z_flat.shape
        return out.reshape(b, h, w, s, s, cout)

    def fwd(z_flat):
        return resolve(z_flat), None

    def bwd(_, g):
        b, h, w = g.shape[:3]
        gf = g.reshape(b, h, w, s * s * cout).astype(jnp.float32)
        kt = jnp.asarray(kf[::-1, ::-1].transpose(0, 1, 3, 2), jnp.float32)
        dz = lax.conv_general_dilated(
            gf, kt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return (dz.astype(dtype_name),)

    resolve.defvjp(fwd, bwd)
    return resolve


def _phase_resolve_conv(z_flat, s, cout):
    """Conv-form phase resolve on the FLAT dense z (B, H, W, s^2*9*cout):
    one 3x3 conv, f32 accumulation, halo handled by the conv emitter.
    Returns (B, H, W, s, s, cout) f32, matching :func:`_phase_resolve`."""
    return _phase_resolve_conv_fn(s, cout, z_flat.dtype.name)(z_flat)


def shuffle_conv_small(y_pm, kernel, bias=None, *, scale: int):
    """``conv3x3(pixel_shuffle(y, scale), kernel) + bias`` where ``y_pm``
    holds the PRE-shuffle activations in phase-major channel order
    (channel = p*C + c; see :func:`phase_major_perm`).

    Args:
        y_pm : (B, H, W, s^2 * C) activations, phase-major.
        kernel : (3, 3, C, C_out) conv kernel (C_out small; the win decays
            as C_out grows toward 128).
        bias : optional (C_out,).
        scale : the pixel-shuffle factor s.

    Returns:
        (B, s*H, s*W, C_out), same dtype as ``y_pm``.
    """
    s = scale
    B, H, W, CS = y_pm.shape
    kh, kw, C, Cout = kernel.shape
    if (kh, kw) != (3, 3):
        raise ValueError(f"shuffle_conv_small supports 3x3 kernels, got {kh}x{kw}.")
    if CS != s * s * C:
        raise ValueError(f"channel mismatch: y has {CS}, kernel expects {s * s * C}.")

    # (C, 9*Cout): tap t = 3*u+v major, C_out minor
    wt = kernel.reshape(9, C, Cout).transpose(1, 0, 2).reshape(C, 9 * Cout)
    wt = wt.astype(y_pm.dtype)

    # one MXU contraction for all taps/phases at LR resolution.  With the
    # phase dim in M the contraction has N = 9*Cout output lanes (7% of
    # 128 at Cout=1); folding the phase structure into N via the
    # block-diagonal W_dense = I_{s^2} (x) wt fills the lanes at s^2x the
    # (zero-padded) FLOPs — bitwise-identical (0*y and x+0 are exact).
    # Standalone the dense form is ~2x faster (mxu_probe13), but inside
    # the full train step XLA fuses the dot into the phase-resolve slices
    # as a slow loop fusion (profiler capture, experiments/profile_out);
    # Z_MODE/Z_BARRIER let the step probe pick the composition-safe form.
    if Z_MODE == "dense" and s * s * 9 * Cout <= 512:
        eye = jnp.eye(s * s, dtype=wt.dtype)
        w_dense = jnp.einsum("ij,ab->iajb", eye, wt).reshape(s * s * C, s * s * 9 * Cout)
        z = lax.dot_general(y_pm, w_dense, (((4 - 1,), (0,)), ((), ())))
    else:
        z = lax.dot_general(y_pm.reshape(B, H, W, s * s, C), wt, (((4,), (0,)), ((), ())))
    if Z_BARRIER and Z_BARRIER_POS == "pre":
        z = lax.optimization_barrier(z)
    if Z_RESOLVE == "conv" and z.shape[-1] == s * s * 9 * Cout:
        out = _phase_resolve_conv(z, s, Cout)  # f32 (B,H,W,s,s,Cout)
    else:
        z = z.reshape(B, H, W, s, s, 9, Cout)
        if Z_BARRIER and Z_BARRIER_POS == "post":
            z = lax.optimization_barrier(z)
        out = _phase_resolve(z, s)  # f32 (B,H,W,s,s,Cout)
    if bias is not None:
        out = out + bias.astype(jnp.float32)

    # mini pixel-shuffle of the phase dims: (B,H,W,s,s,Cout) -> (B,sH,sW,Cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, s * H, s * W, Cout)
    return out.astype(y_pm.dtype)


def fused_upsample_tail(x, pre_conv, post_conv, scale: int, activation=None):
    """``post_conv(pixel_shuffle(act(pre_conv(x)), scale))`` fused.

    ``pre_conv``/``post_conv`` are nnx.Conv modules (3x3); the pre conv's
    output channels are virtually permuted to phase-major at trace time (a
    tiny weight gather — STORAGE stays in the reference's c-major order, so
    checkpoints and torch parity are unaffected) and the shuffled tensor is
    never materialized.  ``x`` must already be in the compute dtype.
    """
    kernel = pre_conv.kernel[...]
    channels = kernel.shape[-1] // (scale * scale)
    perm = phase_major_perm(channels, scale)
    dt = x.dtype
    y = lax.conv_general_dilated(
        x, kernel[..., perm].astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if pre_conv.bias is not None:
        y = y + pre_conv.bias[...][perm].astype(dt)
    if activation is not None:
        y = activation(y)
    post_bias = post_conv.bias[...] if post_conv.bias is not None else None
    return shuffle_conv_small(y, post_conv.kernel[...], post_bias, scale=scale)
