"""Pallas TPU kernel: one FULL Swin transformer block per pass —
LN1 -> qkv projection -> shifted-window attention -> output projection ->
residual -> LN2 -> MLP (gelu) -> residual, computed strip-by-strip in VMEM.

Why: at batch-16 SwinIR inference the per-block XLA graph costs
~3.1 ms/layer of HBM traffic (attention custom-call 1.36, LayerNorm
reduce-fusions 0.6, qkv/proj/MLP 1x1 convs, residual-add fusions — fixed
categorizer, experiments/results_r3.md), reading and writing the
(B, H, W, C) activation ~8x per block.  This kernel reads x once and
writes the block output once: the 1x1 projections become well-shaped MXU
matmuls (M = ws*W rows, K = C) and every intermediate (LN stats, qkv,
attention maps, MLP hidden) lives only in VMEM.

Shifted windows cost ZERO extra passes: blocks chain in "roll space".
Each kernel consumes its input at vertical/horizontal roll offset
``v_in`` and produces output at offset ``shift`` (its own shift), so the
roll is absorbed into strip assembly — the input strip for rolled
window-row i is built from two 4-row blocks of the v_in-space tensor
(delta = (shift - v_in) mod ws picks them), and the horizontal roll is an
in-VMEM column rotation.  The caller applies ONE cheap XLA roll per
BasicLayer (6 blocks) to return to canonical space.

The shift-attention mask is not materialized: the kernel receives the
per-window token GROUP LABELS (nW, n) — 65 KB instead of the 4 MB
(nW, n, n) mask — and rebuilds ``-100 * (g_i != g_j)`` per head in VMEM
(reference mask construction: swinir.py:310-328).

Numerics mirror the XLA block at bf16-rounding level: LayerNorm uses
flax's fast-variance f32 stats, dots accumulate f32 and cast to the model
dtype, softmax is f32 (no-max form by default — see NOMAX_SOFTMAX), gelu
is the exact erf rational for f32 and a polynomial within the
activation-rounding class for bf16 (see FAST_GELU / _gelu_fast; measured
end-to-end deviation 5.7e-3 rel on the bf16 model, the same class as bf16
itself — mxu_probe30).  Training: the public wrapper's custom VJP
recomputes through the XLA reference block (reference: swinir.py:270-389),
so autodiff semantics match the unfused path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# "auto" (TPU + supported shapes), "off", or "interpret" (CPU tests).
MODE = "auto"

_NEG = -100.0  # mask fill value (reference: swinir.py:326)

# XLA's EmitErfF32 rational approximation (the same coefficients the XLA
# erf lowering uses; verified to 1 ULP against lax.erf) — Mosaic has no
# erf/erfc lowering, so exact gelu is built from this in-kernel.
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08, -2.10102402082508e-06,
              -5.69250639462346e-05, -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04, -1.68282697438203e-03,
             -7.37332916720468e-03, -1.42647390514189e-02)


def _erf_f32(x):
    xc = jnp.clip(x, -4.0, 4.0)
    x2 = xc * xc

    def poly(cs):
        a = jnp.full_like(x2, cs[0])
        for c_ in cs[1:]:
            a = a * x2 + c_
        return a

    return xc * poly(_ERF_ALPHA) / poly(_ERF_BETA)


def _gelu_exact(x):
    """gelu(approximate=False) computed in f32 (1.4e-6 of XLA's erfc
    formulation; within 1 bf16 ULP of the bf16 unfused path)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + _erf_f32(xf * np.float32(np.sqrt(0.5))))
    return y.astype(x.dtype)


# gelu(x) = 0.5x + x^2 S(x^2) on [-4, 4]: odd |x|-weighted Chebyshev LSQ
# of (Phi(x)-0.5)/x.  |err| <= max(2.6e-4 abs, 0.5% rel) — within the
# bf16 activation-rounding noise class (bf16 itself rounds at 0.39% rel),
# measured 5.7e-3 end-to-end rel deviation on the full bf16 model, the
# same class as plain bf16 (mxu_probe30).  12 VPU ops, no divide (the erf
# rational costs ~20 ops + a divide — probe29 measured exact gelu at
# 7.4 ms of the 92 ms batch-16 step).
_GELU_S = (0.398714550644521, -0.0659565049580834, 0.009545222431626374,
           -0.0010175056451836898, 7.648234117739626e-05,
           -3.7887493429360835e-06, 1.0968829398043447e-07,
           -1.3937041721878255e-09)


def _gelu_fast(x):
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -4.0, 4.0)
    u = xc * xc
    acc = jnp.full_like(u, _GELU_S[-1])
    for c_ in _GELU_S[-2::-1]:
        acc = acc * u + c_
    y = 0.5 * xc + u * acc
    y = jnp.where(xf > 4.0, xf, jnp.where(xf < -4.0, 0.0, y))
    return y.astype(x.dtype)


def _layernorm(x, scale, bias, eps):
    """flax nnx.LayerNorm semantics: params promoted to the compute dtype
    FIRST (nnx keeps them in f32 param_dtype), then f32 fast-variance
    stats, output cast back to the compute dtype (models/swinir.py
    norm1/norm2)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(x.dtype).astype(jnp.float32)
    y = (x - mu) * mul + bias.astype(x.dtype).astype(jnp.float32)
    return y.astype(x.dtype)


def _matmul(x, w, b):
    """nnx.Linear semantics: weights promoted to the compute dtype first,
    f32 accumulation, output in the compute dtype, bias added post-cast."""
    y = jax.lax.dot_general(
        x,
        w.astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y if b is None else y + b.astype(x.dtype)


# Tuning knobs (A/B'd in experiments/mxu_probe28):
#   ROWS — window-rows per grid step (amortizes per-op issue overhead)
#   BATCHED_HEADS — all heads in ONE batched dot pair + one softmax
#     instead of a 6-iteration head loop (the loop's ~60 small ops/step
#     made the v0 kernel issue-bound at 13.3 us/step, profile_swinir4)
#   DEFER_NORM — normalize the (n, d) attention OUTPUT instead of the
#     (n, n) probability map (4x fewer divides, same bf16-rounding class)
# Defaults = the measured-winning combination (experiments/mxu_probe30:
# batch-16 bf16 SwinIR inference 87.4 -> 70.9 ms; each knob also wins
# alone).  ROWS=2 halves the per-grid-step issue overhead and fits VMEM
# once TRANSPOSED_HEADS removes the d=16 lane padding.
ROWS = 2
BATCHED_HEADS = True
DEFER_NORM = False  # measured slightly slower than plain softmax (mxu_probe28)
# FAST_GELU: "auto" = polynomial gelu for bf16 compute dtype (within the
# bf16 activation-rounding class, see _gelu_fast), exact erf rational for
# f32.  True/False force.
FAST_GELU = "auto"
# TRANSPOSED_HEADS: stack heads as (heads*k, d, n) instead of (heads*k, n, d)
# — d=16 on the LANE dim pads 8x (3x 3.1 MB VMEM per strip, the ROWS=2 OOM);
# putting n=64 on lanes pads only 2x.  Scores/output dots re-expressed on
# the transposed operands; output is BIT-IDENTICAL to the untransposed
# kernel (mxu_probe30 rel_dev 0).
TRANSPOSED_HEADS = True
# NOMAX_SOFTMAX: softmax without the max-subtraction pass (f32 exp is safe
# for logits < 88; trained SwinIR attention logits are O(10), and the
# shift mask's -100 only underflows exp to 0, which IS the masking).  A
# violation produces a visible NaN, never silent corruption, and the
# backward pass (reference_block recompute) always uses the guarded
# softmax.  Set False to restore the max-subtracted form.
NOMAX_SOFTMAX = True
# Minimum batch * window-rows for the fused path (see eligible()): below
# this the per-block fixed cost beats the fusion win (batch-1 measured 4x
# slower fused; batch-16 1.4x faster — swinir_bench_r3 / mxu_probe32).
MIN_GRID_ROWS = 64
# FOLD_QK_SCALE: fold the attention scale into the q-columns of W_qkv /
# b_qkv at the (traced, differentiable) wrapper level — removes the
# s * scale VPU pass over the full score tensor, the largest tensor the
# kernel touches.  (x @ (s W_q)) vs s (x @ W_q): same rounding class.
FOLD_QK_SCALE = True
# Probe-only ablation knob (experiments/mxu_probe29): "none", "no_mlp",
# "no_attn" (skip dots+softmax), "no_qkv_attn", "relu" (gelu->relu),
# "no_ln".  Produces WRONG outputs — time attribution only.
ABLATE = "none"


def _pltpu_smem():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.SMEM


def _knobs():
    return (ROWS, BATCHED_HEADS, DEFER_NORM, FAST_GELU, TRANSPOSED_HEADS,
            NOMAX_SOFTMAX, FOLD_QK_SCALE, ABLATE, BWD_ROWS, ABLATE_BWD,
            RESHAPE_HEADS)


def _stack_heads(tT, heads, d):
    """(k2, heads*d, n) -> (heads*k2, d, n), head-major batch order —
    identical element order to the per-head slice+concat stacking."""
    k2, _, n = tT.shape
    if RESHAPE_HEADS:
        t = tT.reshape(k2, heads, d, n).transpose(1, 0, 2, 3)
        return t.reshape(heads * k2, d, n)
    return jnp.concatenate([tT[:, h * d : (h + 1) * d, :] for h in range(heads)], 0)


def _unstack_heads(t, heads):
    """Inverse of :func:`_stack_heads`: (heads*k2, d, n) -> (k2, heads*d, n)."""
    hk, d, n = t.shape
    k2 = hk // heads
    if RESHAPE_HEADS:
        return t.reshape(heads, k2, d, n).transpose(1, 0, 2, 3).reshape(k2, heads * d, n)
    return jnp.concatenate([t[h * k2 : (h + 1) * k2] for h in range(heads)], axis=1)


def _softmax_f32(s):
    if NOMAX_SOFTMAX:
        e = jnp.exp(s)
        return e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
    return jax.nn.softmax(s, axis=-1)


def _attention(qkv, bias, labels, *, heads, d, scale, masked, dtype):
    """(k, n, 3C) windows -> (k, n, C) attention output, all in VMEM."""
    k, n, _ = qkv.shape
    c = heads * d
    if BATCHED_HEADS and TRANSPOSED_HEADS:
        # (k, n, 3C) -> (k, 3C, n): ONE transpose of the big tensor, then
        # head stacking runs on SUBLANES and q/k/v live as (heads*k, d, n)
        # — n=64 lane-pads 2x instead of d=16 lane-padding 8x.
        qkvT = jnp.swapaxes(qkv, 1, 2)
        qT = _stack_heads(qkvT[:, :c, :], heads, d)
        kT = _stack_heads(qkvT[:, c : 2 * c, :], heads, d)
        vT = _stack_heads(qkvT[:, 2 * c :, :], heads, d)
        s = jax.lax.dot_general(
            qT, kT, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (heads*k, n, n)
        if scale != 1.0:  # folded into W_q when FOLD_QK_SCALE (static)
            s = s * scale
        s = s + jnp.broadcast_to(bias[:, None], (heads, k, n, n)).reshape(
            heads * k, n, n
        )
        if masked:
            m = jnp.where(labels[:, None, :] != labels[:, :, None], _NEG, 0.0)
            s = s + jnp.broadcast_to(m[None], (heads, k, n, n)).reshape(heads * k, n, n)
        if DEFER_NORM:
            # normalize the (d, n) output instead of the (n, n) map: the
            # divide pass runs on a 4x smaller tensor (n=64, d=16)
            if NOMAX_SOFTMAX:
                e = jnp.exp(s)
            else:
                e = jnp.exp(s - jax.lax.stop_gradient(jnp.max(s, -1, keepdims=True)))
            inv = 1.0 / jnp.sum(e, axis=-1)  # (heads*k, n)
            oT = jax.lax.dot_general(
                vT, e.astype(dtype), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (heads*k, d, n)
            oT = (oT * inv[:, None, :]).astype(dtype)
        else:
            p = _softmax_f32(s).astype(dtype)
            # o^T[b, d, i] = sum_j v^T[b, d, j] p[b, i, j]
            oT = jax.lax.dot_general(
                vT, p, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ).astype(dtype)  # (heads*k, d, n)
        attT = _unstack_heads(oT, heads)
        return jnp.swapaxes(attT, 1, 2)  # (k, n, C)
    if BATCHED_HEADS:
        # one (heads*k)-batched dot pair + one softmax: per-op issue
        # overhead, not FLOPs, dominates at these shapes (profile_swinir4).
        # Heads stack along the MAJOR (batch) dim via slice+concat — a
        # lane-splitting reshape (k,n,C)->(k,n,heads,d) is an unsupported
        # Mosaic shape cast.
        q = jnp.concatenate([qkv[:, :, h * d : (h + 1) * d] for h in range(heads)], 0)
        kk = jnp.concatenate(
            [qkv[:, :, c + h * d : c + (h + 1) * d] for h in range(heads)], 0
        )
        v = jnp.concatenate(
            [qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d] for h in range(heads)], 0
        )
        s = jax.lax.dot_general(
            q, kk, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if scale != 1.0:
            s = s * scale
        s = s + jnp.broadcast_to(bias[:, None], (heads, k, n, n)).reshape(
            heads * k, n, n
        )
        if masked:
            m = jnp.where(labels[:, None, :] != labels[:, :, None], _NEG, 0.0)
            s = s + jnp.broadcast_to(m[None], (heads, k, n, n)).reshape(heads * k, n, n)
        if DEFER_NORM:
            e = jnp.exp(s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True)))
            o = jax.lax.dot_general(
                e.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            o = o * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        else:
            p = _softmax_f32(s).astype(dtype)
            o = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
        o = o.astype(dtype)  # (heads*k, n, d)
        return jnp.concatenate([o[h * k : (h + 1) * k] for h in range(heads)], axis=-1)
    outs = []
    for hh in range(heads):
        q = qkv[:, :, hh * d : (hh + 1) * d]
        kk = qkv[:, :, c + hh * d : c + (hh + 1) * d]
        v = qkv[:, :, 2 * c + hh * d : 2 * c + (hh + 1) * d]
        s = jax.lax.dot_general(
            q, kk, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = (s * scale if scale != 1.0 else s) + bias[hh][None]
        if masked:
            s = s + jnp.where(labels[:, None, :] != labels[:, :, None], _NEG, 0.0)
        p = _softmax_f32(s).astype(dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        outs.append(o.astype(dtype))
    return jnp.concatenate(outs, axis=-1)


def _windowize(t, rows, ws, k, cc):
    """(rows*ws, W, cc) image strip -> (rows*k, n, cc) windows."""
    t = t.reshape(rows, ws, k, ws, cc).transpose(0, 2, 1, 3, 4)
    return t.reshape(rows * k, ws * ws, cc)


def _unwindowize(t, rows, ws, k, cc):
    """(rows*k, n, cc) windows -> (rows*ws, W, cc) image strip."""
    t = t.reshape(rows, k, ws, ws, cc).transpose(0, 2, 1, 3, 4)
    return t.reshape(rows * ws, k * ws, cc)


def _block_kernel(
    *refs,  # 2*rows x-strips, 13 params, bias, labels, [s1, s2,] out
    heads, d, scale, ws, delta, masked, eps, rows, scaled=False,
):
    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     wfc1, bfc1, wfc2, bfc2) = refs[2 * rows : 2 * rows + 12]
    if scaled:
        bias_ref, labels_ref, s1_ref, s2_ref, out_ref = refs[-5:]
    else:
        bias_ref, labels_ref, out_ref = refs[-3], refs[-2], refs[-1]
    c = heads * d
    # -- strip assembly: 2*rows 4-row blocks of the v_in-space tensor give
    # the ws*rows rolled rows; column rotation completes the horizontal roll
    xs = jnp.concatenate([r[0] for r in refs[: 2 * rows]], axis=0)  # (ws*rows, W, C)
    if delta:
        xs = jnp.concatenate([xs[:, delta:, :], xs[:, :delta, :]], axis=1)
    w_img = xs.shape[1]
    k = w_img // ws  # windows per row
    n = ws * ws
    if scaled:
        bi = pl.program_id(0)
        s1 = s1_ref[bi].astype(xs.dtype)
        s2 = s2_ref[bi].astype(xs.dtype)

    shortcut = xs
    h = xs if ABLATE == "no_ln" else _layernorm(xs, ln1_s[...], ln1_b[...], eps)
    if ABLATE == "no_qkv_attn":
        att = h
    else:
        qkv = _matmul(h, wqkv[...], bqkv[...])  # (ws*rows, W, 3C)

        # image rows -> (rows*k, n, 3C) windows (free in VMEM, mxu_probe26)
        qkv = _windowize(qkv, rows, ws, k, 3 * c)
        if ABLATE == "no_attn":
            att = qkv[:, :, 2 * c : 3 * c]
        else:
            labels = labels_ref[...].reshape(rows * k, n) if masked else None
            att = _attention(
                qkv, bias_ref[...], labels, heads=heads, d=d, scale=scale,
                masked=masked, dtype=xs.dtype,
            )
        att = _unwindowize(att, rows, ws, k, c)

    proj = _matmul(att, wproj[...], bproj[...])
    if scaled:
        proj = proj * s1
    y = shortcut + proj
    if ABLATE == "no_mlp":
        out_ref[0] = y
        return
    h2 = y if ABLATE == "no_ln" else _layernorm(y, ln2_s[...], ln2_b[...], eps)
    z = _matmul(h2, wfc1[...], bfc1[...])
    fast = FAST_GELU is True or (FAST_GELU == "auto" and z.dtype == jnp.bfloat16)
    if ABLATE == "relu":
        z = jnp.maximum(z, 0)
    else:
        z = _gelu_fast(z) if fast else _gelu_exact(z)
    mlp = _matmul(z, wfc2[...], bfc2[...])
    if scaled:
        mlp = mlp * s2
    out_ref[0] = y + mlp


# ---- fused backward (training) ----------------------------------------------
#
# One Pallas pass per block computes the WHOLE block VJP strip-by-strip:
# recompute the forward chain from the x strip (same rotated strip assembly
# as the forward), pull the output cotangent back through MLP -> LN2 ->
# proj -> window attention -> qkv -> LN1, write the input-gradient strip,
# and accumulate all 13 parameter gradients across grid steps (revisited
# f32 outputs, chanstats-style).  The input gradient comes out in ROLL
# space (the strip-aligned view); the wrapper applies one XLA roll.
# Gradients are the exact VJP of the kernel's own forward formulation
# (poly gelu / no-max softmax under the default knobs), so the primal and
# its gradients are consistent — deviation from the XLA block's autodiff
# is the same bf16-rounding class as the forward (tests/test_swinblock.py
# checks f32 agreement against jax.vjp of reference_block).

# window-rows per grid step for the backward kernel (its live set is ~2.5x
# the forward's; 2 needs the raised VMEM ceiling below and wins 161.2 ->
# 156.5 ms on the canonical train step — experiments/mxu_probe39).
BWD_ROWS = 2
# RESHAPE_HEADS: stack/unstack attention heads via sublane-split reshapes
# + a major-dim transpose instead of per-head slice/concat chains (~40
# fewer ops per grid step; the kernels are op-issue-bound — probe41).
# The LANE-split reshape (k,n,C)->(k,n,h,d) is an unsupported Mosaic
# shape cast, but here the split dim lives on SUBLANES ((k2, C, n) with
# n on lanes) and d=16 is a multiple of the 8-row sublane tile.
# Measured bit-equal on hardware with a small consistent edge (157.9 ->
# 157.4 ms median canonical train step, better in 4/5 interleaved trials
# — mxu_probe43); the slice/concat chains were NOT the dominant issue
# cost, so the win is marginal, but it is never worse and fewer ops.
RESHAPE_HEADS = True

# Probe-only ablation knob for the bwd kernel (experiments/mxu_probe41):
# "none", "no_attn_bwd" (skip the 5 attention-bwd dots + softmax bwd),
# "no_dw" (skip all parameter-grad dots/accumulations), "no_ln_bwd"
# (pass cotangents through the LayerNorms), "no_mlp_bwd" (skip the MLP
# gradient chain).  Produces WRONG gradients — time attribution only.
ABLATE_BWD = "none"

try:  # pltpu only needed for the raised scoped-VMEM ceiling
    from jax.experimental.pallas import tpu as _pltpu

    _BWD_COMPILER_PARAMS = _pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
except Exception:  # pragma: no cover
    _BWD_COMPILER_PARAMS = None

# d/du of the gelu polynomial S(u) (see _GELU_S)
_GELU_SP = tuple(k * c_ for k, c_ in enumerate(_GELU_S))[1:]


def _dgelu_fast(x):
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -4.0, 4.0)
    u = xc * xc

    def poly(cs):
        acc = jnp.full_like(u, cs[-1])
        for c_ in cs[-2::-1]:
            acc = acc * u + c_
        return acc

    g = 0.5 + 2.0 * xc * (poly(_GELU_S) + u * poly(_GELU_SP))
    return jnp.where(xf > 4.0, 1.0, jnp.where(xf < -4.0, 0.0, g))


def _dgelu_exact(x):
    xf = x.astype(jnp.float32)
    phi = jnp.exp(-0.5 * xf * xf) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    return 0.5 * (1.0 + _erf_f32(xf * np.float32(np.sqrt(0.5)))) + xf * phi


def _layernorm_bwd(x, gamma, eps, dy):
    """VJP of :func:`_layernorm` at ``x``: (dx, dgamma, dbeta); stats are
    recomputed (f32 fast-variance, identical formulation)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    dyf = dy.astype(jnp.float32)
    red = tuple(range(dy.ndim - 1))
    dgamma = jnp.sum(dyf * xhat, axis=red)
    dbeta = jnp.sum(dyf, axis=red)
    gf = gamma.astype(x.dtype).astype(jnp.float32)
    dxhat = dyf * gf
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dgamma, dbeta


def _matmul_dx(g, w):
    """dx of ``_matmul``: g @ w^T with the same dtype/accum policy."""
    return jax.lax.dot_general(
        g, w.astype(g.dtype), (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)


def _matmul_dw(x, g):
    """dW of ``_matmul``: x^T @ g over all leading dims, f32 accumulation."""
    cin, cout = x.shape[-1], g.shape[-1]
    x2 = x.reshape(-1, cin)
    g2 = g.reshape(-1, cout)
    return jax.lax.dot_general(
        x2, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _attention_fwd_parts(qkv, bias, labels, *, heads, d, masked, dtype):
    """Forward of the TRANSPOSED_HEADS+BATCHED_HEADS attention, returning
    the output windows plus the residuals the backward needs:
    (att_w (k2, n, C), qT, kT, vT (heads*k2, d, n), p32 (heads*k2, n, n))."""
    k2, n, _ = qkv.shape
    c = heads * d
    qkvT = jnp.swapaxes(qkv, 1, 2)
    qT = _stack_heads(qkvT[:, :c, :], heads, d)
    kT = _stack_heads(qkvT[:, c : 2 * c, :], heads, d)
    vT = _stack_heads(qkvT[:, 2 * c :, :], heads, d)
    s = jax.lax.dot_general(
        qT, kT, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s + jnp.broadcast_to(bias[:, None], (heads, k2, n, n)).reshape(heads * k2, n, n)
    if masked:
        m = jnp.where(labels[:, None, :] != labels[:, :, None], _NEG, 0.0)
        s = s + jnp.broadcast_to(m[None], (heads, k2, n, n)).reshape(heads * k2, n, n)
    p32 = _softmax_f32(s)
    p = p32.astype(dtype)
    oT = jax.lax.dot_general(
        vT, p, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dtype)  # (heads*k2, d, n)
    attT = _unstack_heads(oT, heads)
    return jnp.swapaxes(attT, 1, 2), qT, kT, vT, p32


def _attention_bwd_parts(datt_w, qT, kT, vT, p32, *, heads, d, dtype):
    """VJP of the transposed-head attention given its forward residuals:
    (k2, n, C) output cotangent -> (dqkv (k2, n, 3C), dbias (heads, n, n))."""
    k2, n, _ = datt_w.shape
    p = p32.astype(dtype)
    dattT = jnp.swapaxes(datt_w, 1, 2)  # (k2, C, n)
    doT = _stack_heads(dattT, heads, d)

    # dP[b,i,j] = sum_d doT[b,d,i] vT[b,d,j]
    dp = jax.lax.dot_general(
        doT, vT, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # dV^T[b,d,j] = sum_i doT[b,d,i] p[b,i,j]
    dvT = jax.lax.dot_general(
        doT, p, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dtype)
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))  # f32
    dbias = jnp.sum(ds.reshape(heads, k2, n, n), axis=1)  # (heads, n, n) f32
    ds_c = ds.astype(dtype)
    # dQ^T[b,d,i] = sum_j kT[b,d,j] ds[b,i,j]
    dqT = jax.lax.dot_general(
        kT, ds_c, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dtype)
    # dK^T[b,d,j] = sum_i qT[b,d,i] ds[b,i,j]
    dkT = jax.lax.dot_general(
        qT, ds_c, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dtype)

    dqkvT = jnp.concatenate(
        [_unstack_heads(dqT, heads), _unstack_heads(dkT, heads), _unstack_heads(dvT, heads)],
        axis=1,
    )
    return jnp.swapaxes(dqkvT, 1, 2), dbias


def _block_bwd_kernel(
    *refs,  # 2*rows x-strips, 12 params, bias, labels, s1, s2, g, then outs
    heads, d, ws, delta, masked, eps, rows,
):
    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     wfc1, bfc1, wfc2, bfc2) = refs[2 * rows : 2 * rows + 12]
    bias_ref, labels_ref, s1_ref, s2_ref, g_ref = refs[2 * rows + 12 : 2 * rows + 17]
    (dx_ref, dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwp_ref, dbp_ref,
     dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dbias_ref) = refs[2 * rows + 17 :]
    c = heads * d

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for r in (dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dwp_ref, dbp_ref,
                  dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dbias_ref):
            r[...] = jnp.zeros_like(r)

    # -- forward recompute (same strip assembly / math as _block_kernel)
    xs = jnp.concatenate([r[0] for r in refs[: 2 * rows]], axis=0)
    if delta:
        xs = jnp.concatenate([xs[:, delta:, :], xs[:, :delta, :]], axis=1)
    w_img = xs.shape[1]
    k = w_img // ws
    n = ws * ws
    k2 = rows * k
    dt = xs.dtype
    bi = pl.program_id(0)
    s1 = s1_ref[bi].astype(dt)
    s2 = s2_ref[bi].astype(dt)

    h1 = _layernorm(xs, ln1_s[...], ln1_b[...], eps)
    qkv = _matmul(h1, wqkv[...], bqkv[...])
    qkv_w = _windowize(qkv, rows, ws, k, 3 * c)
    labels = labels_ref[...].reshape(k2, n) if masked else None
    att_w, qT, kT, vT, p32 = _attention_fwd_parts(
        qkv_w, bias_ref[...], labels, heads=heads, d=d, masked=masked, dtype=dt
    )
    att = _unwindowize(att_w, rows, ws, k, c)
    y = xs + _matmul(att, wproj[...], bproj[...]) * s1
    h2 = _layernorm(y, ln2_s[...], ln2_b[...], eps)
    z1 = _matmul(h2, wfc1[...], bfc1[...])
    fast = FAST_GELU is True or (FAST_GELU == "auto" and z1.dtype == jnp.bfloat16)
    zg = _gelu_fast(z1) if fast else _gelu_exact(z1)

    # -- backward chain
    no_dw = ABLATE_BWD == "no_dw"
    g = g_ref[0]  # (rows*ws, W, C), output cotangent (aligned strip)
    if ABLATE_BWD == "no_mlp_bwd":
        dy1 = g
    else:
        gmlp = g * s2
        if not no_dw:
            dw2_ref[...] += _matmul_dw(zg, gmlp)
            db2_ref[...] += jnp.sum(gmlp.astype(jnp.float32), axis=(0, 1))
        dz = _matmul_dx(gmlp, wfc2[...])
        dgel = (_dgelu_fast(z1) if fast else _dgelu_exact(z1))
        dz1 = (dz.astype(jnp.float32) * dgel).astype(dt)
        if not no_dw:
            dw1_ref[...] += _matmul_dw(h2, dz1)
            db1_ref[...] += jnp.sum(dz1.astype(jnp.float32), axis=(0, 1))
        dh2 = _matmul_dx(dz1, wfc1[...])
        if ABLATE_BWD == "no_ln_bwd":
            dy_ln = dh2
        else:
            dy_ln, dg2, db2v = _layernorm_bwd(y, ln2_s[...], eps, dh2)
            if not no_dw:
                dln2s_ref[...] += dg2
                dln2b_ref[...] += db2v
        dy1 = g + dy_ln

    gproj = dy1 * s1
    if not no_dw:
        dwp_ref[...] += _matmul_dw(att, gproj)
        dbp_ref[...] += jnp.sum(gproj.astype(jnp.float32), axis=(0, 1))
    datt = _matmul_dx(gproj, wproj[...])
    datt_w = _windowize(datt, rows, ws, k, c)
    if ABLATE_BWD == "no_attn_bwd":
        dqkv_w = jnp.concatenate([datt_w, datt_w, datt_w], axis=-1)
    else:
        dqkv_w, dbias = _attention_bwd_parts(
            datt_w, qT, kT, vT, p32, heads=heads, d=d, dtype=dt
        )
        if not no_dw:
            dbias_ref[...] += dbias
    dqkv = _unwindowize(dqkv_w, rows, ws, k, 3 * c)
    if not no_dw:
        dwqkv_ref[...] += _matmul_dw(h1, dqkv)
        dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1))
    dh1 = _matmul_dx(dqkv, wqkv[...])
    if ABLATE_BWD == "no_ln_bwd":
        dx_ln = dh1
    else:
        dx_ln, dg1, db1v = _layernorm_bwd(xs, ln1_s[...], eps, dh1)
        if not no_dw:
            dln1s_ref[...] += dg1
            dln1b_ref[...] += db1v
    dx_ref[0] = dy1 + dx_ln


def _pallas_block_bwd(x, g, params, scales, *, heads, ws, delta, shift,
                      mask_hw, eps, interpret):
    """Backward pallas call: returns (dx_rolled, *param_grads) where
    dx_rolled is the cotangent of roll(x, (-delta, -delta)) — the caller
    rolls it back (+delta).  param_grads are f32 in _fused_params order."""
    b, h_img, w_img, c = x.shape
    d = c // heads
    n = ws * ws
    nrows = h_img // ws
    rows, nq, half, off = _strip_plan(h_img, w_img, c, ws, delta, rows_cap=BWD_ROWS)
    grid = (b, nrows // rows)

    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     wfc1, bfc1, wfc2, bfc2, bias_rp) = params
    hidden = wfc1.shape[1]
    masked = mask_hw is not None

    in_specs = [
        pl.BlockSpec(
            (1, half, w_img, c),
            lambda bi, i, jj=j: (bi, (2 * rows * i + jj + off) % nq, 0, 0),
        )
        for j in range(2 * rows)
    ] + _param_specs(c, hidden, heads, n)
    operands = [x] * (2 * rows) + [ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                                   ln2_s, ln2_b, wfc1, bfc1, wfc2, bfc2, bias_rp]
    lab_op, lab_spec = _labels_operand(masked, mask_hw, ws, shift, w_img, rows, n)
    operands.append(lab_op)
    in_specs.append(lab_spec)
    s1, s2 = scales
    sspec = pl.BlockSpec((b,), lambda bi, i: (0,), memory_space=_pltpu_smem())
    operands += [s1.astype(jnp.float32), s2.astype(jnp.float32)]
    in_specs += [sspec, sspec]
    operands.append(g)
    in_specs.append(pl.BlockSpec((1, rows * ws, w_img, c), lambda bi, i: (bi, i, 0, 0)))

    const = lambda bi, i: (0, 0)
    const1 = lambda bi, i: (0,)
    acc = jnp.float32
    out_specs = [
        pl.BlockSpec((1, rows * ws, w_img, c), lambda bi, i: (bi, i, 0, 0)),
        pl.BlockSpec((c,), const1), pl.BlockSpec((c,), const1),
        pl.BlockSpec((c, 3 * c), const), pl.BlockSpec((3 * c,), const1),
        pl.BlockSpec((c, c), const), pl.BlockSpec((c,), const1),
        pl.BlockSpec((c,), const1), pl.BlockSpec((c,), const1),
        pl.BlockSpec((c, hidden), const), pl.BlockSpec((hidden,), const1),
        pl.BlockSpec((hidden, c), const), pl.BlockSpec((c,), const1),
        pl.BlockSpec((heads, n, n), lambda bi, i: (0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h_img, w_img, c), x.dtype),
        jax.ShapeDtypeStruct((c,), acc), jax.ShapeDtypeStruct((c,), acc),
        jax.ShapeDtypeStruct((c, 3 * c), acc), jax.ShapeDtypeStruct((3 * c,), acc),
        jax.ShapeDtypeStruct((c, c), acc), jax.ShapeDtypeStruct((c,), acc),
        jax.ShapeDtypeStruct((c,), acc), jax.ShapeDtypeStruct((c,), acc),
        jax.ShapeDtypeStruct((c, hidden), acc), jax.ShapeDtypeStruct((hidden,), acc),
        jax.ShapeDtypeStruct((hidden, c), acc), jax.ShapeDtypeStruct((c,), acc),
        jax.ShapeDtypeStruct((heads, n, n), acc),
    ]
    kernel = functools.partial(
        _block_bwd_kernel, heads=heads, d=d, ws=ws,
        delta=delta, masked=masked, eps=eps, rows=rows,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _BWD_COMPILER_PARAMS,
    )(*operands)


def _window_group_labels(h, w, window_size, shift_size):
    """(nHw, nWw, n) group labels of the rolled image — the factored form
    of the attention mask (mask[w,i,j] = -100*(g[w,i] != g[w,j]);
    reference: swinir.py:310-328)."""
    img = np.zeros((h, w))
    sl = (slice(0, -window_size), slice(-window_size, -shift_size), slice(-shift_size, None))
    cnt = 0
    for hs in sl:
        for ws_ in sl:
            img[hs, ws_] = cnt
            cnt += 1
    lab = img.reshape(h // window_size, window_size, w // window_size, window_size)
    lab = lab.transpose(0, 2, 1, 3).reshape(h // window_size, w // window_size, window_size**2)
    return lab.astype(np.float32)


def _strip_plan(h_img, w_img, c, ws, delta, rows_cap=None, vmem_rows=None):
    """(rows, nq, half, off): window-rows per grid step (largest configured
    count that divides the image and keeps the strip inside the calibrated
    VMEM bound — which scales with the requested cap, since the raised
    compiler vmem ceiling admits bigger strips), 4-row strip count, half
    window, and the strip-pick offset."""
    cap = rows_cap or ROWS
    if vmem_rows is None:
        vmem_rows = (1 << 17) * max(2, cap)
    nrows = h_img // ws
    rows = 1
    for cand in range(cap, 1, -1):
        if nrows % cand == 0 and cand * ws * w_img * c <= vmem_rows:
            rows = cand
            break
    half = ws // 2
    return rows, h_img // half, half, delta // half


def _param_specs(c, hidden, heads, n):
    const = lambda bi, i: (0, 0)
    const1 = lambda bi, i: (0,)
    return [
        pl.BlockSpec((c,), const1),
        pl.BlockSpec((c,), const1),
        pl.BlockSpec((c, 3 * c), const),
        pl.BlockSpec((3 * c,), const1),
        pl.BlockSpec((c, c), const),
        pl.BlockSpec((c,), const1),
        pl.BlockSpec((c,), const1),
        pl.BlockSpec((c,), const1),
        pl.BlockSpec((c, hidden), const),
        pl.BlockSpec((hidden,), const1),
        pl.BlockSpec((hidden, c), const),
        pl.BlockSpec((c,), const1),
        pl.BlockSpec((heads, n, n), lambda bi, i: (0, 0, 0)),
    ]


def _labels_operand(masked, mask_hw, ws, shift, w_img, rows, n):
    if masked:
        labels = _window_group_labels(*mask_hw, ws, shift)  # numpy (nHw, nWw, n)
        return labels, pl.BlockSpec((rows, w_img // ws, n), lambda bi, i: (i, 0, 0))
    # dummy single-block operand so the kernel arity is static
    return jnp.zeros((1, 1, n), jnp.float32), pl.BlockSpec((1, 1, n), lambda bi, i: (0, 0, 0))


def _pallas_block(x, params, *, heads, scale, ws, delta, shift, mask_hw, eps,
                  interpret, scales=None):
    b, h_img, w_img, c = x.shape
    d = c // heads
    n = ws * ws
    nrows = h_img // ws
    rows, nq, half, off = _strip_plan(h_img, w_img, c, ws, delta)
    grid = (b, nrows // rows)

    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     wfc1, bfc1, wfc2, bfc2, bias_rp) = params
    hidden = wfc1.shape[1]

    masked = mask_hw is not None
    # strip picks: rolled rows [rows*ws*i + delta, +rows*ws) of the
    # v_in-space tensor = 4-row strips 2*rows*i + j + delta/half (mod nq)
    in_specs = [
        pl.BlockSpec(
            (1, half, w_img, c),
            lambda bi, i, jj=j: (bi, (2 * rows * i + jj + off) % nq, 0, 0),
        )
        for j in range(2 * rows)
    ] + _param_specs(c, hidden, heads, n)
    operands = [x] * (2 * rows) + [ln1_s, ln1_b, wqkv, bqkv, wproj, bproj,
                                   ln2_s, ln2_b, wfc1, bfc1, wfc2, bfc2, bias_rp]
    lab_op, lab_spec = _labels_operand(masked, mask_hw, ws, shift, w_img, rows, n)
    operands.append(lab_op)
    in_specs.append(lab_spec)
    if scales is not None:
        s1, s2 = scales
        # SMEM: the kernel reads s[program_id(0)] — a dynamic scalar index,
        # which VMEM vector loads cannot express (Mosaic requires 128-aligned
        # vector loads); SMEM supports it natively.
        sspec = pl.BlockSpec(
            (x.shape[0],), lambda bi, i: (0,), memory_space=_pltpu_smem()
        )
        operands += [s1.astype(jnp.float32), s2.astype(jnp.float32)]
        in_specs += [sspec, sspec]

    kernel = functools.partial(
        _block_kernel, heads=heads, d=d, scale=scale, ws=ws,
        delta=delta, masked=masked, eps=eps, rows=rows, scaled=scales is not None,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows * ws, w_img, c), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _BWD_COMPILER_PARAMS,
    )(*operands)


def reference_block(x, params, *, heads, scale, ws, delta, shift, mask_hw, eps,
                    scales=None):
    """XLA twin of the fused kernel — identical roll-space contract
    (input at offset v_in, output at offset ``shift``), built from the
    same formulation the unfused model path uses.  VJP recompute target
    and CPU parity oracle.  ``scales``: optional per-sample DropPath
    keep-scales (s1, s2) as in :func:`fused_swin_block_train`."""
    from . import winattn

    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
     wfc1, bfc1, wfc2, bfc2, bias_rp) = params
    if delta:
        x = jnp.roll(x, (-delta, -delta), axis=(1, 2))
    shortcut = x
    eps_ = eps

    def ln(t, s, b_):
        return _layernorm(t, s, b_, eps_)

    def lin(t, w, b_):
        return _matmul(t, w, b_)

    s1 = s2 = None
    if scales is not None:
        s1 = scales[0].astype(x.dtype)[:, None, None, None]
        s2 = scales[1].astype(x.dtype)[:, None, None, None]

    h = ln(x, ln1_s, ln1_b)
    qkv = lin(h, wqkv, bqkv)
    if mask_hw is None:
        mask = None
    else:
        from ...models.swinir import _shift_attn_mask

        mask = _shift_attn_mask(*mask_hw, ws, shift)
    att = winattn.reference_window_attention_2d(qkv, bias_rp, mask, scale, heads, ws)
    proj = lin(att, wproj, bproj)
    y = shortcut + (proj if s1 is None else proj * s1)
    h2 = ln(y, ln2_s, ln2_b)
    z = jax.nn.gelu(lin(h2, wfc1, bfc1), approximate=False)
    mlp = lin(z, wfc2, bfc2)
    return y + (mlp if s2 is None else mlp * s2)


@functools.lru_cache(maxsize=64)
def _fused_fn(heads, scale, ws, delta, shift, mask_hw, eps, interpret, knobs):
    del knobs  # cache-key only: the kernel body reads the module knobs at trace time
    @jax.custom_vjp
    def block(x, *params):
        return _pallas_block(
            x, params, heads=heads, scale=scale, ws=ws, delta=delta,
            shift=shift, mask_hw=mask_hw, eps=eps, interpret=interpret,
        )

    def fwd(x, *params):
        return block(x, *params), (x, params)

    def bwd(res, g):
        x, params = res
        _, vjp = jax.vjp(
            lambda x_, *p: reference_block(
                x_, p, heads=heads, scale=scale, ws=ws, delta=delta,
                shift=shift, mask_hw=mask_hw, eps=eps,
            ),
            x,
            *params,
        )
        return vjp(g)

    block.defvjp(fwd, bwd)
    return block


def fused_swin_block(x, params, *, heads, scale, ws, delta, shift, mask_hw, eps):
    """One full transformer block in roll space: ``x`` (B, H, W, C) at roll
    offset v_in, returns the block output at roll offset ``shift``
    (delta = (shift - v_in) mod ws).  ``params`` is the 13-tuple
    (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b, wfc1, bfc1,
    wfc2, bfc2, bias_rp); ``mask_hw`` is (H, W) when this block's windows
    are shift-masked, else None."""
    scale = float(scale)
    if FOLD_QK_SCALE:
        # differentiable trace-level fold: scale the q-columns of W_qkv and
        # b_qkv, run the kernel (and its reference-recompute bwd) at scale 1
        (ln1_s, ln1_b, wqkv, bqkv, *rest) = params
        c = wqkv.shape[0]
        colscale = jnp.concatenate(
            [jnp.full((c,), scale, wqkv.dtype), jnp.ones((2 * c,), wqkv.dtype)]
        )
        params = (ln1_s, ln1_b, wqkv * colscale, bqkv * colscale, *rest)
        scale = 1.0
    fn = _fused_fn(
        heads, scale, ws, int(delta), int(shift), mask_hw, float(eps),
        MODE == "interpret", _knobs(),
    )
    return fn(x, *params)


@functools.lru_cache(maxsize=64)
def _train_fn(heads, ws, delta, shift, mask_hw, eps, interpret, knobs):
    del knobs  # cache-key only

    @jax.custom_vjp
    def block(x, s1, s2, *params):
        return _pallas_block(
            x, params, heads=heads, scale=1.0, ws=ws, delta=delta,
            shift=shift, mask_hw=mask_hw, eps=eps, interpret=interpret,
            scales=(s1, s2),
        )

    def fwd(x, s1, s2, *params):
        return block(x, s1, s2, *params), (x, s1, s2, params)

    def bwd(res, g):
        x, s1, s2, params = res
        outs = _pallas_block_bwd(
            x, g, params, (s1, s2), heads=heads, ws=ws, delta=delta,
            shift=shift, mask_hw=mask_hw, eps=eps, interpret=interpret,
        )
        dxr, grads = outs[0], outs[1:]
        dx = jnp.roll(dxr, (delta, delta), axis=(1, 2)) if delta else dxr
        grads = tuple(gr.astype(p.dtype) for gr, p in zip(grads, params))
        return (dx, jnp.zeros_like(s1), jnp.zeros_like(s2), *grads)

    block.defvjp(fwd, bwd)
    return block


def fused_swin_block_train(x, params, s1, s2, *, heads, scale, ws, delta, shift,
                           mask_hw, eps):
    """Training twin of :func:`fused_swin_block`: forward runs the fused
    kernel with per-sample DropPath keep-scales ``s1``/``s2`` ((B,) float,
    mask/keep_prob — ones when stochastic depth is off), and the backward
    is the fused whole-block VJP kernel (one pallas pass: forward
    recompute + full gradient chain + parameter-grad accumulation across
    the grid).  Gradients are the exact VJP of the kernel's own forward
    formulation; agreement with autodiff of the XLA reference block is
    checked in tests/test_swinblock.py.  Requires the default knob combo
    (batched transposed heads, no deferred norm)."""
    if not (BATCHED_HEADS and TRANSPOSED_HEADS and not DEFER_NORM):
        raise NotImplementedError(
            "fused_swin_block_train supports only the default knob combination "
            "(BATCHED_HEADS, TRANSPOSED_HEADS, DEFER_NORM=False)."
        )
    # always fold the attention scale (differentiable trace-level fold, see
    # fused_swin_block): the train kernels run at scale 1
    (ln1_s, ln1_b, wqkv, bqkv, *rest) = params
    c = wqkv.shape[0]
    if float(scale) != 1.0:
        colscale = jnp.concatenate(
            [jnp.full((c,), float(scale), wqkv.dtype), jnp.ones((2 * c,), wqkv.dtype)]
        )
        params = (ln1_s, ln1_b, wqkv * colscale, bqkv * colscale, *rest)
    fn = _train_fn(
        heads, ws, int(delta), int(shift), mask_hw, float(eps),
        MODE == "interpret", _knobs(),
    )
    return fn(x, s1, s2, *params)


def eligible(b, h_img, w_img, c, heads, ws, backend=None) -> bool:
    """Fused-block gating: TPU (or interpret mode), ws-aligned even strips,
    VMEM-sized rows, and enough grid steps to amortize the kernel's
    per-block fixed cost — at batch 1 the fused path measured 4x SLOWER
    than the per-op winattn path (36.3 vs ~8.5 ms, swinir_bench_r3), at
    batch 16 it is 1.4x faster; gate at batch*window-rows >= 64 (the
    measured-winning batch-16 x 128px shape has 256).  A mesh scope
    (ops/pallas/guard) disables the kernel: pallas is not
    SPMD-partitionable."""
    from .guard import kernels_allowed

    if not kernels_allowed():
        return False
    if MODE == "off":
        return False
    backend = backend or jax.default_backend()
    if MODE != "interpret" and backend != "tpu":
        return False
    if ws % 2 or h_img % ws or w_img % ws or c % heads:
        return False
    if MODE != "interpret" and b * (h_img // ws) < MIN_GRID_ROWS:
        return False
    # per-strip VMEM residency ~ 12 bf16 copies of (ws, W, C) + f32 temps
    return ws * w_img * c <= 1 << 18


def eligible_train(b, h_img, w_img, c, heads, ws, backend=None) -> bool:
    """Gating for the fused TRAIN path (forward + whole-block VJP kernel):
    the inference gates plus the knob combination the backward kernel
    implements."""
    if not (BATCHED_HEADS and TRANSPOSED_HEADS and not DEFER_NORM):
        return False
    return eligible(b, h_img, w_img, c, heads, ws, backend)
