"""int8 fused ResBlock conv-chain for the SERVING forward (eval mode),
in the convchain W-on-lanes layout.

Why this exists (VERDICT r4 #6 / results_r4.md int8 floor argument): the
XLA int8 serving path caps at ~1.47x end-to-end because the C<=64
stages are LANE-bound under the conv emitter's C-on-lanes layout — int8
weights do not add output lanes.  convchain's (N, H, C, W) layout puts
W on the lanes (128 regardless of C), so every stage is MAC-bound *in
kernel layout*, where the v5e MXU's int8 394-vs-197 TOPS should pay ~2x
(prerequisite measured by experiments/mxu_probe52.py).

Scheme (same static symmetric PTQ as quant.py — reference has no
quantization at all; this is a TPU-native extra):
- x8 int8 activations in the packed convchain layout (N, H/P, C, P*W);
- each layer: int8 x int8 -> int32 MXU dots over the 3 ky taps (the
  convchain shift-stack built directly on int8), then ONE f32
  per-channel affine folding dequant (sx * sw), conv bias, and the
  following EVAL BatchNorm; mid-chain layers apply ReLU and requantize
  to the next layer's int8 scale in VMEM (the chain never round-trips
  f32 through HBM); the last layer emits the model compute dtype.

Training is out of scope (quantization is serving-only, quant.py).
Semantics being preserved: conv->eval-BN->ReLU chains of
pssr/models/_blocks.py:20-41 under quant.py's W8A8 numbers.

**REFUTED COMPOSED (round 5, experiments/profile_int8_chain.json).**
End-to-end canonical serving A/B (batch-16 128->512, interleaved
trials): bf16 14.91 ms, per-conv XLA int8 12.41 ms (1.20x), this chain
13.92 ms packed / 13.45 ms W=128-only — the chain loses ~1.0-1.5 ms to
the XLA int8 path it replaces.  Two compounding causes, consistent with
probe51's training refutation and probe52/52b: (1) the deep stages'
int8 convs are already lane-full under the XLA emitter, so the MAC-rate
hypothesis only ever applied to the C<=64 stages — a minority of the
already-int8 conv time; (2) the per-image Pallas grid serializes layer
passes that XLA pipelines across fusions (the probe41 issue-overhead
regime; a single-op Mosaic dot could not even be timed through the
~4 ms dispatch floor).  MODE defaults "off"; the kernels + bitwise
parity suite (tests/test_q8chain.py) and the engine suffix-split
integration stay as the documented negative result.  The shipping int8
serving path remains quant.py's XLA engine (ResUNet 1.32x, floor ~1.47x
— results_r4.md).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import convchain

# "auto" (kernel on TPU for eligible shapes), "off", "interpret".
# Default "off": refuted composed (module docstring / profile_int8_chain).
MODE = "off"
# Packed W<128 serving stages: independent of convchain.PACK (that flag
# is the TRAINING refutation, probe51 — no backward pass here and the
# MXU runs int8 at 2x, so the serving decision gets its own probe).
PACK = True
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=convchain.VMEM_BUDGET)


def eligible(n, h, w, cin, cout, *, backend=None) -> bool:
    """Serving-only: int8 sublane tiles are 32 deep, so channels must be
    32-aligned (the entry cin=1 layer stays on the XLA prefix)."""
    from .guard import kernels_allowed

    if MODE == "off" or not kernels_allowed():
        return False
    if MODE != "interpret":
        backend = backend or jax.default_backend()
        if backend != "tpu":
            return False
    p = convchain.pack_factor(h, w)
    if p == 0 or (p > 1 and not PACK):
        return False
    if cin % 32 or cout % 32:
        return False
    return convchain._footprint(h // p, w * p, cin, cout, 1, False) <= convchain.VMEM_BUDGET


def _q8_layer_kernel(x_ref, wmat_ref, aff_ref, y_ref, *, last, pack):
    cin = x_ref.shape[2]
    w = x_ref.shape[3]
    h_img = x_ref.shape[1]
    cout = y_ref.shape[2]

    hx = x_ref[0]  # (Hp, cin, L) int8
    if pack > 1:
        taps = convchain._row_taps(hx, w // pack)
    else:
        zero = jnp.zeros((1, cin, w), hx.dtype)
        hp = jnp.concatenate([zero, hx, zero], axis=0)
        stack = convchain._shift_stack(hp, w)

    wmat = wmat_ref[...]  # (cout, 9cin) int8
    acc = jnp.zeros((h_img, cout, w), jnp.int32)
    for ky in range(3):
        if pack > 1:
            rows = convchain._dx_stack_packed(taps[ky], w // pack)
        else:
            rows = jax.lax.slice_in_dim(stack, ky, ky + h_img, axis=0)
        wk = jax.lax.slice_in_dim(wmat, ky * 3 * cin, (ky + 1) * 3 * cin, axis=1)
        wb = jnp.broadcast_to(wk[None], (h_img, cout, 3 * cin))
        acc = acc + jax.lax.dot_general(
            wb, rows, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
        )

    alpha = aff_ref[0].reshape(1, cout, 1)
    beta = aff_ref[1].reshape(1, cout, 1)
    z = acc.astype(jnp.float32) * alpha + beta
    if last:
        y_ref[0] = z.astype(y_ref.dtype)
    else:
        # ReLU + requant to the next layer's int8 (1/sx_next is folded
        # into alpha/beta by the caller, so clip(round(max(z, 0))) is all
        # that remains — identical to quant.py's quantize_tensor rounding)
        q = jnp.round(jnp.maximum(z, 0.0))
        y_ref[0] = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def q8_conv_layer(x8, wmat8, affine, *, last=False, pack=1, out_dtype=jnp.bfloat16):
    """One int8 serving layer on packed (N, Hp, C, L) activations.

    ``wmat8`` is the int8 ``convchain.kernel_matrix`` form (cout, 9cin);
    ``affine`` is (2, cout) f32 (alpha, beta) with the requant 1/sx_next
    already folded for mid-chain layers.  Returns int8 (mid-chain) or
    ``out_dtype`` (last=True)."""
    n, hp, cin, lanes = x8.shape
    cout = wmat8.shape[0]
    y_dtype = out_dtype if last else jnp.int8
    return pl.pallas_call(
        functools.partial(_q8_layer_kernel, last=last, pack=pack),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, cin, lanes), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((cout, 9 * cin), lambda i: (0, 0)),
            pl.BlockSpec((2, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hp, cout, lanes), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hp, cout, lanes), y_dtype),
        interpret=MODE == "interpret",
        compiler_params=None if MODE == "interpret" else _COMPILER_PARAMS,
    )(x8, wmat8, affine)


def pack_nhwc(x, p):
    """NHWC -> the packed (N, H/p, C, p*W) chain layout (XLA-side)."""
    n, h, w, c = x.shape
    return (
        x.reshape(n, h // p, p, w, c).transpose(0, 1, 4, 2, 3).reshape(n, h // p, c, p * w)
    )


def unpack_nhwc(y, p, w):
    """Packed (N, Hp, C, p*W) -> NHWC."""
    n, hp, c, lanes = y.shape
    return (
        y.reshape(n, hp, c, p, w).transpose(0, 1, 3, 4, 2).reshape(n, hp * p, w, c)
    )


def reference_q8_layer(x8, wmat8, affine, *, last=False, out_dtype=jnp.bfloat16):
    """XLA twin on the same packed layout (oracle for tests): unpadded
    int32 conv + the identical affine/requant epilogue."""
    n, hp, cin, lanes = x8.shape
    cout = wmat8.shape[0]
    kernel = jnp.transpose(wmat8.reshape(cout, 3, 3, cin), (1, 2, 3, 0))
    # the packed layout is only a VIEW; the oracle must convolve the TRUE
    # image, so callers pass pack=1 shapes here (tests unpack first)
    xn = jnp.transpose(x8, (0, 1, 3, 2))  # (N, Hp, L, cin)
    y = jax.lax.conv_general_dilated(
        xn.astype(jnp.int8),
        kernel.astype(jnp.int8),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = jnp.transpose(y, (0, 1, 3, 2)).astype(jnp.float32)
    z = y * affine[0].reshape(1, 1, cout, 1) + affine[1].reshape(1, 1, cout, 1)
    if last:
        return z.astype(out_dtype)
    return jnp.clip(jnp.round(jnp.maximum(z, 0.0)), -127.0, 127.0).astype(jnp.int8)
