"""Pallas TPU kernel: fused [per-channel affine + ReLU] -> 3x3 SAME conv
-> [output + channel sums] — one HBM pass per ResBlock layer.

The canonical ResBlock layer chain (normalize+relu pass, conv pass, stats
pass) costs ~3 separate HBM passes per layer in XLA; this kernel reads the
raw previous conv output once and writes the raw conv output plus the
(2, Cout) [sum, sum-of-squares] its BatchNorm needs — the affine
coefficients for the NEXT layer then come from tiny scalar math.

Kernel structure (grid over batch):
- the (1, H, W, C) input image lives in VMEM (2-4 MB at PSSR shapes);
- prologue: x_hat = relu(x * a + b) computed in VMEM (bf16);
- im2col per H-tile: patches (th*W, 9C) built by 9 VMEM slices of the
  zero-padded x_hat, contracted against the (9C, Cout) reshaped kernel in
  ONE MXU dot (full K=9C contraction depth, unlike a 9-tap loop);
- epilogue: accumulate [sum(y), sum(y^2)] of the bf16-rounded output into
  a revisited (2, Cout) f32 output (exact BN-stat semantics).

Composition caveat (see CLAUDE.md): pallas_call operand layout constraints
forced whole-activation relayouts for a previous kernel in this repo
(experiments/mxu_probe16); `fused_layer` is validated in the FULL train
step before use (experiments/pallas_fusedlayer probe).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int) -> int:
    for th in (32, 16, 8):
        if h % th == 0:
            return th
    return h


def _kernel(x_ref, w_ref, a_ref, b_ref, y_ref, sums_ref, *, relu_in, th):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    x = x_ref[0]  # (H, W, C)
    h, w, c = x.shape
    cout = w_ref.shape[-1]
    xa = x.astype(jnp.float32) * a_ref[...] + b_ref[...]
    if relu_in:
        xa = jnp.maximum(xa, 0)
    xa = xa.astype(x.dtype)
    xp = jnp.pad(xa, ((1, 1), (1, 1), (0, 0)))  # (H+2, W+2, C)

    wk = w_ref[...].reshape(9 * w_ref.shape[2], cout)  # (9C, Cout), tap-major

    s0 = jnp.zeros((cout,), jnp.float32)
    s1 = jnp.zeros((cout,), jnp.float32)
    for t0 in range(0, h, th):
        # patches (th*W, 9C): tap-major columns to match wk's reshape
        cols = [
            xp[t0 + u : t0 + u + th, v : v + w, :].reshape(th * w, c)
            for u in range(3)
            for v in range(3)
        ]
        patches = jnp.concatenate(cols, axis=1)
        acc = jax.lax.dot_general(
            patches, wk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (th*W, Cout)
        yb = acc.astype(y_ref.dtype)
        y_ref[0, t0 : t0 + th, :, :] = yb.reshape(th, w, cout)
        yf = yb.astype(jnp.float32)
        s0 = s0 + jnp.sum(yf, axis=0)
        s1 = s1 + jnp.sum(yf * yf, axis=0)
    sums_ref[0, :] += s0
    sums_ref[1, :] += s1


def fused_layer(x, w, a, b, *, relu_in=True):
    """(y, sums): y = conv3x3_SAME(relu(x * a + b), w); sums = (2, Cout)
    f32 [sum(y), sum(y^2)] of the bf16-rounded output.

    x: (B, H, W, C); w: (3, 3, C, Cout); a, b: (C,) f32 per-channel affine
    (identity: a=1, b=0; relu_in=False skips the activation).
    """
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]
    th = _pick_tile(h)
    kern = functools.partial(_kernel, relu_in=relu_in, th=th)
    y, sums = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, wd, c), lambda j: (j, 0, 0, 0)),
            pl.BlockSpec((3, 3, c, cout), lambda j: (0, 0, 0, 0)),
            pl.BlockSpec((c,), lambda j: (0,)),
            pl.BlockSpec((c,), lambda j: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, wd, cout), lambda j: (j, 0, 0, 0)),
            pl.BlockSpec((2, cout), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
            jax.ShapeDtypeStruct((2, cout), jnp.float32),
        ],
    )(x, w.astype(x.dtype), a.astype(jnp.float32), b.astype(jnp.float32))
    return y, sums


def fused_layer_reference(x, w, a, b, *, relu_in=True):
    """Plain-XLA reference implementation (also the custom-VJP backward
    basis if the kernel ships)."""
    xa = x.astype(jnp.float32) * a + b
    if relu_in:
        xa = jnp.maximum(xa, 0)
    xa = xa.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xa, w.astype(x.dtype), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    yf = y.astype(jnp.float32)
    sums = jnp.stack([jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))])
    return y, sums
