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

MEASURED OUTCOME (experiments/pallas_fusedlayer_probe.json): the kernel is
numerically correct (rel 6e-4 vs XLA on-device) but ~41% SLOWER than the
XLA sequence standalone (3-layer chain 1.39 vs 0.99 ms at canonical
shapes) — XLA's conv emitter beats the hand im2col(th=16, K=9C) dot — and
composition adds {3,0,2,1}<->{3,2,1,0} relayout copies at the custom-call
boundary.  NOT wired into the models; retained as the evidence-backed
answer to the "Pallas conv+BN fusion" lever (VERDICT r1 #1) and as a
working template for future kernels (grid-tiled halo reads via clamped
pl.ds + roll/mask, per-tile im2col, revisited stat accumulation).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int) -> int:
    # th=16 keeps the (th*W, 9C) im2col tile + double-buffered I/O blocks
    # inside the 16 MB VMEM budget at canonical shapes (th=32 OOM'd by 1 KB).
    # The clamped halo window needs th + 2 <= h, so th must divide h AND be
    # strictly smaller; returns 0 if no tile works (caller falls back).
    for th in (16, 8):
        if h % th == 0 and th + 2 <= h:
            return th
    return 0


def _kernel(x_ref, w_ref, a_ref, b_ref, y_ref, sums_ref, *, relu_in, th):
    jb = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((jb == 0) & (t == 0))
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    _, h, w, c = x_ref.shape
    cout = w_ref.shape[-1]
    dt = x_ref.dtype

    # Read the (th+2)-row halo window for this tile straight from the input
    # ref (scratch-free: whole-image temporaries repeatedly blew the VMEM
    # budget — Mosaic does not reuse big buffers across unrolled code).
    # The window start is clamped into bounds; a roll + row mask realigns
    # and zeroes out-of-image rows, and zeroing happens AFTER the affine+
    # ReLU (conv SAME pads the ACTIVATED map with zeros).
    want = t * th - 1
    start = jnp.clip(want, 0, h - th - 2)
    shift = want - start  # -1 (first tile), 0 (interior), +1 (last tile)
    raw = x_ref[0, pl.ds(start, th + 2), :, :]  # (th+2, W, C)
    # shift is traced; select among static-shift rolls (concat-lowerable)
    raw = jnp.where(
        shift == -1,
        jnp.roll(raw, 1, axis=0),
        jnp.where(shift == 1, jnp.roll(raw, -1, axis=0), raw),
    )
    ra = raw * a_ref[...].astype(dt) + b_ref[...].astype(dt)
    if relu_in:
        ra = jnp.maximum(ra, jnp.zeros((), dt))
    rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0) + want
    ra = jnp.where((rows >= 0) & (rows < h), ra, jnp.zeros((), dt))
    ra = jnp.pad(ra, ((0, 0), (1, 1), (0, 0)))  # (th+2, W+2, C)

    wk = w_ref[...].reshape(9 * c, cout)  # (9C, Cout), tap-major
    cols = [ra[u : u + th, v : v + w, :].reshape(th * w, c) for u in range(3) for v in range(3)]
    patches = jnp.concatenate(cols, axis=1)
    acc = jax.lax.dot_general(
        patches, wk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (th*W, Cout)
    yb = acc.astype(y_ref.dtype)
    y_ref[0] = yb.reshape(1, th, w, cout)[0]
    yf = yb.astype(jnp.float32)
    sums_ref[0, :] += jnp.sum(yf, axis=0)
    sums_ref[1, :] += jnp.sum(yf * yf, axis=0)


def fused_layer(x, w, a, b, *, relu_in=True):
    """(y, sums): y = conv3x3_SAME(relu(x * a + b), w); sums = (2, Cout)
    f32 [sum(y), sum(y^2)] of the bf16-rounded output.

    x: (B, H, W, C); w: (3, 3, C, Cout); a, b: (C,) f32 per-channel affine
    (identity: a=1, b=0; relu_in=False skips the activation).
    """
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]
    th = _pick_tile(h)
    if th == 0:
        return fused_layer_reference(x, w, a, b, relu_in=relu_in)
    kern = functools.partial(_kernel, relu_in=relu_in, th=th)
    y, sums = pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec((1, h, wd, c), lambda j, t: (j, 0, 0, 0)),
            pl.BlockSpec((3, 3, c, cout), lambda j, t: (0, 0, 0, 0)),
            pl.BlockSpec((c,), lambda j, t: (0,)),
            pl.BlockSpec((c,), lambda j, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, wd, cout), lambda j, t: (j, t, 0, 0)),
            pl.BlockSpec((2, cout), lambda j, t: (0, 0)),
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
