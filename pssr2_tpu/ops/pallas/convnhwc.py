"""Fused ResBlock conv layer for the DEEP stages: NHWC-native tap-dot
conv + per-channel affine/ReLU prologue + (sum, sum^2) stat epilogue.

Complement of :mod:`convchain` (which owns the C<=64 @W%128==0 stages by
moving W onto lanes): at C>=128 the NHWC layout is already lane-full, so
this kernel keeps NHWC — no boundary transposes — and expresses the 3x3
conv as 9 static-shift tap dots ``(H*W, cin) @ (cin, cout)`` per image:
M = H*W (full MXU rows even at 8x8 spatial x batch grid), K = cin,
N = cout.  What the XLA conv emitter cannot do is the point: the BN
apply+ReLU prologue and the next BN's f32 (sum, sum^2) epilogue ride the
same pass, deleting the separate stat-reduce fusions that round 3
measured at ~2.5x their byte floor and probed to the XLA plateau
(results_r3.md: "BN stat reduces" family; probes 35-38/42 closed every
XLA formulation AND the standalone Pallas stat kernel).

Reference semantics preserved: pssr/models/_blocks.py:20-41 (ResBlock
conv->BatchNorm2d->ReLU chain); same seams as convchain
(FastBatchNorm.apply_coeffs glue between per-layer calls — train-mode BN
is batch-global, so per-layer pallas_calls are semantically forced).

Training: :func:`fused_conv_layer_nhwc` is a ``jax.custom_vjp`` whose
backward recomputes the prologue, folds the stat cotangents
(g = gy + cast(gs1 + 2*y*gs2)), grid-accumulates f32 dW/dbias/d_ab
(the BN-backward channel reductions ride along), and scatters
``g @ W_k^T`` back through the 9 tap windows for dx.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DEFAULT OFF — documented negative result (probe47, round 4; kept with
# its tests as the probe24/probe42-style closed lever).  Composed
# canonical-step A/B, interleaved medians:
#   off 44.86 ms | nhwc-only 56.39 | chain+nhwc 48.77   (probe47d, im2col
#   single-dot form; the 9-sequential-tap-dot form was worse: 58.53)
# The deep-stage XLA conv emitter is already at its cycle estimate
# (results_r3.md floor table) and the im2col build (9 shifted VPU copies
# + lane concat = 9x activation bytes per layer per direction) costs far
# more than the ~2.6 ms of separate BN-stat fusions it deletes.  Mosaic
# lowering facts hit on the way: concat rejects operands carrying slice
# offsets on a non-concat dim (build shifts from aligned zero-concats,
# and produce dx per-tap rather than lane-slicing one big dot output).
# "interpret" runs the CPU tests; "auto" re-enables on TPU for A/B.
MODE = "off"
VMEM_BUDGET = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET)


def _footprint(h, w, cin, cout, itemsize, train):
    x = (h + 2) * (w + 2) * cin * itemsize
    q = 9 * h * w * cin * itemsize  # im2col matrix
    acc = h * w * cout * 4
    y = h * w * cout * itemsize
    extra = 0
    if train:
        # d_q f32 + the d_hp accumulator and its padded d_tap temps
        # (Mosaic stack allocation is conservative: probe47 first attempt
        # hit 115 MB at 128^2 C=64 with a naive 1x estimate)
        extra = 9 * h * w * cin * 4
        extra += 3 * (h + 2) * (w + 2) * cin * 4
        extra += h * w * cout * itemsize  # g resident
    return x + 2 * q + acc + y + extra


def eligible(n, h, w, cin, cout, dtype, *, train, backend=None) -> bool:
    """TPU + bf16 compute; lane-heavy channels; modest spatial tiles.
    Complement of convchain: picks up the W%128!=0 stages."""
    from .guard import kernels_allowed

    if MODE == "off" or not kernels_allowed():
        return False
    if MODE != "interpret":
        backend = backend or jax.default_backend()
        if backend != "tpu" or dtype != jnp.bfloat16:
            return False
    if cin % 8 or cout % 8 or cout < 64:
        return False
    if w % 128 == 0:
        return False  # convchain's territory (W on lanes beats tap-dots there)
    return _footprint(h, w, cin, cout, 2, train) <= VMEM_BUDGET


def _prologue(x, ab_ref, cin):
    """BN apply + ReLU as an f32 per-channel affine rounded once to the
    compute dtype (bn_train apply semantics) — channels-last."""
    if ab_ref is None:
        return x
    a = ab_ref[0].reshape(1, 1, cin)
    b = ab_ref[1].reshape(1, 1, cin)
    z = x.astype(jnp.float32) * a + b
    return jnp.maximum(z, 0.0).astype(x.dtype)


def _shift2(hx, dy, dx, h, w, cin):
    """out[i, j] = hx[i+dy, j+dx], zero outside — built from aligned
    zero-concats (Mosaic cannot concat operands carrying slice offsets on
    a non-concat dim: 'result/input offset mismatch', probe47b)."""
    t = hx
    if dy == -1:
        t = jnp.concatenate([jnp.zeros((1, w, cin), t.dtype), t[: h - 1]], axis=0)
    elif dy == 1:
        t = jnp.concatenate([t[1:], jnp.zeros((1, w, cin), t.dtype)], axis=0)
    if dx == -1:
        t = jnp.concatenate([jnp.zeros((h, 1, cin), t.dtype), t[:, : w - 1]], axis=1)
    elif dx == 1:
        t = jnp.concatenate([t[:, 1:], jnp.zeros((h, 1, cin), t.dtype)], axis=1)
    return t


def _tap_matrix(hx, h, w, cin):
    """(H, W, C) image -> (H*W, 9C) im2col matrix, tap-major columns in
    (ky, kx) order (tap (ky, kx) reads x[i+ky-1, j+kx-1])."""
    taps = [
        _shift2(hx, ky - 1, kx - 1, h, w, cin).reshape(h * w, cin)
        for ky in range(3)
        for kx in range(3)
    ]
    return jnp.concatenate(taps, axis=1)


def _layer_kernel(x_ref, w_ref, bias_ref, *rest, relu_in):
    ab_ref = rest[0] if relu_in else None
    y_ref, s1_ref, s2_ref = rest[-3:]
    h_img, w_img, cin = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = y_ref.shape[3]

    x = x_ref[0]  # (H, W, C)
    hx = _prologue(x, ab_ref, cin) if relu_in else x

    # im2col: 9 shifted tap copies concatenated on lanes, ONE MXU dot
    # (the 9-sequential-dot form measured +14 ms composed — probe47
    # first attempt; Mosaic kernels are op-issue-bound, probe27/41)
    q = _tap_matrix(hx, h_img, w_img, cin)  # (H*W, 9cin)
    wk = w_ref[...].reshape(9 * cin, cout)  # (ky, kx, cin)-major rows
    acc = jax.lax.dot_general(
        q, wk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    bias = bias_ref[...].astype(jnp.float32).reshape(1, cout).astype(y_ref.dtype)
    y = acc.astype(y_ref.dtype) + bias
    y_ref[0] = y.reshape(h_img, w_img, cout)
    yf = y.astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[...] += jnp.sum(yf, axis=0)
    s2_ref[...] += jnp.sum(yf * yf, axis=0)


def _layer_bwd_kernel(x_ref, w_ref, y_ref, gy_ref, gs_ref, *rest, relu_in):
    ab_ref = rest[0] if relu_in else None
    if relu_in:
        dx_ref, dw_ref, dbias_ref, dab_ref = rest[-4:]
    else:
        dx_ref, dw_ref, dbias_ref = rest[-3:]
        dab_ref = None
    h_img, w_img, cin = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = y_ref.shape[3]
    m = h_img * w_img

    x = x_ref[0]
    if relu_in:
        a = ab_ref[0].reshape(1, 1, cin)
        b = ab_ref[1].reshape(1, 1, cin)
        z = x.astype(jnp.float32) * a + b
        hx = jnp.maximum(z, 0.0).astype(x.dtype)
    else:
        hx = x

    # stat-folded cotangent, rounded like the XLA twin
    yf = y_ref[0].astype(jnp.float32)
    gs1 = gs_ref[0].reshape(1, 1, cout)
    gs2 = gs_ref[1].reshape(1, 1, cout)
    g = gy_ref[0] + (gs1 + 2.0 * yf * gs2).astype(gy_ref.dtype)  # (H, W, cout)
    g2 = g.reshape(m, cout)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        if dab_ref is not None:
            dab_ref[...] = jnp.zeros_like(dab_ref)

    dbias_ref[...] += jnp.sum(g2.astype(jnp.float32), axis=0)

    # dW = q^T @ g and d_q = g @ W^T, one MXU dot each (im2col form —
    # the 9-sequential-dot variant measured +14 ms composed, probe47)
    q = _tap_matrix(hx, h_img, w_img, cin)  # (M, 9cin)
    wk = w_ref[...].reshape(9 * cin, cout)
    dw_ref[...] += jax.lax.dot_general(
        q, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(9, cin, cout)

    # dx: per-tap dots (fresh, offset-free outputs — a single g @ W^T dot
    # followed by lane-slices feeds pads operands carrying lane offsets,
    # which Mosaic concat lowering rejects: probe47c), each scattered
    # back through the adjoint shift
    wk3 = w_ref[...]  # (9, cin, cout)
    d_hx = jnp.zeros((h_img, w_img, cin), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            d_tap = jax.lax.dot_general(
                g2, wk3[3 * ky + kx], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(h_img, w_img, cin)
            # adjoint of tap (ky, kx): d_hx[a, b] += d_tap[a-(ky-1), b-(kx-1)]
            d_hx = d_hx + _shift2(d_tap, 1 - ky, 1 - kx, h_img, w_img, cin)
    if relu_in:
        mask = (z > 0).astype(jnp.float32)
        d_z = d_hx * mask
        dab_ref[0] += jnp.sum(d_z * x.astype(jnp.float32), axis=(0, 1))
        dab_ref[1] += jnp.sum(d_z, axis=(0, 1))
        dx = d_z * ab_ref[0].reshape(1, 1, cin)
    else:
        dx = d_hx
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pallas_layer(x, wk, bias, ab, *, relu_in, interpret):
    n, h, w, cin = x.shape
    cout = wk.shape[2]
    specs = [
        pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0)),
        pl.BlockSpec((cout,), lambda i: (0,)),
    ]
    args = [x, wk, bias]
    if relu_in:
        specs.append(pl.BlockSpec((2, cin), lambda i: (0, 0)))
        args.append(ab)
    return pl.pallas_call(
        functools.partial(_layer_kernel, relu_in=relu_in),
        grid=(n,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)


def _pallas_layer_bwd(x, wk, y, gy, gs, ab, *, relu_in, interpret):
    n, h, w, cin = x.shape
    cout = wk.shape[2]
    specs = [
        pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((2, cout), lambda i: (0, 0)),
    ]
    args = [x, wk, y, gy, gs]
    out_specs = [
        pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0)),
        pl.BlockSpec((cout,), lambda i: (0,)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n, h, w, cin), x.dtype),
        jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        jax.ShapeDtypeStruct((cout,), jnp.float32),
    ]
    if relu_in:
        specs.append(pl.BlockSpec((2, cin), lambda i: (0, 0)))
        args.append(ab)
        out_specs.append(pl.BlockSpec((2, cin), lambda i: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((2, cin), jnp.float32))
    return pl.pallas_call(
        functools.partial(_layer_bwd_kernel, relu_in=relu_in),
        grid=(n,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)


def kernel_taps(kernel):
    """HWIO (3, 3, cin, cout) -> (9, cin, cout), (ky, kx) major."""
    kh, kw, cin, cout = kernel.shape
    return kernel.reshape(kh * kw, cin, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_layer(x, wk, bias, ab, relu_in):
    return _pallas_layer(
        x,
        wk.astype(x.dtype),
        bias.astype(x.dtype),
        ab,
        relu_in=relu_in,
        interpret=MODE == "interpret",
    )


def _fused_layer_fwd(x, wk, bias, ab, relu_in):
    out = _fused_layer(x, wk, bias, ab, relu_in)
    return out, (x, wk, ab, out[0])


def _fused_layer_bwd(relu_in, res, cts):
    x, wk, ab, y = res
    gy, gs1, gs2 = cts
    gs = jnp.stack([gs1, gs2]).astype(jnp.float32)
    outs = _pallas_layer_bwd(
        x,
        wk.astype(x.dtype),
        y,
        gy.astype(x.dtype),
        gs,
        ab,
        relu_in=relu_in,
        interpret=MODE == "interpret",
    )
    if relu_in:
        dx, dw, dbias, dab = outs
    else:
        dx, dw, dbias = outs
        dab = jnp.zeros_like(ab)
    return dx, dw.astype(wk.dtype), dbias.astype(jnp.float32), dab.astype(ab.dtype)


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_conv_layer_nhwc(x, wk, bias, ab=None, *, relu_in=True):
    """One fused ResBlock layer on NHWC activations (deep-stage twin of
    convchain.fused_conv_layer — same contract, no layout change):
    returns ``(y, s1, s2)`` with y = conv3x3(relu(a*x + b)) + bias and
    f32 per-channel (sum(y), sum(y^2)) for the next BatchNorm."""
    if ab is None:
        ab = jnp.zeros((2, x.shape[3]), jnp.float32)
    return _fused_layer(x, wk, bias, ab, relu_in)


def reference_layer_nhwc(x, wk, bias, ab=None, *, relu_in=True):
    """XLA twin on NHWC (oracle for tests)."""
    n, h, w, cin = x.shape
    cout = wk.shape[2]
    if relu_in:
        a = ab[0].reshape(1, 1, 1, cin)
        b = ab[1].reshape(1, 1, 1, cin)
        hx = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0).astype(x.dtype)
    else:
        hx = x
    kernel = wk.reshape(3, 3, cin, cout).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        hx, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = (y + bias.astype(x.dtype)).astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))
