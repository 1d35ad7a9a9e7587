"""Fused ResBlock conv layer: per-channel affine + ReLU prologue -> 3x3
conv -> bias -> per-channel (sum, sum-of-squares) stat epilogue, in a
channels-on-sublanes / width-on-lanes activation layout.

Motivation (round-3 profile, experiments/results_r3.md): the canonical
ResUNet step spends 16.8 ms in the enc/dec conv family against a ~13 ms
floor, plus 9.7 ms of separate f32[C]-output BatchNorm stat/apply fusions
running at ~2.5x their byte floor.  Two structural causes, both fixed by
this kernel's formulation:

1. **Lane fill.**  The TPU conv emitter keeps C on lanes (physical
   activation layout {3,0,2,1}: C lanes, N sublanes), so every C<=64
   stage fills at most half of the MXU's 128 output lanes and pays a 2x
   HBM lane-padding tax (CLAUDE.md round-3 facts).  Here activations are
   (N, H, C, W): W=128 exactly fills the lanes, C=64 sits on sublanes
   (no padding in bf16), and the conv becomes one
   ``(C_out, 9*C_in) @ (9*C_in, W)`` MXU dot per output row, built from a
   dx-shifted row stack with NO per-row copies (three lane-rolls of the
   whole image once per grid step; three consecutive stack rows then
   *reshape* to the (9*C_in, W) operand).

2. **Stat passes.**  BatchNorm train statistics are a full-tensor read
   per layer each direction as XLA fusions.  Here ``(sum(y), sum(y^2))``
   accumulate in f32 on the fly while the conv output tile is still in
   VMEM, into grid-revisited (C,) outputs — the rdtail/probe44 pattern —
   and the previous layer's BN apply + ReLU runs as this layer's
   prologue, so the normalized tensor is never materialized in HBM.

Reference semantics being preserved: pssr/models/_blocks.py:20-41
(ResBlock: conv3x3 -> BatchNorm2d -> ReLU chain) with this repo's
FastBatchNorm formulation (ops/batchnorm.py) and sg_bias convs (bias adds
under stop_gradient in train mode — models/blocks.py:SGBiasConv).

Training: :func:`fused_conv_layer` is a ``jax.custom_vjp`` whose backward
is a second Pallas pass of the same structure (transposed-kernel conv for
dx; per-tap ``stack_row @ g_row^T`` dots grid-accumulated into f32 dW;
upstream stat cotangents folded as ``g + ds1 + 2*y*ds2`` with y
recomputed in-kernel).  See `_layer_bwd_kernel`.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# "auto" (kernel on TPU for eligible shapes), "off", "interpret" (CPU tests)
MODE = "auto"
# Probe50 isolation flags (read at trace time; defaults = shipping state):
# PAD_ENTRY: accept cin<8 layers by zero-padding to a sublane tile (bbfb629;
# probe50: -0.11 ms composed, stays ON).
# VMEM_TRANSPOSE: do the NHWC<->NHCW chain-boundary transposes inside the
# first/last pass instead of as XLA HBM transposes (0e8f0d2).  Probe50
# REFUTED it composed: +2.45 ms on the canonical step (ship 43.84 vs
# explicit-HBM 41.39 ms) — the in-kernel swapaxes on the (H, W, C) block
# serializes against the dot pipeline, while the XLA transpose pair
# overlaps with neighbors.  Default OFF; kept as the documented negative
# result (experiments/mxu_probe50.json).
PAD_ENTRY = True
VMEM_TRANSPOSE = False
# PACK: run W<128 stages with P = 128/W image rows side by side on the
# lanes ((N, H/P, C, P*W) activations), so the deep C>=128 stages fill
# all 128 output lanes too.  ky taps become one slice+concat row shift
# per direction (lane groups carry across packed-row boundaries); kx
# shifts mask the P-1 interior seams.
# REFUTED COMPOSED for TRAINING (probe51: +3.9 ms on the canonical step,
# 45.0 vs 41.1 ms base) — the deep stages' convs are already at the
# emitter's MXU floor and the packed taps + VJP pass cost more than the
# fused BN-stat machinery saves.  Default OFF for training; the path +
# its parity suite (tests/test_convchain.py::TestPacked*) stay as the
# documented negative result, and the layout is reused by the int8
# serving chain (q8chain.py), where the MAC-bound hypothesis applies to
# an MXU running at 2x int8 rate with no backward pass.
PACK = False
# Per-call VMEM budget (bytes): x + shifted stack (3x) + y + f32 temps.
VMEM_BUDGET = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=VMEM_BUDGET,
)


def _footprint(h, w, cin, cout, itemsize, train):
    """VMEM bytes for one grid step (one image)."""
    x = (h + 2) * cin * w * itemsize
    stack = 3 * x
    wb = h * cout * 3 * cin * itemsize  # broadcast ky-slab of the kernel
    acc = h * cout * w * 4  # f32 batched-dot accumulator
    y = h * cout * w * itemsize
    if train:
        acc += cout * 9 * cin * 4  # dW accumulator
        stack += y  # g rows resident too
    return x + stack + wb + acc + y


def pack_factor(h, w) -> int:
    """Rows packed per 128-lane row for a (H, W) stage: 1 for W%128==0
    stages, 128/W when W divides 128 and H is a multiple of the factor
    (PACK extension); 0 = shape not packable."""
    if w >= 128:
        return 1 if w % 128 == 0 else 0
    if 128 % w:
        return 0
    p = 128 // w
    return p if h % p == 0 else 0


def eligible(n, h, w, cin, cout, dtype, *, train, backend=None) -> bool:
    """TPU + bf16 compute, lane-exact width (or lane-packable rows),
    sublane-tile channels."""
    from .guard import kernels_allowed

    if MODE == "off" or not kernels_allowed():
        return False
    if MODE != "interpret":
        backend = backend or jax.default_backend()
        if backend != "tpu" or dtype != jnp.bfloat16:
            return False
    p = pack_factor(h, w)
    if p == 0 or (p > 1 and not PACK) or cout % 8:
        return False
    if cin % 8 and (cin >= 8 or not PAD_ENTRY):
        return False  # cin < 8 rides zero-padded to a full sublane tile
    return _footprint(h // p, w * p, max(cin, 8), cout, 2, train) <= VMEM_BUDGET


def _shift_stack(hp, w):
    """(R, C, W) rows -> (R, 3C, W) stack of dx-shifted copies, matching
    kx order of a SAME 3x3 conv: block kx reads input column w + kx - 1."""

    # static lane shifts as slice+pad (Mosaic cannot rotate bf16 vectors:
    # tpu.dynamic_rotate is 32-bit only — probe45 first attempt)
    zcol = jnp.zeros(hp.shape[:-1] + (1,), hp.dtype)

    def shift(dx):  # out[..., w] = hp[..., w + dx], zero out of range
        if dx == -1:
            return jnp.concatenate([zcol, hp[..., : w - 1]], axis=-1)
        return jnp.concatenate([hp[..., 1:], zcol], axis=-1)

    return jnp.concatenate([shift(-1), hp, shift(1)], axis=1)


def _row_taps(hx, w_img):
    """Packed ky taps: (Hp, C, L) with P = L/w_img image rows per packed
    row (lane group j = image row pr*P + j) -> the three conv row taps
    (row-1, row, row+1), each (Hp, C, L).  Shifting the image by one row
    in packed space = shifting lanes by w_img with the wrapped lane group
    carried to/from the adjacent packed row (zeros past the image edge)."""
    hp_rows, _, lanes = hx.shape
    zrow = jnp.zeros((1,) + hx.shape[1:], hx.dtype)
    prev = jnp.concatenate([zrow, hx[:-1]], axis=0)  # packed row pr-1
    nxt = jnp.concatenate([hx[1:], zrow], axis=0)  # packed row pr+1
    up = jnp.concatenate([prev[..., lanes - w_img :], hx[..., : lanes - w_img]], axis=-1)
    down = jnp.concatenate([hx[..., w_img:], nxt[..., :w_img]], axis=-1)
    return up, hx, down


def _dx_stack_packed(t, w_img):
    """(R, C, L) tap -> (R, 3C, L) dx-shifted stack, kx order matching
    `_shift_stack`; the P-1 interior lane seams (image-width boundaries
    inside the packed row) are zero-masked like the outer edges."""
    lanes = t.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lanes), 2) % w_img
    zcol = jnp.zeros(t.shape[:-1] + (1,), t.dtype)
    zero = jnp.zeros_like(t)
    left = jnp.concatenate([zcol, t[..., : lanes - 1]], axis=-1)  # in col w-1
    left = jnp.where(lane == 0, zero, left)
    right = jnp.concatenate([t[..., 1:], zcol], axis=-1)  # in col w+1
    right = jnp.where(lane == w_img - 1, zero, right)
    return jnp.concatenate([left, t, right], axis=1)


def _prologue(x, ab_ref, cin):
    """Previous layer's BN apply + ReLU as a per-channel f32 affine
    rounded once to the compute dtype (bn_train apply semantics: the
    normalization arithmetic stays f32, the output is model-dtype)."""
    if ab_ref is None:
        return x
    a = ab_ref[0].reshape(cin, 1)
    b = ab_ref[1].reshape(cin, 1)
    z = x.astype(jnp.float32) * a + b
    return jnp.maximum(z, 0.0).astype(x.dtype)


def _layer_kernel(x_ref, wmat_ref, bias_ref, *rest, relu_in, tin, tout, pack):
    ab_ref = rest[0] if relu_in else None
    y_ref, s1_ref, s2_ref = rest[-3:]
    cin = x_ref.shape[3] if tin else x_ref.shape[2]
    w = x_ref.shape[2] if tin else x_ref.shape[3]
    h_img = y_ref.shape[1]
    cout = y_ref.shape[3] if tout else y_ref.shape[2]

    x = x_ref[0]
    if tin:  # NHWC block: transpose to (H, cin, W) in VMEM (no HBM pass)
        x = jnp.swapaxes(x, 1, 2)
    hx = _prologue(x, ab_ref, cin) if relu_in else x
    if cin < 8:  # zero-pad to a full sublane tile (wmat is pre-padded)
        hx = jnp.concatenate([hx, jnp.zeros((h_img, 8 - cin, w), hx.dtype)], axis=1)
        cin = 8
    if pack > 1:
        taps = _row_taps(hx, w // pack)  # 3 x (Hp, cin, L)
    else:
        zero = jnp.zeros((1, cin, w), hx.dtype)
        hp = jnp.concatenate([zero, hx, zero], axis=0)  # (H+2, cin, W)
        stack = _shift_stack(hp, w)  # (H+2, 3cin, W)

    wmat = wmat_ref[...]  # (cout, 9cin) compute dtype
    # match the XLA twin's rounding: conv rounds to the model dtype first,
    # THEN adds the model-dtype bias (reference_layer / NHWC conv path).
    # Reshape while still f32 (Mosaic: minor-dim insertion is 32-bit only).
    bias = bias_ref[...].astype(jnp.float32).reshape(1, cout, 1).astype(y_ref.dtype)

    # One batched (over H) MXU dot per ky tap: output row h reads input
    # rows h-1+ky from the dx-shifted stack, so the ky slab is a STATIC
    # H-row slice of it (Mosaic has no dynamic_slice of in-kernel values;
    # batched dot_general beats a per-row loop anyway — probe23).
    acc = jnp.zeros((h_img, cout, w), jnp.float32)
    for ky in range(3):
        if pack > 1:
            rows = _dx_stack_packed(taps[ky], w // pack)  # (Hp, 3cin, L)
        else:
            rows = jax.lax.slice_in_dim(stack, ky, ky + h_img, axis=0)  # (H, 3cin, W)
        wk = jax.lax.slice_in_dim(wmat, ky * 3 * cin, (ky + 1) * 3 * cin, axis=1)
        wb = jnp.broadcast_to(wk[None], (h_img, cout, 3 * cin))
        acc = acc + jax.lax.dot_general(
            wb, rows, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )

    y = acc.astype(y_ref.dtype) + bias
    y_ref[0] = jnp.swapaxes(y, 1, 2) if tout else y
    yf = y.astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[...] += jnp.sum(yf, axis=(0, 2))
    s2_ref[...] += jnp.sum(yf * yf, axis=(0, 2))


def _pallas_layer(x, wmat, bias, ab, *, relu_in, interpret, tin=False, tout=False, pack=1):
    if tin:
        n, h, w, cin = x.shape
    else:
        n, h, cin, w = x.shape
    cout = wmat.shape[0]
    specs = [
        pl.BlockSpec((1, *x.shape[1:]), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((cout, 9 * max(cin, 8)), lambda i: (0, 0)),
        pl.BlockSpec((cout,), lambda i: (0,)),
    ]
    args = [x, wmat, bias]
    if relu_in:
        specs.append(pl.BlockSpec((2, cin), lambda i: (0, 0)))
        args.append(ab)
    y_shape = (n, h, w, cout) if tout else (n, h, cout, w)
    return pl.pallas_call(
        functools.partial(_layer_kernel, relu_in=relu_in, tin=tin, tout=tout, pack=pack),
        grid=(n,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, *y_shape[1:]), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda i: (0,)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(y_shape, x.dtype),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)


def _layer_bwd_kernel(x_ref, wmat_ref, y_ref, gy_ref, gs_ref, *rest, relu_in, tin, tout, pack):
    """Per-image VJP pass: stat-folded cotangent, dW/dbias/da/db grid
    accumulation, transposed-kernel conv for dx."""
    ab_ref = rest[0] if relu_in else None
    if relu_in:
        dx_ref, dw_ref, dbias_ref, dab_ref = rest[-4:]
    else:
        dx_ref, dw_ref, dbias_ref = rest[-3:]
        dab_ref = None
    cin = x_ref.shape[3] if tin else x_ref.shape[2]
    w = x_ref.shape[2] if tin else x_ref.shape[3]
    h_img = y_ref.shape[1]
    cout = y_ref.shape[3] if tout else y_ref.shape[2]

    x = x_ref[0]
    if tin:
        x = jnp.swapaxes(x, 1, 2)  # NHWC residual -> (H, cin, W) in VMEM
    cin_true = cin
    # recompute the prologue (z for the ReLU mask, hx for the dW operand)
    if relu_in:
        a = ab_ref[0].reshape(cin, 1)
        b = ab_ref[1].reshape(cin, 1)
        z = x.astype(jnp.float32) * a + b
        hx = jnp.maximum(z, 0.0).astype(x.dtype)
    else:
        hx = x
    if cin < 8:  # zero-pad to a full sublane tile (matches the fwd pass)
        hx = jnp.concatenate([hx, jnp.zeros((h_img, 8 - cin, w), hx.dtype)], axis=1)
        cin = 8
    if pack > 1:
        taps = _row_taps(hx, w // pack)
    else:
        zero = jnp.zeros((1, cin, w), hx.dtype)
        hp = jnp.concatenate([zero, hx, zero], axis=0)  # (H+2, cin, W)
        stack = _shift_stack(hp, w)  # (H+2, 3cin, W)

    # stat-folded cotangent, rounded exactly like the XLA twin: the
    # f32-cast's VJP casts (gs1 + 2*yf*gs2) back to the model dtype, THEN
    # autodiff sums it with gy
    y_res = y_ref[0]
    gy = gy_ref[0]
    if tout:  # NHWC residual/cotangent -> (H, cout, W) in VMEM
        y_res = jnp.swapaxes(y_res, 1, 2)
        gy = jnp.swapaxes(gy, 1, 2)
    yf = y_res.astype(jnp.float32)
    gs1 = gs_ref[0].reshape(1, cout, 1)
    gs2 = gs_ref[1].reshape(1, cout, 1)
    g = gy + (gs1 + 2.0 * yf * gs2).astype(gy.dtype)  # (H, cout, W)

    wmat = wmat_ref[...]  # (cout, 9cin)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
        if dab_ref is not None:
            dab_ref[...] = jnp.zeros_like(dab_ref)

    gf = g.astype(jnp.float32)
    dbias_ref[...] += jnp.sum(gf, axis=(0, 2))

    # dW_ky = sum_h g[h] @ stack[h+ky]^T  (batched dot over H, then reduce)
    for ky in range(3):
        if pack > 1:
            rows = _dx_stack_packed(taps[ky], w // pack)  # (Hp, 3cin, L)
        else:
            rows = jax.lax.slice_in_dim(stack, ky, ky + h_img, axis=0)  # (H, 3cin, W)
        dwk = jax.lax.dot_general(
            g, rows, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (H, cout, 3cin)
        dw_ref[:, ky * 3 * cin : (ky + 1) * 3 * cin] += jnp.sum(dwk, axis=0)

    # dx: d_stack[p] = sum_ky W_ky^T @ g[p + 1 - ky] — the tap row shift
    # rides on g (row shifts commute with the per-position channel
    # contraction; zero edge rows stay zero through the dot), so d_stack
    # rows align with hx rows directly
    if pack > 1:
        g_taps = _row_taps(g, w // pack)  # (up, center, down)
    else:
        zrow = jnp.zeros((1, cout, w), g.dtype)
        g_zpad = jnp.concatenate([zrow, g, zrow], axis=0)  # (H+2, cout, W)
    d_stack = jnp.zeros((h_img, 3 * cin, w), jnp.float32)
    for ky in range(3):
        if pack > 1:
            rg = g_taps[2 - ky]  # ky=0 -> g[row+1] (down), ky=2 -> up
        else:
            rg = jax.lax.slice_in_dim(g_zpad, 2 - ky, 2 - ky + h_img, axis=0)
        wk = jax.lax.slice_in_dim(wmat, ky * 3 * cin, (ky + 1) * 3 * cin, axis=1)
        wkt = jnp.broadcast_to(jnp.swapaxes(wk, 0, 1)[None], (h_img, 3 * cin, cout))
        d_stack = d_stack + jax.lax.dot_general(
            wkt, rg, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )

    # un-shift the dx-stack blocks (adjoint of _shift_stack: the block
    # that read column w+dx scatters back to column w-(-dx) = w - dx)
    b0 = jax.lax.slice_in_dim(d_stack, 0, cin, axis=1)
    b1 = jax.lax.slice_in_dim(d_stack, cin, 2 * cin, axis=1)
    b2 = jax.lax.slice_in_dim(d_stack, 2 * cin, 3 * cin, axis=1)
    zc = jnp.zeros(b0.shape[:-1] + (1,), b0.dtype)
    if pack > 1:
        # adjoint of the seam-masked shifts: mask the block at its dead
        # seam lanes, THEN shift back (the packed fwd zeroed those lanes,
        # so their cotangent must not cross the seam)
        w_img = w // pack
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2) % w_img
        b0 = jnp.where(lane == 0, jnp.zeros_like(b0), b0)
        b2 = jnp.where(lane == w_img - 1, jnp.zeros_like(b2), b2)
    # fwd block dx: out[w] = hp[w+dx]  =>  d_hp[w] += block[w - dx]
    # block0 had dx=-1: d_hp[w] += b0[w+1];  block2 dx=+1: d_hp[w] += b2[w-1]
    d_hx = (
        jnp.concatenate([b0[..., 1:], zc], axis=-1)
        + b1
        + jnp.concatenate([zc, b2[..., : w - 1]], axis=-1)
    )  # (H, cin, W) f32 — pad rows of hp carry no cotangent (they are constants)

    if cin_true < cin:  # drop the zero-pad channels' cotangent
        d_hx = jax.lax.slice_in_dim(d_hx, 0, cin_true, axis=1)
    if relu_in:
        mask = (z > 0).astype(jnp.float32)
        d_z = d_hx * mask
        dab_ref[0] += jnp.sum(d_z * x.astype(jnp.float32), axis=(0, 2))
        dab_ref[1] += jnp.sum(d_z, axis=(0, 2))
        dx = d_z * ab_ref[0].reshape(cin_true, 1)
    else:
        dx = d_hx
    dx = dx.astype(dx_ref.dtype)
    dx_ref[0] = jnp.swapaxes(dx, 1, 2) if tin else dx


def _pallas_layer_bwd(x, wmat, y, gy, gs, ab, *, relu_in, interpret, tin=False, tout=False, pack=1):
    n = x.shape[0]
    cout = wmat.shape[0]
    specs = [
        pl.BlockSpec((1, *x.shape[1:]), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec(wmat.shape, lambda i: (0, 0)),
        pl.BlockSpec((1, *y.shape[1:]), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, *gy.shape[1:]), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((2, cout), lambda i: (0, 0)),
    ]
    args = [x, wmat, y, gy, gs]
    cin = x.shape[3] if tin else x.shape[2]
    cin_k = max(cin, 8)
    out_specs = [
        pl.BlockSpec((1, *x.shape[1:]), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((cout, 9 * cin_k), lambda i: (0, 0)),
        pl.BlockSpec((cout,), lambda i: (0,)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((cout, 9 * cin_k), jnp.float32),
        jax.ShapeDtypeStruct((cout,), jnp.float32),
    ]
    if relu_in:
        specs.append(pl.BlockSpec((2, cin), lambda i: (0, 0)))
        args.append(ab)
        out_specs.append(pl.BlockSpec((2, cin), lambda i: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((2, cin), jnp.float32))
    return pl.pallas_call(
        functools.partial(_layer_bwd_kernel, relu_in=relu_in, tin=tin, tout=tout, pack=pack),
        grid=(n,),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)


def kernel_matrix(kernel):
    """HWIO (3, 3, cin, cout) conv kernel -> (cout, 9*cin) matrix in the
    (ky, kx, cin) contraction order `_layer_kernel` builds its operand in."""
    kh, kw, cin, cout = kernel.shape
    return jnp.transpose(kernel, (3, 0, 1, 2)).reshape(cout, kh * kw * cin)


def _pad_wmat(wmat, cin):
    """(cout, 9*cin) -> (cout, 9*8) with zero columns for the sublane-pad
    channels, preserving the (ky, kx, cin) column order."""
    cout = wmat.shape[0]
    w3 = wmat.reshape(cout, 9, cin)
    return jnp.pad(w3, ((0, 0), (0, 0), (0, 8 - cin))).reshape(cout, 72)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_layer(x, wmat, bias, ab, relu_in, tin, tout, pack):
    cin = x.shape[3] if tin else x.shape[2]
    wm = _pad_wmat(wmat, cin) if cin < 8 else wmat
    y, s1, s2 = _pallas_layer(
        x,
        wm.astype(x.dtype),
        bias.astype(x.dtype),
        ab,
        relu_in=relu_in,
        interpret=MODE == "interpret",
        tin=tin,
        tout=tout,
        pack=pack,
    )
    return y, s1, s2


def _fused_layer_fwd(x, wmat, bias, ab, relu_in, tin, tout, pack):
    y, s1, s2 = _fused_layer(x, wmat, bias, ab, relu_in, tin, tout, pack)
    return (y, s1, s2), (x, wmat, ab, y)


def _fused_layer_bwd(relu_in, tin, tout, pack, res, cts):
    x, wmat, ab, y = res
    gy, gs1, gs2 = cts
    cin = x.shape[3] if tin else x.shape[2]
    wm = _pad_wmat(wmat, cin) if cin < 8 else wmat
    gs = jnp.stack([gs1, gs2]).astype(jnp.float32)
    outs = _pallas_layer_bwd(
        x,
        wm.astype(x.dtype),
        y,
        gy.astype(x.dtype),
        gs,
        ab,
        relu_in=relu_in,
        interpret=MODE == "interpret",
        tin=tin,
        tout=tout,
        pack=pack,
    )
    if relu_in:
        dx, dw, dbias, dab = outs
    else:
        dx, dw, dbias = outs
        dab = jnp.zeros_like(ab)
    if cin < 8:  # drop the zero-pad channels' dW columns
        cout = dw.shape[0]
        dw = dw.reshape(cout, 9, 8)[:, :, :cin].reshape(cout, 9 * cin)
    return dx, dw.astype(wmat.dtype), dbias.astype(jnp.float32), dab.astype(ab.dtype)


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_conv_layer(x, wmat, bias, ab=None, *, relu_in=True, transpose_in=False,
                     transpose_out=False, pack=1):
    """One fused ResBlock layer on (N, H, C, W) activations.

    y = conv3x3(relu(a*x + b)) + bias, plus f32 per-channel
    (sum(y), sum(y^2)) for the following BatchNorm's train statistics.
    ``ab`` is a (2, C_in) f32 array of the previous BN's folded apply
    coefficients; ``relu_in=False`` skips the prologue entirely (chain
    entry).  ``transpose_in``/``transpose_out`` accept/emit NHWC at the
    chain boundaries, moving the layout change into VMEM on load/store —
    the XLA-level NHWC<->NHCW transposes cost ~0.5 ms/step each way in
    HBM (r4 profile: 4.2 ms "data formatting").  Returns (y, s1, s2).
    Differentiable via a second Pallas pass (`_layer_bwd_kernel`):
    dW/dbias/d_ab grid-accumulate in f32, the BN-backward channel
    reductions ride the same pass, and dx comes from the
    transposed-kernel conv on the stat-folded cotangent.  Callers wanting
    the model's sg_bias semantics wrap ``bias`` in
    ``jax.lax.stop_gradient`` (models/blocks.py:SGBiasConv).
    """
    if pack > 1:
        assert not (transpose_in or transpose_out), "packed chains use XLA-side pack/unpack"
    if ab is None:
        ab = jnp.zeros((2, x.shape[3] if transpose_in else x.shape[2]), jnp.float32)
    return _fused_layer(x, wmat, bias, ab, relu_in, transpose_in, transpose_out, pack)


def reference_layer(x, wmat, bias, ab=None, *, relu_in=True):
    """XLA twin on the same (N, H, C, W) layout (oracle for tests)."""
    n, h, cin, w = x.shape
    cout = wmat.shape[0]
    if relu_in:
        a = ab[0].reshape(1, 1, cin, 1)
        b = ab[1].reshape(1, 1, cin, 1)
        hx = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0).astype(x.dtype)
    else:
        hx = x
    # NHCW -> NHWC conv -> NHCW
    hn = jnp.transpose(hx, (0, 1, 3, 2))
    kernel = jnp.transpose(wmat.reshape(cout, 3, 3, cin), (1, 2, 3, 0)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        hn, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = (y + bias.astype(x.dtype)).astype(x.dtype)
    yt = jnp.transpose(y, (0, 1, 3, 2))
    yf = yt.astype(jnp.float32)
    return yt, jnp.sum(yf, axis=(0, 1, 3)), jnp.sum(yf * yf, axis=(0, 1, 3))
