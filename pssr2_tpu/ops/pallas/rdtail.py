"""Fused RDNet block tail: LayerNorm -> fc1 (1x1) -> GELU -> fc2 (1x1).

The RDNet encoder (reference: pssr/models/_rdnet.py:177-190, Block.forward
after its 7x7 depthwise conv) runs this chain once per dense block — 21
times per RDResUNet forward.  As XLA ops the 4x-wide fc1 intermediate
(``inter = in_chs * bottleneck_width_ratio``) round-trips HBM between fc1
and fc2 (and again in the backward), and the LayerNorm stats/apply are
separate reduce fusions; the profiled encoder spends ~14 ms/step on this
family against a ~5 ms MXU floor (experiments/profile_rdres).  One Pallas
pass per row-chunk keeps x, the normalized rows, and the intermediate in
VMEM: HBM traffic collapses to read x + write y (+ the weights, resident
across the grid).

The activation is consumed as a flattened (M, C) row view — the chain is
row-independent, so the caller may pass rows in ANY memory order (see
``models/rdnet.py``: the H,W,N-major view matches the conv emitter's
physical activation layout, making the reshape a bitcast).

Training: :func:`fused_rd_tail` is a ``jax.custom_vjp`` whose backward is a
second Pallas pass per chunk (forward recompute + full gradient chain;
parameter grads accumulated across the grid into revisited f32 outputs) —
the same structure as the SwinIR whole-block VJP kernel
(ops/pallas/swinblock.py), whose LN/matmul/GELU helpers and numerics
policy (f32 stats and accumulation, polynomial GELU for bf16 compute —
within the bf16 activation-rounding class) are reused directly.

Gating: TPU + bf16 compute only (Mosaic lowers DEFAULT-precision f32 dots
as one bf16 MXU pass — mxu_probe25 — so f32 models keep the exact XLA
path), and the per-chunk VMEM footprint must fit (the widest stage-6
blocks fall back to XLA, where their 8x8 resolution makes the fusion win
negligible anyway).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .swinblock import (
    _BWD_COMPILER_PARAMS,
    _dgelu_exact,
    _dgelu_fast,
    _gelu_exact,
    _gelu_fast,
    _layernorm,
    _layernorm_bwd,
    _matmul,
    _matmul_dw,
    _matmul_dx,
)

# "auto" (kernel on TPU for eligible shapes), "off", "interpret" (CPU tests)
MODE = "auto"
# Row-chunk candidates per grid step, largest dividing M that fits VMEM.
CHUNKS = (1024, 512, 256, 128)
# Per-call VMEM budget (bytes) for the backward footprint estimate.  The
# raised Mosaic ceiling (vmem_limit_bytes=100MB, as swinblock's backward
# uses) admits well past the 16 MB lint; stay conservative.
VMEM_BUDGET = 24 * 1024 * 1024
# FAST_GELU policy mirrors swinblock.FAST_GELU ("auto" = polynomial for
# bf16 — measured 5.7e-3 end-to-end rel-dev class, the same class as bf16
# rounding itself; exact erf rational for f32/interpret parity tests).
FAST_GELU = "auto"
# Row-view order the model wrapper feeds the kernel (the chain is
# row-independent, so both orders compute identical results):
#   "hwnc" — transpose(1,2,0,3) first: the (H,W,N,C) default layout equals
#            the conv emitter's physical {3,0,2,1} activation layout, so
#            the flattening reshape is a layout bitcast;
#   "nhwc" — plain reshape (forces a relayout copy of the activation).
ORDER = "hwnc"


def _is_fast(dtype):
    return FAST_GELU is True or (FAST_GELU == "auto" and dtype == jnp.bfloat16)


def _pick_chunk(m, c, inter, g, itemsize, train):
    """Largest chunk whose bwd-pass VMEM footprint fits the budget, or 0."""
    w_bytes = (c * inter + inter * g) * itemsize  # bf16 weights, resident
    acc_bytes = (c * inter + inter * g + 2 * c + inter + g) * 4 if train else 0
    for r in (*CHUNKS, m):  # m: single-step grid for small (test) shapes
        if m % r:
            continue
        # chunk tensors: x, out(, g, dx) bf16 + z1 + f32 LN/gelu temps
        rows = r * (c + g) * itemsize + r * inter * itemsize
        if train:
            rows = 2 * rows
        rows += r * max(c, inter) * 4 * 2  # transient f32 temps
        if w_bytes + acc_bytes + 2 * rows <= VMEM_BUDGET:
            return r
    return 0


def eligible(m, c, inter, g, dtype, *, train, backend=None) -> bool:
    """Kernel gating (see module docstring): TPU-or-interpret, bf16
    compute, mesh-scope kernels allowed, and a fitting chunk size."""
    from .guard import kernels_allowed

    if MODE == "off" or not kernels_allowed():
        return False
    if MODE != "interpret":
        backend = backend or jax.default_backend()
        if backend != "tpu" or dtype != jnp.bfloat16:
            return False
    return _pick_chunk(m, c, inter, g, 2, train) > 0


def _tail_kernel(x_ref, lns, lnb, w1, b1, w2, b2, out_ref, *, eps):
    x = x_ref[...]
    h = _layernorm(x, lns[...], lnb[...], eps)
    z = _matmul(h, w1[...], b1[...])
    z = _gelu_fast(z) if _is_fast(z.dtype) else _gelu_exact(z)
    out_ref[...] = _matmul(z, w2[...], b2[...])


def _tail_bwd_kernel(
    x_ref, lns, lnb, w1, b1, w2, b2, g_ref,
    dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, eps,
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    # forward recompute for this chunk
    x = x_ref[...]
    h = _layernorm(x, lns[...], lnb[...], eps)
    z1 = _matmul(h, w1[...], b1[...])
    fast = _is_fast(z1.dtype)
    zg = _gelu_fast(z1) if fast else _gelu_exact(z1)

    # gradient chain (mirrors swinblock._block_bwd_kernel's MLP+LN2 part)
    g = g_ref[...]
    dw2_ref[...] += _matmul_dw(zg, g)
    db2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0)
    dz = _matmul_dx(g, w2[...])
    dgel = _dgelu_fast(z1) if fast else _dgelu_exact(z1)
    dz1 = (dz.astype(jnp.float32) * dgel).astype(x.dtype)
    dw1_ref[...] += _matmul_dw(h, dz1)
    db1_ref[...] += jnp.sum(dz1.astype(jnp.float32), axis=0)
    dh = _matmul_dx(dz1, w1[...])
    dx, dgamma, dbeta = _layernorm_bwd(x, lns[...], eps, dh)
    dlns_ref[...] += dgamma
    dlnb_ref[...] += dbeta
    dx_ref[...] = dx


def _const_specs(c, inter, g):
    const1 = lambda i: (0,)
    const2 = lambda i: (0, 0)
    return [
        pl.BlockSpec((c,), const1),
        pl.BlockSpec((c,), const1),
        pl.BlockSpec((c, inter), const2),
        pl.BlockSpec((inter,), const1),
        pl.BlockSpec((inter, g), const2),
        pl.BlockSpec((g,), const1),
    ]


def _pallas_tail(x, params, *, eps, interpret, train):
    m, c = x.shape
    lns, lnb, w1, b1, w2, b2 = params
    inter, g = w1.shape[1], w2.shape[1]
    r = _pick_chunk(m, c, inter, g, x.dtype.itemsize, train)
    grid = (m // r,)
    return pl.pallas_call(
        functools.partial(_tail_kernel, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((r, c), lambda i: (i, 0))] + _const_specs(c, inter, g),
        out_specs=pl.BlockSpec((r, g), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, g), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _BWD_COMPILER_PARAMS,
    )(x, *params)


def _pallas_tail_bwd(x, gout, params, *, eps, interpret):
    m, c = x.shape
    lns, lnb, w1, b1, w2, b2 = params
    inter, g = w1.shape[1], w2.shape[1]
    r = _pick_chunk(m, c, inter, g, x.dtype.itemsize, True)
    grid = (m // r,)
    const1 = lambda i: (0,)
    const2 = lambda i: (0, 0)
    acc = jnp.float32
    return pl.pallas_call(
        functools.partial(_tail_bwd_kernel, eps=eps),
        grid=grid,
        in_specs=[pl.BlockSpec((r, c), lambda i: (i, 0))]
        + _const_specs(c, inter, g)
        + [pl.BlockSpec((r, g), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((r, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((c,), const1),
            pl.BlockSpec((c, inter), const2),
            pl.BlockSpec((inter,), const1),
            pl.BlockSpec((inter, g), const2),
            pl.BlockSpec((g,), const1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, c), x.dtype),
            jax.ShapeDtypeStruct((c,), acc),
            jax.ShapeDtypeStruct((c,), acc),
            jax.ShapeDtypeStruct((c, inter), acc),
            jax.ShapeDtypeStruct((inter,), acc),
            jax.ShapeDtypeStruct((inter, g), acc),
            jax.ShapeDtypeStruct((g,), acc),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _BWD_COMPILER_PARAMS,
    )(x, *params, gout)


def reference_tail(x, lns, lnb, w1, b1, w2, b2, *, eps):
    """XLA twin of the fused kernel, built from the same helper
    formulations (the VJP equality oracle and CPU fallback reference for
    tests).  Mirrors rdnet.Block's norm -> fc1 -> gelu -> fc2 with flax
    nnx semantics (params promoted to the compute dtype, f32 stats and
    dot accumulation)."""
    h = _layernorm(x, lns, lnb, eps)
    z = _matmul(h, w1, b1)
    z = _gelu_fast(z) if _is_fast(z.dtype) else _gelu_exact(z)
    return _matmul(z, w2, b2)


@functools.lru_cache(maxsize=16)
def _tail_fn(eps, interpret, fast_gelu):
    del fast_gelu  # cache-key only: kernels read the module knob at trace

    @jax.custom_vjp
    def tail(x, *params):
        cast = tuple(p.astype(x.dtype) for p in params)
        return _pallas_tail(x, cast, eps=eps, interpret=interpret, train=False)

    def fwd(x, *params):
        return tail(x, *params), (x, params)

    def bwd(res, gout):
        x, params = res
        cast = tuple(p.astype(x.dtype) for p in params)
        outs = _pallas_tail_bwd(x, gout, cast, eps=eps, interpret=interpret)
        dx, grads = outs[0], outs[1:]
        return (dx, *(gr.astype(p.dtype) for gr, p in zip(grads, params)))

    tail.defvjp(fwd, bwd)
    return tail


def fused_rd_tail(x, lns, lnb, w1, b1, w2, b2, *, eps):
    """LayerNorm -> fc1 -> GELU(approximate=False semantics; polynomial
    within the bf16 rounding class for bf16 compute) -> fc2 on flattened
    rows ``x`` (M, C); returns (M, w2.shape[1]).  Weights are promoted to
    the compute dtype inside the custom-VJP boundary, so parameter grads
    come back in full f32 (matching XLA's f32 dW convs)."""
    fn = _tail_fn(float(eps), MODE == "interpret", FAST_GELU)
    return fn(x, lns, lnb, w1, b1, w2, b2)
