"""Fused window attention (Pallas TPU): softmax(q k^T * scale + bias
[+ shift-mask]) v per window, computed in VMEM.

Why: at batched-inference shapes (SwinIR x4, batch 16, 128^2 input ->
4096 windows x 6 heads x 64 tokens) the XLA lowering materializes the
(W, h, n, n) attention maps in HBM (~201 MB per tensor) and relayouts the
packed qkv per block (~1 ms copies each); the profiler capture
(experiments/profile_swinir) attributes 57 ms/step to copies and 8.5 ms
to softmax reductions out of a 117 ms step.  The per-window dots are
format-limited on the MXU either way (K = head_dim), so the kernel's win
is keeping everything between the qkv projection and the output
projection in VMEM.

The kernel processes G windows per grid step; per (window, head) it runs
two small MXU dots and an f32 VPU softmax, writing only the (W, n, C)
output to HBM.  Gradients: the public wrapper carries a custom VJP whose
backward recomputes through the reference einsum formulation (XLA), so
training through the fused path stays exact-to-autodiff of the reference
math (reference: pssr/models/swinir.py:516-597).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# "auto" (TPU + supported shapes + batch gate), "off" (XLA einsum path).
MODE = "auto"
# Minimum image batch for the Pallas window-attention paths: at batch 1
# the XLA einsum path runs the whole model in ~8.5 ms while the kernel
# paths take 36-42 ms (per-block fixed costs; mxu_probe32/33) — the
# kernels only win once the grid is deep enough.
MIN_BATCH = 8


def _pick_chunk(n_windows: int, n_mask_windows) -> int:
    # G=16 measured best at bench shapes (experiments/mxu_probe23: 3.79 ms
    # vs 4.36 at G=8, 3.87 at G=32, 5.10 XLA einsum, 12.78 per-window loop)
    for g in (16, 8, 4, 2, 1):
        if n_windows % g == 0 and (n_mask_windows is None or n_mask_windows % g == 0):
            return g
    return 1


def _attn_kernel(qkv_ref, bias_ref, out_ref, *, heads, d, scale):
    # batched dots over the whole G-window chunk per head: one
    # (G,n,d)x(G,n,d)->(G,n,n) dot_general + one block softmax instead of
    # G small dots — the per-window-loop form was op-issue-bound and 2.5x
    # slower (mxu_probe23)
    qkv = qkv_ref[...]
    c = heads * d
    for h in range(heads):
        q = qkv[:, :, h * d : (h + 1) * d]
        k = qkv[:, :, c + h * d : c + (h + 1) * d]
        v = qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_ref[h][None]
        p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        out_ref[:, :, h * d : (h + 1) * d] = o.astype(out_ref.dtype)


def _attn_kernel_masked(qkv_ref, bias_ref, mask_ref, out_ref, *, heads, d, scale):
    qkv = qkv_ref[...]
    c = heads * d
    mask_g = mask_ref[...]
    for h in range(heads):
        q = qkv[:, :, h * d : (h + 1) * d]
        k = qkv[:, :, c + h * d : c + (h + 1) * d]
        v = qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_ref[h][None] + mask_g
        p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        out_ref[:, :, h * d : (h + 1) * d] = o.astype(out_ref.dtype)


def _pallas_window_attention(qkv, bias, mask, scale, heads, interpret=False):
    """qkv (W, n, 3C), bias (heads, n, n), mask (nW, n, n) or None ->
    (W, n, C).  W must be a multiple of the chunk size; when masked, nW
    must divide the window count per image AND the chunk."""
    w, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    nw = None if mask is None else mask.shape[0]
    g = _pick_chunk(w, nw)
    grid = (w // g,)

    in_specs = [
        pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0)),
        pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0)),
    ]
    operands = [qkv, bias]
    if mask is None:
        kernel = functools.partial(_attn_kernel, heads=heads, d=d, scale=scale)
    else:
        kernel = functools.partial(_attn_kernel_masked, heads=heads, d=d, scale=scale)
        blocks_per_image = nw // g
        in_specs.append(pl.BlockSpec((g, n, n), lambda i: (i % blocks_per_image, 0, 0)))
        operands.append(mask.astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((w, n, c), qkv.dtype),
        interpret=interpret,
    )(*operands)


def _attn_kernel_2d(qkv_ref, bias_ref, out_ref, *, heads, d, scale, ws, k):
    # block (1, ws, ws*k, 3C): k horizontally-adjacent windows read straight
    # from the IMAGE layout — no window_partition/reverse and no operand
    # relayout copy (those cost ~12 ms/step at batch-16 SwinIR inference,
    # profile_swinir2).  In-VMEM shuffle to (k, n, 3C) and back.
    c = heads * d
    qkv = qkv_ref[0]  # (ws, ws*k, 3C)
    qkv = qkv.reshape(ws, k, ws, 3 * c).transpose(1, 0, 2, 3).reshape(k, ws * ws, 3 * c)
    outs = []  # per-head outputs; Mosaic has no value-scatter, concat instead
    for h in range(heads):
        q = qkv[:, :, h * d : (h + 1) * d]
        kk = qkv[:, :, c + h * d : c + (h + 1) * d]
        v = qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
        s = jax.lax.dot_general(
            q, kk, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_ref[h][None]
        p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        outs.append(o.astype(out_ref.dtype))
    out = jnp.concatenate(outs, axis=-1)
    out_ref[0] = out.reshape(k, ws, ws, c).transpose(1, 0, 2, 3).reshape(ws, ws * k, c)


def _attn_kernel_2d_masked(qkv_ref, bias_ref, mask_ref, out_ref, *, heads, d, scale, ws, k):
    c = heads * d
    qkv = qkv_ref[0]
    qkv = qkv.reshape(ws, k, ws, 3 * c).transpose(1, 0, 2, 3).reshape(k, ws * ws, 3 * c)
    mask_g = mask_ref[0]  # (k, n, n)
    outs = []
    for h in range(heads):
        q = qkv[:, :, h * d : (h + 1) * d]
        kk = qkv[:, :, c + h * d : c + (h + 1) * d]
        v = qkv[:, :, 2 * c + h * d : 2 * c + (h + 1) * d]
        s = jax.lax.dot_general(
            q, kk, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_ref[h][None] + mask_g
        p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
        o = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        outs.append(o.astype(out_ref.dtype))
    out = jnp.concatenate(outs, axis=-1)
    out_ref[0] = out.reshape(k, ws, ws, c).transpose(1, 0, 2, 3).reshape(ws, ws * k, c)


def _pick_chunk_2d(n_w_windows: int) -> int:
    for k in (16, 8, 4, 2, 1):
        if n_w_windows % k == 0:
            return k
    return 1


def _pallas_window_attention_2d(qkv_img, bias, mask, scale, heads, ws, interpret=False):
    """qkv in IMAGE layout (B, H, W, 3C) -> attention output (B, H, W, C),
    windows read as ws x ws tiles in place."""
    b, h_img, w_img, c3 = qkv_img.shape
    c = c3 // 3
    d = c // heads
    n = ws * ws
    nww = w_img // ws
    k = _pick_chunk_2d(nww)
    grid = (b, h_img // ws, nww // k)

    in_specs = [
        pl.BlockSpec((1, ws, ws * k, c3), lambda bi, i, j: (bi, i, j, 0)),
        pl.BlockSpec((heads, n, n), lambda bi, i, j: (0, 0, 0)),
    ]
    operands = [qkv_img, bias]
    if mask is None:
        kernel = functools.partial(_attn_kernel_2d, heads=heads, d=d, scale=scale, ws=ws, k=k)
    else:
        kernel = functools.partial(
            _attn_kernel_2d_masked, heads=heads, d=d, scale=scale, ws=ws, k=k
        )
        # mask is (nW, n, n) row-major over (H/ws, W/ws); block = the k
        # masks of this chunk's window row segment
        mask3 = mask.reshape(h_img // ws, nww, n, n)
        in_specs.append(pl.BlockSpec((1, k, n, n), lambda bi, i, j: (i, j, 0, 0)))
        operands.append(mask3.astype(jnp.float32) if hasattr(mask3, "astype") else mask3)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, ws * k, c), lambda bi, i, j: (bi, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c), qkv_img.dtype),
        interpret=interpret,
    )(*operands)


def reference_window_attention(qkv, bias, mask, scale, heads):
    """The XLA einsum formulation (identical math; used as the fused
    path's VJP recompute target and as the general fallback)."""
    w, n, c3 = qkv.shape
    c = c3 // 3
    qkv = qkv.reshape(w, n, 3, heads, c // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (w, n, h, d)
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(w // nw, nw, heads, n, n) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(w, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(w, n, c)


def reference_window_attention_2d(qkv_img, bias, mask, scale, heads, ws):
    """Image-layout reference: partition -> reference attention -> reverse
    (differentiable; the 2-D fused path's VJP recompute target)."""
    b, h_img, w_img, c3 = qkv_img.shape
    c = c3 // 3
    x = qkv_img.reshape(b, h_img // ws, ws, w_img // ws, ws, c3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c3)
    out = reference_window_attention(x, bias, mask, scale, heads)
    out = out.reshape(b, h_img // ws, w_img // ws, ws, ws, c)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h_img, w_img, c)


@functools.lru_cache(maxsize=64)
def _fused_fn_2d(heads, scale, ws, mask_spec, interpret):
    if mask_spec is None:
        mask = None
    else:
        from ...models.swinir import _shift_attn_mask

        mask = _shift_attn_mask(*mask_spec)  # numpy constant (see _fused_fn)

    @jax.custom_vjp
    def attn(qkv_img, bias):
        return _pallas_window_attention_2d(
            qkv_img, bias, mask, scale, heads, ws, interpret=interpret
        )

    def fwd(qkv_img, bias):
        return attn(qkv_img, bias), (qkv_img, bias)

    def bwd(res, g):
        qkv_img, bias = res
        _, vjp = jax.vjp(
            lambda a, b: reference_window_attention_2d(a, b, mask, scale, heads, ws),
            qkv_img,
            bias,
        )
        return vjp(g)

    attn.defvjp(fwd, bwd)
    return attn


def fused_window_attention_2d(qkv_img, bias, mask_spec, scale, heads, ws, interpret=False):
    """Image-layout fused path: qkv (B, H, W, 3C) -> (B, H, W, C); windows
    are read as ws x ws tiles in place (no window_partition/reverse)."""
    return _fused_fn_2d(heads, float(scale), ws, mask_spec, interpret)(qkv_img, bias)


def eligible_2d(b, h_img, w_img, c, heads, ws, backend=None) -> bool:
    from .guard import kernels_allowed

    if not kernels_allowed():
        return False
    if MODE == "off":
        return False
    backend = backend or jax.default_backend()
    if backend != "tpu":
        return False
    if h_img % ws or w_img % ws or c % heads:
        return False
    if b * (h_img // ws) * (w_img // ws) < MIN_BATCH * 256:
        return False  # batch gate (see MIN_BATCH; 256 windows per 128px tile)
    n = ws * ws
    return n % 8 == 0


@functools.lru_cache(maxsize=64)
def _fused_fn(heads, scale, mask_spec, interpret):
    """custom_vjp wrapper per static config.  ``mask_spec`` is the
    hashable (h, w, window, shift) key for _shift_attn_mask, or None."""
    if mask_spec is None:
        mask = None
    else:
        from ...models.swinir import _shift_attn_mask

        # keep as a NUMPY constant: a jnp conversion here would run inside
        # whatever trace first hits this cache entry and leak its tracer
        # into later traces (the factory is lru_cached)
        mask = _shift_attn_mask(*mask_spec)

    @jax.custom_vjp
    def attn(qkv, bias):
        return _pallas_window_attention(qkv, bias, mask, scale, heads, interpret=interpret)

    def fwd(qkv, bias):
        return attn(qkv, bias), (qkv, bias)

    def bwd(res, g):
        qkv, bias = res
        _, vjp = jax.vjp(
            lambda a, b: reference_window_attention(a, b, mask, scale, heads), qkv, bias
        )
        return vjp(g)

    attn.defvjp(fwd, bwd)
    return attn


def fused_window_attention(qkv, bias, mask_spec, scale, heads, interpret=False):
    """Public fused path: qkv (W, n, 3C), bias (heads, n, n) differentiable,
    ``mask_spec`` = None or the (h, w, window_size, shift_size) key of the
    trace-time shift mask."""
    return _fused_fn(heads, float(scale), mask_spec, interpret)(qkv, bias)


def eligible(w, n, c, heads, mask_windows, backend=None) -> bool:
    """Fused-path gating: TPU (or interpret), aligned shapes, lane-friendly
    token count, chunk divisibility, batch gate (total windows)."""
    if MODE == "off":
        return False
    backend = backend or jax.default_backend()
    if backend != "tpu":
        return False
    if w < MIN_BATCH * 256:
        return False  # batch gate (see MIN_BATCH; 256 windows per 128px tile)
    if n % 8 != 0 or c % heads != 0:
        return False
    g = _pick_chunk(w, mask_windows)
    if mask_windows is not None and (mask_windows % g or w % mask_windows):
        return False
    return w % g == 0
