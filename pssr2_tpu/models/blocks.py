"""Shared model blocks (reference: pssr/models/_blocks.py), as NNX modules.

All blocks run NHWC internally (TPU conv layout); the [0,255] <-> [-1,1]
scaling contract is handled by the top-level models.  Initializers match
torch Conv2d defaults (kaiming-uniform a=sqrt(5), uniform bias) so training
dynamics are comparable to the reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..ops.shuffle import pixel_shuffle

# torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)*sqrt(3))
# i.e. variance_scaling(1/3, fan_in, uniform)
torch_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def resolve_dtype(dtype):
    """Accept jnp dtypes or the strings 'bfloat16'/'float32' (CLI surface)."""
    if isinstance(dtype, str):
        return {"bfloat16": jnp.bfloat16, "float32": None, "f32": None, "bf16": jnp.bfloat16}[dtype]
    return dtype


class SGBiasConv(nnx.Conv):
    """nnx.Conv that can add its bias under ``stop_gradient``.

    A conv whose output feeds a TRAIN-mode BatchNorm has an exactly-zero
    bias gradient (the BN backward annihilates constant per-channel
    shifts: sum_n dx_n = gmu = 0 with stop-gradient running stats — see
    ops/batchnorm.py).  Autodiff still spends a full-tensor channel
    reduction per conv computing that zero as fp noise (~2.6 ms/step on
    the canonical config, experiments/mxu_probe17); ``sg_bias=True`` cuts
    the path.  Callers pass it per call so eval-mode BN (where the bias
    gradient is NOT zero) keeps the standard path.  Torch-twin note: torch
    autograd computes the same mathematically-zero gradient as ~1e-7
    noise, which Adam then random-walks; zeroing it exactly is the only
    semantic difference.
    """

    def folded_call(self, x, sg_bias: bool = False):
        """Run this conv on a lane-folded input (B/2, H, W, 2*C_in) with a
        block-diagonal kernel — identical math at full lane occupancy (the
        zero cross-blocks contribute exact zeros; see models/resunet.py
        lane-fold notes).  Gradients flow through the block construction,
        so dW is the sum over both sample groups, exactly as unfolded."""
        from jax import lax

        k = self.kernel[...]
        kh, kw, cin, cout = k.shape
        kbd = jnp.zeros((kh, kw, 2 * cin, 2 * cout), k.dtype)
        kbd = kbd.at[:, :, :cin, :cout].set(k).at[:, :, cin:, cout:].set(k)
        dt = x.dtype if self.dtype is None else self.dtype
        dil = self.kernel_dilation
        dil = (dil, dil) if isinstance(dil, int) else tuple(dil)
        strides = self.strides
        strides = (strides, strides) if isinstance(strides, int) else tuple(strides)
        y = lax.conv_general_dilated(
            x.astype(dt),
            kbd.astype(dt),
            window_strides=strides,
            padding=self.padding,
            rhs_dilation=dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
            precision=self.precision,
        )
        if self.bias is not None:
            bias = jnp.tile(self.bias[...], 2).astype(dt)
            y = y + (lax.stop_gradient(bias) if sg_bias else bias)
        return y

    def __call__(self, x, sg_bias: bool = False):
        if not sg_bias or self.bias is None:
            return super().__call__(x)
        from jax import lax

        dt = x.dtype if self.dtype is None else self.dtype
        dil = self.kernel_dilation
        dil = (dil, dil) if isinstance(dil, int) else tuple(dil)
        strides = self.strides
        strides = (strides, strides) if isinstance(strides, int) else tuple(strides)
        y = lax.conv_general_dilated(
            x.astype(dt),
            self.kernel[...].astype(dt),
            window_strides=strides,
            padding=self.padding,
            rhs_dilation=dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
            precision=self.precision,
        )
        return y + lax.stop_gradient(self.bias[...].astype(dt))


def conv(in_features, out_features, kernel_size, *, rngs, dilation=1, padding="SAME", dtype=None):
    """3x3/1x1 conv with torch-default init (NHWC)."""
    ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    fan_in = in_features * ks[0] * ks[1]
    return SGBiasConv(
        in_features,
        out_features,
        kernel_size=ks,
        kernel_dilation=dilation,
        padding=padding,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(fan_in),
        dtype=dtype,
        rngs=rngs,
    )


def batch_norm(features, *, rngs, dtype=None, eps=1e-5):
    # torch BatchNorm2d(momentum=0.1) == nnx momentum 0.9.  FastBatchNorm
    # is numerically equivalent to nnx.BatchNorm (tests/test_models.py)
    # with an analytic VJP that un-fragments the train-step backward
    # (ops/batchnorm.py).
    from ..ops.batchnorm import FastBatchNorm

    return FastBatchNorm(features, momentum=0.9, epsilon=eps, dtype=dtype, rngs=rngs)


class Reconstruction(nnx.Module):
    """conv -> relu -> pixel_shuffle(scale) -> conv upscale head
    (reference: pssr/models/_blocks.py:6-18).

    TPU execution differs from the reference's op order: the final conv
    into a small channel count runs at 0.4% MXU when expressed naively
    (C_out=1 pads the MXU lane dim 128x) and the shuffled 512^2 tensor is
    pure HBM traffic.  When ``scale > 1`` and ``out_channels`` is small the
    head instead permutes the pre-conv weights to phase-major order and
    evaluates the mathematically identical fused form in
    :func:`pssr2_tpu.ops.smallconv.shuffle_conv_small` (2.9 ms vs 7.3 ms
    measured at the canonical config).  Weight STORAGE stays in the
    reference's c-major order, so checkpoints and torch-twin parity are
    unaffected.
    """

    def __init__(self, in_channels, out_channels, hidden, scale=4, *, rngs, dtype=None):
        self.pre = conv(hidden + in_channels, scale**2 * hidden, 3, rngs=rngs, dtype=dtype)
        self.conv = conv(hidden, out_channels, 3, rngs=rngs, dtype=dtype)
        self.scale = scale
        self.hidden = hidden
        self.dtype = dtype
        # fused head wins while C_out stays far from the 128-lane width
        self.fused_head = scale > 1 and out_channels <= 8

    def __call__(self, x):
        if not self.fused_head:
            x = nnx.relu(self.pre(x))
            return self.conv(pixel_shuffle(x, self.scale, channels_last=True))

        from ..ops.smallconv import fused_upsample_tail

        dt = x.dtype if self.dtype is None else self.dtype
        return fused_upsample_tail(x.astype(dt), self.pre, self.conv, self.scale, activation=nnx.relu)


class ResBlock(nnx.Module):
    """Conv stack with BatchNorm + residual 1x1 pass
    (reference: pssr/models/_blocks.py:20-41)."""

    def __init__(self, in_channels, out_channels, depth, norm=True, *, rngs, dtype=None):
        self.convs = nnx.List([])
        self.norms = nnx.List([])
        n_layers = max(depth, 0) + 1
        for layer_idx in range(n_layers):
            self.convs.append(
                conv(in_channels if layer_idx == 0 else out_channels, out_channels, 3, rngs=rngs, dtype=dtype)
            )
            self.norms.append(batch_norm(out_channels, rngs=rngs, dtype=dtype) if norm else None)
        self.respass = conv(in_channels, out_channels, 1, rngs=rngs, dtype=dtype)
        self.depth = depth
        self.n_layers = n_layers

    def __call__(self, x):
        split = self._convchain_split(x)
        if split is not None:
            return self._convchain_call(x, *split)
        h = x
        for layer_idx in range(self.n_layers):
            norm = self.norms[layer_idx]
            # bias grad through a train-mode BN is exactly zero; skip it
            sg = norm is not None and not norm.use_running_average
            h = self.convs[layer_idx](h, sg_bias=sg)
            if norm is not None:
                h = norm(h)
            if layer_idx + 1 < self.n_layers:
                h = nnx.relu(h)
        return nnx.relu(h + self.respass(x))

    def _convchain_split(self, x):
        """(first fused layer index, impl) for running a suffix of the
        conv stack as fused conv+BN-stat Pallas passes, or None.  Two
        complementary kernels: ``"chain"`` (ops/pallas/convchain,
        W-on-lanes layout for the C<=64 @W%128==0 stages) and ``"nhwc"``
        (ops/pallas/convnhwc, tap-dots in the native layout for the deep
        lane-full stages).  Layers before the split run the standard XLA
        path; the chain impl needs a suffix of >=2 layers for its
        NHWC<->NHCW boundary transposes to amortize."""
        from ..ops.pallas import convchain, convnhwc

        if x.ndim != 4:
            return None
        n, hh, ww, _ = x.shape
        train = any(
            norm is not None and not norm.use_running_average for norm in self.norms
        )
        for impl, mod_eligible, min_suffix in (
            ("chain", convchain.eligible, 2),
            ("nhwc", convnhwc.eligible, 1),
        ):
            k = None
            for idx in range(self.n_layers - 1, -1, -1):
                kern = self.convs[idx].kernel
                if kern.shape[:2] != (3, 3):
                    break
                cin, cout = kern.shape[2], kern.shape[3]
                if not mod_eligible(n, hh, ww, cin, cout, x.dtype, train=train):
                    break
                k = idx
            if k is not None and self.n_layers - k >= min_suffix:
                return k, impl
        return None

    def _convchain_call(self, x, k, impl):
        """conv/BN/ReLU chain with layers [k, n) as fused Pallas passes
        (impl "chain": (N,H,C,W) layout; impl "nhwc": native layout):
        each pass emits the raw conv output + the f32 (sum, sum^2)
        epilogue; the BN apply + ReLU rides as the NEXT pass's prologue
        via FastBatchNorm.apply_coeffs, so normalized tensors are never
        materialized in HBM.  Semantics identical to __call__
        (reference: pssr/models/_blocks.py:20-41)."""
        from jax import lax

        from ..ops.batchnorm import _reduce_pair, STATS_FWD
        from ..ops.pallas import convchain, convnhwc

        n, hh, ww, _ = x.shape
        count = n * hh * ww
        h = x
        ab = None
        for idx in range(k):
            norm = self.norms[idx]
            sg = norm is not None and not norm.use_running_average
            h = self.convs[idx](h, sg_bias=sg)
            if idx < k - 1:
                if norm is not None:
                    h = norm(h)
                h = nnx.relu(h)
            elif norm is not None:
                # stats here; the apply+ReLU folds into the first fused pass
                if norm.use_running_average:
                    ab = norm.apply_coeffs(None, None, count)
                else:
                    s1, s2 = _reduce_pair(STATS_FWD, h, h)
                    ab = norm.apply_coeffs(s1, s2, count)
            else:
                h = nnx.relu(h)  # norm-free prefix layer: plain ReLU

        ht = h
        p = convchain.pack_factor(hh, ww) if impl == "chain" else 1
        vt = impl != "chain" or (convchain.VMEM_TRANSPOSE and p == 1)
        if impl == "chain":
            if p > 1:
                # W<128 stage: pack p consecutive image rows side by side
                # on the lanes, NHWC -> (N, H/p, C, p*W) (convchain.PACK)
                cc = h.shape[3]
                ht = (
                    h.reshape(n, hh // p, p, ww, cc)
                    .transpose(0, 1, 4, 2, 3)
                    .reshape(n, hh // p, cc, p * ww)
                )
            elif not vt:
                ht = jnp.transpose(h, (0, 1, 3, 2))  # NHWC -> NHCW in HBM
            layer_fn, to_mat = convchain.fused_conv_layer, convchain.kernel_matrix
        else:
            layer_fn, to_mat = convnhwc.fused_conv_layer_nhwc, convnhwc.kernel_taps
        last = self.n_layers - 1
        for idx in range(k, self.n_layers):
            cv, norm = self.convs[idx], self.norms[idx]
            wmat = to_mat(cv.kernel[...])
            bias = cv.bias[...]
            if norm is not None and not norm.use_running_average:
                bias = lax.stop_gradient(bias)  # SGBiasConv semantics
            ab_arg = None if ab is None else jnp.stack(ab)
            kwargs = {}
            if impl == "chain":
                # NHWC at the chain boundaries, transposed in VMEM inside
                # the first/last pass (an HBM transpose costs ~0.5 ms/way)
                kwargs = {
                    "transpose_in": vt and idx == k,
                    "transpose_out": vt and idx == last,
                    "pack": p,
                }
            ht, s1, s2 = layer_fn(ht, wmat, bias, ab_arg, relu_in=ab_arg is not None, **kwargs)
            if norm is not None:
                ab = norm.apply_coeffs(s1, s2, count)
            else:
                nhwc_out = impl != "chain" or (vt and idx == last)
                cout = ht.shape[3] if nhwc_out else ht.shape[2]
                ab = (jnp.ones((cout,), jnp.float32), jnp.zeros((cout,), jnp.float32))

        # last layer's BN apply (no ReLU), residual pass (chain output is
        # NHCW/packed when the VMEM out-transpose is disabled)
        a, b = ab
        cdim = 2 if impl == "chain" and not vt else 3
        shape = [1, 1, 1, 1]
        shape[cdim] = -1
        hf = ht.astype(jnp.float32) * a.reshape(shape) + b.reshape(shape)
        h = hf.astype(ht.dtype)
        if impl == "chain" and p > 1:
            cout = h.shape[2]
            h = (
                h.reshape(n, hh // p, cout, p, ww)
                .transpose(0, 1, 3, 4, 2)
                .reshape(n, hh, ww, cout)
            )
        elif impl == "chain" and not vt:
            h = jnp.transpose(h, (0, 1, 3, 2))
        return nnx.relu(h + self.respass(x))

    def folded_call(self, x):
        """Lane-folded execution: x is (B/2, H, W, 2*C_in); identical math
        via block-diagonal convs + fold-aware BN statistics."""
        h = x
        for layer_idx in range(self.n_layers):
            norm = self.norms[layer_idx]
            sg = norm is not None and not norm.use_running_average
            h = self.convs[layer_idx].folded_call(h, sg_bias=sg)
            if norm is not None:
                h = norm(h, folded=True)
            if layer_idx + 1 < self.n_layers:
                h = nnx.relu(h)
        return nnx.relu(h + self.respass.folded_call(x))


class ResBlockA(nnx.Module):
    """Atrous residual block: parallel dilated branches summed
    (reference: pssr/models/_blocks.py:43-68)."""

    def __init__(self, in_channels, out_channels, dilations, depth, norm=True, *, rngs, dtype=None):
        self.branches = nnx.List([])
        n_layers = max(depth, 0) + 1
        for dilation in dilations:
            layers = nnx.List([])
            for layer_idx in range(n_layers):
                in_ch = in_channels if layer_idx == 0 else out_channels
                layers.append(
                    nnx.List([
                        batch_norm(in_ch, rngs=rngs, dtype=dtype) if norm else None,
                        conv(in_ch, out_channels, 3, rngs=rngs, dilation=dilation, padding="SAME", dtype=dtype),
                    ])
                )
            self.branches.append(layers)
        self.respass = conv(in_channels, out_channels, 1, rngs=rngs, dtype=dtype)
        self.min_size = max(dilations) * 2 + 1
        self.depth = depth

    def __call__(self, x):
        if x.shape[-2] < self.min_size:
            raise ValueError(
                f"Tensor size {x.shape} is smaller than dilation kernel size {self.min_size}."
            )
        total = None
        for branch in self.branches:
            h = x
            for bn, cv in branch:
                if bn is not None:
                    h = bn(h)
                h = nnx.relu(h)
                h = cv(h)
            total = h if total is None else total + h
        return nnx.relu(total + self.respass(x))


class PSPPooling(nnx.Module):
    """Pyramid scene parsing pooling (reference: pssr/models/_blocks.py:70-92)."""

    def __init__(self, channels, sizes, *, rngs, dtype=None):
        small = channels // len(sizes)
        self.convs = nnx.List([
            nnx.List([conv(small, small, 1, rngs=rngs, dtype=dtype), batch_norm(small, rngs=rngs, dtype=dtype)])
            for _ in sizes
        ])
        self.conv_out = conv(channels, channels, 1, rngs=rngs, dtype=dtype)
        self.norm_out = batch_norm(channels, rngs=rngs, dtype=dtype)
        self.sizes = sizes
        self.small = small

    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        chunks = jnp.split(x, len(self.sizes), axis=-1)
        outs = []
        for idx, chunk in enumerate(chunks):
            size = self.sizes[idx]
            if size > 1:
                pooled = nnx.max_pool(chunk, window_shape=(size, size), strides=(size, size))
                # bilinear upsample back (torch F.interpolate align_corners=False)
                pooled = jax.image.resize(pooled, (*pooled.shape[:-3], h, w, pooled.shape[-1]), method="bilinear")
            else:
                pooled = chunk
            cv, bn = self.convs[idx]
            outs.append(nnx.relu(bn(cv(pooled, sg_bias=not bn.use_running_average))))
        x = jnp.concatenate(outs, axis=-1)
        return nnx.relu(
            self.norm_out(self.conv_out(x, sg_bias=not self.norm_out.use_running_average))
        )


def get_resblock(in_channels, out_channels, dilations, depth, norm=True, *, rngs, dtype=None):
    """(reference: pssr/models/_blocks.py:114-117)"""
    if dilations:
        return ResBlockA(in_channels, out_channels, dilations, depth, norm, rngs=rngs, dtype=dtype)
    return ResBlock(in_channels, out_channels, depth, norm, rngs=rngs, dtype=dtype)


def force_list(item):
    """(reference: pssr/util.py:220-226)"""
    if not isinstance(item, list):
        try:
            return list(item)
        except TypeError:
            return [item]
    return item
