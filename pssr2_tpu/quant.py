"""Post-training int8 quantization of the eval forward (serving path).

A TPU-native extra with no reference counterpart (the reference serves
the f32 torch eval forward only — reference: pssr/predict.py:39): the
v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPS; measured 212.9 TOPS vs 132.2 TF/s on the same chained matmul,
experiments/int8_probe2.json), so a weight-and-activation int8 (W8A8)
forward buys serving throughput at a quality cost that is measured, not
assumed (experiments/int8_quality.py gates it end-to-end).

Scheme (standard static PTQ, symmetric):
- weights: per-output-channel int8 scales (max-abs / 127);
- activations: per-tensor int8 scales calibrated by running the fp
  forward over user-supplied batches and recording max-abs at every
  conv input (one jitted observe step returning the amax dict);
- each conv runs int8 x int8 -> int32 on the MXU, then ONE fused
  per-channel affine folds dequantization, the conv bias, and the
  following eval-mode BatchNorm (y = conv_i32 * alpha + beta) before the
  ReLU — the glue between convs stays in the model compute dtype.

``quantize_resunet`` covers the whole ResUNet family — plain ResUNet,
the atrous ResUNetA (per-branch pre-BN folded into the glue affine, the
dilated convs run int8 on the MXU: dilation is free on the conv emitter,
experiments/results_r3.md), and PSP pooling (1x1 convs int8, pool/resize
glue); the executor is a pure function of a params pytree, so it jits,
shards, and ``jax.export``s like any other forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax import lax

from .ops.shuffle import pixel_shuffle
from .ops.smallconv import phase_major_perm, shuffle_conv_small

_DN = ("NHWC", "HWIO", "NHWC")


def _weight_scales(kernel):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel:
    (int8 kernel, f32 (C_out,) scales)."""
    k = jnp.asarray(kernel, jnp.float32)
    s = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    return jnp.round(k / s).astype(jnp.int8), s


def quantize_tensor(x, inv_scale):
    """Symmetric per-tensor int8: clip(round(x / s), -127, 127)."""
    q = jnp.round(x.astype(jnp.float32) * inv_scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def int8_conv(x8, w8, *, strides=(1, 1), dilation=(1, 1)):
    """int8 x int8 -> int32 SAME conv on the MXU (dilation lowers to the
    same emitter family as dense convs — free, results_r3.md)."""
    return lax.conv_general_dilated(
        x8, w8, strides, "SAME", rhs_dilation=dilation,
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )


def _bn_affine(norm):
    """Eval-mode BatchNorm as a per-channel affine (a, c): y = a*x + c."""
    a = lax.rsqrt(norm.var[...] + norm.epsilon) * norm.scale[...]
    return a, norm.bias[...] - norm.mean[...] * a


def _conv_entry(conv_mod, norm, amax):
    """Build one quantized conv site: int8 kernel + the fused dequant
    affine (alpha, beta) folding activation scale, weight scales, conv
    bias and the following eval BN."""
    w8, sw = _weight_scales(conv_mod.kernel[...])
    sx = jnp.maximum(jnp.asarray(amax, jnp.float32) / 127.0, 1e-12)
    bias = (
        jnp.asarray(conv_mod.bias[...], jnp.float32)
        if conv_mod.bias is not None
        else jnp.zeros((w8.shape[-1],), jnp.float32)
    )
    if norm is not None:
        a, c = _bn_affine(norm)
        alpha, beta = sx * sw * a, bias * a + c
    else:
        alpha, beta = sx * sw, bias
    return {"w8": w8, "alpha": alpha, "beta": beta, "inv_sx": 1.0 / sx}


def _qconv(entry, x, glue, dilation=(1, 1)):
    """Quantize -> int8 conv -> fused dequant affine, in ``glue`` dtype."""
    y = int8_conv(quantize_tensor(x, entry["inv_sx"]), entry["w8"], dilation=dilation)
    return (y.astype(jnp.float32) * entry["alpha"] + entry["beta"]).astype(glue)


class _Observer:
    """FP engine: runs the model's own modules, recording per-site amax."""

    def __init__(self):
        self.amax = {}

    def _obs(self, key, x):
        m = jnp.max(jnp.abs(x.astype(jnp.float32)))
        self.amax[key] = jnp.maximum(self.amax[key], m) if key in self.amax else m

    def resblock(self, site, blk, x):
        from .models.blocks import ResBlockA

        if isinstance(blk, ResBlockA):
            return self._ablock(site, blk, x)
        self._obs(f"{site}.in", x)
        h = x
        for i in range(blk.n_layers):
            h = blk.convs[i](h)
            norm = blk.norms[i]
            if norm is not None:
                h = norm(h)
            if i + 1 < blk.n_layers:
                h = nnx.relu(h)
                self._obs(f"{site}.l{i + 1}", h)
        return nnx.relu(h + blk.respass(x))

    def _ablock(self, site, blk, x):
        # mirrors blocks.ResBlockA.__call__ (BN -> ReLU -> dilated conv)
        self._obs(f"{site}.in", x)
        total = None
        for b_idx, branch in enumerate(blk.branches):
            h = x
            for l_idx, (bn, cv) in enumerate(branch):
                if bn is not None:
                    h = bn(h)
                h = nnx.relu(h)
                self._obs(f"{site}.b{b_idx}.l{l_idx}", h)
                h = cv(h)
            total = h if total is None else total + h
        return nnx.relu(total + blk.respass(x))

    def psp(self, site, mod, x):
        # mirrors blocks.PSPPooling.__call__
        h, w = x.shape[-3], x.shape[-2]
        chunks = jnp.split(x, len(mod.sizes), axis=-1)
        outs = []
        for idx, chunk in enumerate(chunks):
            size = mod.sizes[idx]
            if size > 1:
                pooled = nnx.max_pool(chunk, window_shape=(size, size), strides=(size, size))
                pooled = jax.image.resize(
                    pooled, (*pooled.shape[:-3], h, w, pooled.shape[-1]), method="bilinear"
                )
            else:
                pooled = chunk
            self._obs(f"{site}.s{idx}", pooled)
            cv, bn = mod.convs[idx]
            outs.append(nnx.relu(bn(cv(pooled))))
        x = jnp.concatenate(outs, axis=-1)
        self._obs(f"{site}.out", x)
        return nnx.relu(mod.norm_out(mod.conv_out(x)))

    def recon(self, site, rec, x):
        self._obs(f"{site}.in", x)
        return rec(x)


class _Int8Engine:
    """Quantized engine: pure function of the params pytree."""

    def __init__(self, params, glue):
        self.p = params
        self.glue = glue

    def resblock(self, site, blk, x):
        if blk.get("type") == "A":
            return self._ablock(site, blk, x)
        entries = [self.p[f"{site}.c{i}"] for i in range(blk["n_layers"])]
        split, p = self._chain_split(entries, x)
        h = x
        for i in range(split):
            # each conv entry folds its own dequant + bias + eval-BN affine
            h = _qconv(entries[i], h, self.glue)
            if i + 1 < blk["n_layers"]:
                h = nnx.relu(h)
        if split < blk["n_layers"]:
            # suffix runs as the fused int8 conv-chain kernels (the
            # prefix loop already applied its trailing ReLU; the chain
            # entry just requantizes with the post-ReLU amax scale)
            h = self._resblock_chain(entries[split:], h, p)
        r = _qconv(self.p[f"{site}.res"], x, self.glue)
        return nnx.relu(h + r)

    @staticmethod
    def _chain_split(entries, x):
        """(first chained layer index, pack) for running a suffix of the
        conv stack as fused int8 convchain-layout kernels
        (ops/pallas/q8chain); (n_layers, 0) = all-XLA.  Suffix logic like
        blocks.ResBlock._convchain_split: the entry conv (cin=1) and any
        non-3x3 / unaligned layer stay on the XLA int8 path."""
        from .ops.pallas import convchain, q8chain

        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        split = len(entries)
        for i in range(len(entries) - 1, -1, -1):
            k = entries[i]["w8"]
            if k.ndim != 4 or k.shape[:2] != (3, 3):
                break
            if not q8chain.eligible(n, h, w, k.shape[2], k.shape[3]):
                break
            split = i
        if split == len(entries):
            return split, 0
        return split, convchain.pack_factor(h, w)

    def _resblock_chain(self, entries, x, p):
        """The conv stack as int8 Pallas passes in the W-on-lanes layout:
        quantize once, stay int8 through the mid-chain requants (the f32
        affine + ReLU + requant live in VMEM), emit glue dtype at the
        tail.  Mid-chain this skips the XLA path's bf16 round-trip
        between affine and requant — strictly tighter, gated end-to-end
        by experiments/int8_quality.py."""
        from .ops.pallas import convchain, q8chain

        w_img = x.shape[2]
        xq = quantize_tensor(x, entries[0]["inv_sx"])  # NHWC int8
        ht = q8chain.pack_nhwc(xq, p) if p > 1 else jnp.transpose(xq, (0, 1, 3, 2))
        for i, e in enumerate(entries):
            last = i + 1 == len(entries)
            wmat8 = convchain.kernel_matrix(e["w8"])
            if last:
                affine = jnp.stack([e["alpha"], e["beta"]])
            else:
                inv_nxt = entries[i + 1]["inv_sx"]
                affine = jnp.stack([e["alpha"] * inv_nxt, e["beta"] * inv_nxt])
            ht = q8chain.q8_conv_layer(
                ht, wmat8, affine.astype(jnp.float32), last=last, pack=p,
                out_dtype=self.glue,
            )
        if p > 1:
            return q8chain.unpack_nhwc(ht, p, w_img)
        return jnp.transpose(ht, (0, 1, 3, 2))

    def _ablock(self, site, blk, x):
        # pre-conv BN is an input-side affine: it cannot fold through the
        # ReLU into the conv, so it runs as one glue-dtype FMA per layer
        if x.shape[-2] < blk["min_size"]:
            raise ValueError(
                f"Tensor size {x.shape} is smaller than dilation kernel size {blk['min_size']}."
            )
        total = None
        for b_idx in range(blk["n_branches"]):
            h = x
            d = blk["dilations"][b_idx]
            for l_idx in range(blk["n_layers"]):
                e = self.p[f"{site}.b{b_idx}.l{l_idx}"]
                if "bn_a" in e:
                    h = h * e["bn_a"].astype(h.dtype) + e["bn_c"].astype(h.dtype)
                h = nnx.relu(h)
                h = _qconv(e, h, self.glue, dilation=(d, d))
            total = h if total is None else total + h
        r = _qconv(self.p[f"{site}.res"], x, self.glue)
        return nnx.relu(total + r)

    def psp(self, site, meta, x):
        h, w = x.shape[-3], x.shape[-2]
        chunks = jnp.split(x, len(meta["sizes"]), axis=-1)
        outs = []
        for idx, chunk in enumerate(chunks):
            size = meta["sizes"][idx]
            if size > 1:
                pooled = nnx.max_pool(chunk, window_shape=(size, size), strides=(size, size))
                pooled = jax.image.resize(
                    pooled, (*pooled.shape[:-3], h, w, pooled.shape[-1]), method="bilinear"
                )
            else:
                pooled = chunk
            outs.append(nnx.relu(_qconv(self.p[f"{site}.s{idx}"], pooled, self.glue)))
        x = jnp.concatenate(outs, axis=-1)
        return nnx.relu(_qconv(self.p[f"{site}.out"], x, self.glue))

    def recon(self, site, rec, x):
        p = self.p[site]
        y = int8_conv(quantize_tensor(x, p["inv_sx"]), p["w8"])
        y = (y.astype(jnp.float32) * p["alpha"] + p["beta"]).astype(self.glue)
        y = nnx.relu(y)
        if rec["fused_head"]:
            return shuffle_conv_small(
                y, p["post_kernel"].astype(self.glue), p["post_bias"], scale=rec["scale"]
            )
        y = pixel_shuffle(y, rec["scale"], channels_last=True)
        out = lax.conv_general_dilated(
            y, p["post_kernel"].astype(self.glue), (1, 1), "SAME", dimension_numbers=_DN
        )
        return out + p["post_bias"].astype(self.glue)


def _assert_eval(model):
    """Whole-tree eval-mode check: every BatchNorm must use running
    averages and every Dropout (incl. DropPath's broadcast Dropout in the
    FP RDNet encoder) must be deterministic.  Generic over the module
    tree so new stochastic submodules can't slip past a hand-maintained
    norm list (advisor r3: the RDResUNet guard inspected only the
    decoder/PSP norms and caught encoder train mode transitively)."""
    import flax.nnx as nnx

    for path, mod in nnx.iter_modules(model):
        if getattr(mod, "use_running_average", True) is False or (
            isinstance(mod, nnx.Dropout) and not mod.deterministic
        ):
            name = ".".join(map(str, path)) or type(mod).__name__
            raise ValueError(
                "model must be in eval mode (model.eval()) before "
                f"quantization; {name} ({type(mod).__name__}) is in train mode."
            )


def _check_supported(model):
    from .models.blocks import ResBlockA
    from .models.resunet import ResUNet

    if not isinstance(model, ResUNet):
        raise NotImplementedError(
            f"quantize_resunet supports the ResUNet family; got {type(model).__name__}. "
            "For RDResUNet/SwinIR serve the bf16 export instead."
        )

    _assert_eval(model)


def _flow(model_like, x, eng, *, norm_affine=None, norm_mod=None, dtype):
    """The shared eval forward: identical traversal for the FP observer
    (nnx modules) and the int8 executor (params pytree).
    Mirrors models/resunet.py:166-231 (eval, no lane-fold)."""
    x = x / 128.0 - 1.0
    x = jnp.transpose(x, (0, 2, 3, 1))
    if dtype is not None:
        x = x.astype(dtype)
    if norm_mod is not None:
        x = norm_mod(x)
    elif norm_affine is not None:
        a, c = norm_affine
        x = (x * a.astype(x.dtype) + c.astype(x.dtype)).astype(x.dtype)

    encoder, decoder, recon, enc_pool, rec_pool = model_like
    skips = [x]
    for idx, blk in enumerate(encoder):
        x = eng.resblock(f"enc{idx}", blk, x)
        if idx + 1 < len(encoder):
            skips.append(x)
            x = nnx.max_pool(x, window_shape=(2, 2), strides=(2, 2))
    if enc_pool is not None:
        x = eng.psp("encp", enc_pool, x)
    for idx, blk in enumerate(decoder):
        x = pixel_shuffle(x, 2, channels_last=True)
        x = eng.resblock(f"dec{idx}", blk, jnp.concatenate([x, skips.pop()], axis=-1))
    if rec_pool is not None:
        x = eng.psp("reconp", rec_pool, x)
    x = jnp.concatenate([x, skips.pop()], axis=-1)
    x = eng.recon("recon", recon, x)
    x = jnp.transpose(x, (0, 3, 1, 2))
    return x.astype(jnp.float32) * 128.0 + 128.0


class QuantizedResUNet:
    """int8 (W8A8) eval executor with the model's NCHW [0,255] contract.

    Pure-functional core: ``apply(params, x)`` closes over structure only,
    so it jits/exports; ``__call__`` uses the stored params via one cached
    jit.  Build with :func:`quantize_resunet`.
    """

    def __init__(self, params, meta):
        self.params = params
        self._meta = meta
        self._jit = jax.jit(self.apply)

    def apply(self, params, x):
        m = self._meta
        eng = _Int8Engine(params, m["glue"])
        model_like = (m["encoder"], m["decoder"], m["recon"], m["enc_pool"], m["rec_pool"])
        return _flow(
            model_like, x, eng,
            norm_affine=(params["norm.a"], params["norm.c"]) if "norm.a" in params else None,
            dtype=m["dtype"],
        )

    def __call__(self, x):
        return self._jit(self.params, x)

    def eval(self):  # predict-loop surface parity (already eval-only)
        return self

    @property
    def scale(self):
        return self._meta["scale"]


def _build_block_params(blocks, prefix, amax, params):
    """Quantize a list of Res blocks (plain or atrous) into ``params``;
    returns the per-block meta list."""
    from .models.blocks import ResBlockA

    metas = []
    for idx, blk in enumerate(blocks):
        site = f"{prefix}{idx}"
        if isinstance(blk, ResBlockA):
            dilations = []
            for b_idx, branch in enumerate(blk.branches):
                d = branch[0][1].kernel_dilation
                dilations.append(int(d[0] if isinstance(d, (tuple, list)) else d))
                for l_idx, (bn, cv) in enumerate(branch):
                    entry = _conv_entry(cv, None, amax[f"{site}.b{b_idx}.l{l_idx}"])
                    if bn is not None:
                        entry["bn_a"], entry["bn_c"] = _bn_affine(bn)
                    params[f"{site}.b{b_idx}.l{l_idx}"] = entry
            params[f"{site}.res"] = _conv_entry(blk.respass, None, amax[f"{site}.in"])
            metas.append({
                "type": "A",
                "n_branches": len(blk.branches),
                "n_layers": len(blk.branches[0]),
                "dilations": dilations,
                "min_size": blk.min_size,
            })
            continue
        for i in range(blk.n_layers):
            a = amax[f"{site}.in"] if i == 0 else amax[f"{site}.l{i}"]
            params[f"{site}.c{i}"] = _conv_entry(blk.convs[i], blk.norms[i], a)
        params[f"{site}.res"] = _conv_entry(blk.respass, None, amax[f"{site}.in"])
        metas.append({"n_layers": blk.n_layers})
    return metas


def _build_pool_params(pool, site, amax, params):
    if pool is None:
        return
    for idx, (cv, bn) in enumerate(pool.convs):
        params[f"{site}.s{idx}"] = _conv_entry(cv, bn, amax[f"{site}.s{idx}"])
    params[f"{site}.out"] = _conv_entry(pool.conv_out, pool.norm_out, amax[f"{site}.out"])


def _build_recon_params(rec, amax, params):
    perm = phase_major_perm(rec.hidden, rec.scale) if rec.fused_head else None
    kernel = rec.pre.kernel[...]
    bias = rec.pre.bias[...]
    if perm is not None:
        kernel, bias = kernel[..., perm], bias[perm]
    w8, sw = _weight_scales(kernel)
    sx = jnp.maximum(jnp.asarray(amax["recon.in"], jnp.float32) / 127.0, 1e-12)
    params["recon"] = {
        "w8": w8,
        "alpha": sx * sw,
        "beta": jnp.asarray(bias, jnp.float32),
        "inv_sx": 1.0 / sx,
        "post_kernel": jnp.asarray(rec.conv.kernel[...], jnp.float32),
        "post_bias": jnp.asarray(rec.conv.bias[...], jnp.float32),
    }


def calibrate_from_dataset(dataset, n_batches: int = 4, batch_size: int = 8):
    """Pull LR calibration batches from a dataset for :func:`quantize_resunet`.

    Uses the train split when the dataset has one (the distribution the
    model was fit on), else the validation indices (e.g. a ``val_split=1``
    predict-mode dataset).  Works for paired and ``is_lr`` datasets.
    """
    val = set(dataset.val_idx)
    idx = [i for i in range(len(dataset)) if i not in val] or list(dataset.val_idx)
    batches = []
    for s in range(0, min(len(idx), n_batches * batch_size), batch_size):
        items = [dataset[i] for i in idx[s : s + batch_size]]
        lr = [np.asarray(it if dataset.is_lr else it[1], np.float32) for it in items]
        batches.append(np.stack(lr))
    return batches


def quantize_resunet(model, calib_batches):
    """Calibrate + quantize an eval-mode ResUNet.

    Args:
        model : eval-mode :class:`~pssr2_tpu.models.ResUNet` (any family
            config, including atrous dilations and PSP pooling).
        calib_batches : iterable of NCHW [0,255] arrays (the LR inputs the
            model will serve — e.g. a few batches from the validation
            split).  More batches tighten the activation ranges.

    Returns:
        :class:`QuantizedResUNet`.
    """
    _check_supported(model)
    batches = [jnp.asarray(np.asarray(b, np.float32)) for b in calib_batches]
    if not batches:
        raise ValueError("calib_batches must contain at least one batch.")

    graphdef, state = nnx.split(model)

    def observe(state, x):
        m = nnx.merge(graphdef, state)
        eng = _Observer()
        model_like = (
            list(m.encoder), list(m.decoder), m.reconstruction,
            m.encoder_pool, m.reconstruction_pool,
        )
        _flow(model_like, x, eng, norm_mod=m.norm, dtype=m.dtype)
        return eng.amax

    observe = jax.jit(observe)
    amax = None
    for b in batches:
        cur = observe(state, b)
        amax = cur if amax is None else {k: jnp.maximum(amax[k], v) for k, v in cur.items()}
    amax = {k: float(v) for k, v in amax.items()}

    params = {}
    meta_enc = _build_block_params(list(model.encoder), "enc", amax, params)
    meta_dec = _build_block_params(list(model.decoder), "dec", amax, params)
    for pool, site in ((model.encoder_pool, "encp"), (model.reconstruction_pool, "reconp")):
        _build_pool_params(pool, site, amax, params)
    _build_recon_params(model.reconstruction, amax, params)
    if model.norm is not None:
        a, c = _bn_affine(model.norm)
        params["norm.a"], params["norm.c"] = a, c

    rec = model.reconstruction
    meta = {
        "encoder": meta_enc,
        "decoder": meta_dec,
        "recon": {"fused_head": rec.fused_head, "scale": rec.scale},
        "enc_pool": None if model.encoder_pool is None else {"sizes": list(model.encoder_pool.sizes)},
        "rec_pool": None
        if model.reconstruction_pool is None
        else {"sizes": list(model.reconstruction_pool.sizes)},
        "dtype": model.dtype,
        "glue": model.dtype if model.dtype is not None else jnp.float32,
        "scale": model.scale,
    }
    return QuantizedResUNet(params, meta)


def _rd_decoder_flow(x, feats, eng, decoder, ratios, enc_pool, rec_pool, recon):
    """RDResUNet decoder-side traversal, shared by the FP observer and the
    int8 executor (mirrors models/rdresunet.py:147-167)."""
    skips = [x] + list(feats)
    if enc_pool is not None:
        skips[-1] = eng.psp("encp", enc_pool, skips[-1])
    h = None
    for idx, blk in enumerate(decoder):
        h = skips.pop() if idx == 0 else jnp.concatenate([h, skips.pop()], axis=-1)
        h = eng.resblock(f"dec{idx}", blk, h)
        h = pixel_shuffle(h, ratios[idx + 1], channels_last=True)
    if rec_pool is not None:
        h = eng.psp("reconp", rec_pool, h)
    h = jnp.concatenate([h, skips.pop()], axis=-1)
    return eng.recon("recon", recon, h)


class QuantizedRDResUNet:
    """Hybrid int8 RDResUNet executor (NCHW [0,255] contract).

    The RDNet encoder keeps its FP path (LayerNorm/GELU glue and
    depthwise convs don't MXU-quantize profitably; the fused rdtail
    Pallas kernels stay eligible); the decoder Res blocks, PSP pools and
    reconstruction head — the conv-heavy majority of the forward — run
    W8A8 exactly as in :class:`QuantizedResUNet`.  Pure-functional
    ``apply(params, x)``: jits, shards, and ``jax.export``s.
    """

    def __init__(self, params, meta):
        self.params = params
        self._meta = meta
        self._jit = jax.jit(self.apply)

    def apply(self, params, x):
        m = self._meta
        x = x / 128.0 - 1.0
        x = jnp.transpose(x, (0, 2, 3, 1))
        if m["dtype"] is not None:
            x = x.astype(m["dtype"])
        if m["norm_graphdef"] is not None:
            x = nnx.merge(m["norm_graphdef"], params["fp_norm"])(x)
        feats = nnx.merge(m["enc_graphdef"], params["fp_enc"])(x)
        eng = _Int8Engine(params, m["glue"])
        y = _rd_decoder_flow(
            x, feats, eng, m["decoder"], m["ratios"], m["enc_pool"], m["rec_pool"], m["recon"]
        )
        y = jnp.transpose(y, (0, 3, 1, 2))
        return y.astype(jnp.float32) * 128.0 + 128.0

    def __call__(self, x):
        return self._jit(self.params, x)

    def eval(self):
        return self

    @property
    def scale(self):
        return self._meta["scale"]


def quantize_rdresunet(model, calib_batches):
    """Calibrate + hybrid-quantize an eval-mode RDResUNet(/A): FP RDNet
    encoder, int8 decoder/PSP/reconstruction.  Same calibration contract
    as :func:`quantize_resunet`."""
    from .models.blocks import ResBlockA
    from .models.rdresunet import RDResUNet

    if not isinstance(model, RDResUNet):
        raise NotImplementedError(
            f"quantize_rdresunet supports RDResUNet(/A); got {type(model).__name__}."
        )

    _assert_eval(model)

    batches = [jnp.asarray(np.asarray(b, np.float32)) for b in calib_batches]
    if not batches:
        raise ValueError("calib_batches must contain at least one batch.")

    graphdef, state = nnx.split(model)

    def observe(state, x):
        m = nnx.merge(graphdef, state)
        eng = _Observer()
        x = x / 128.0 - 1.0
        x = jnp.transpose(x, (0, 2, 3, 1))
        if m.dtype is not None:
            x = x.astype(m.dtype)
        if m.norm is not None:
            x = m.norm(x)
        feats = m.encoder(x)
        _rd_decoder_flow(
            x, feats, eng, list(m.decoder), m.ratios,
            m.encoder_pool, m.reconstruction_pool, m.reconstruction,
        )
        return eng.amax

    observe = jax.jit(observe)
    amax = None
    for b in batches:
        cur = observe(state, b)
        amax = cur if amax is None else {k: jnp.maximum(amax[k], v) for k, v in cur.items()}
    amax = {k: float(v) for k, v in amax.items()}

    params = {}
    meta_dec = _build_block_params(list(model.decoder), "dec", amax, params)
    for pool, site in ((model.encoder_pool, "encp"), (model.reconstruction_pool, "reconp")):
        _build_pool_params(pool, site, amax, params)
    _build_recon_params(model.reconstruction, amax, params)

    enc_graphdef, enc_state = nnx.split(model.encoder)
    params["fp_enc"] = enc_state
    norm_graphdef = None
    if model.norm is not None:
        norm_graphdef, norm_state = nnx.split(model.norm)
        params["fp_norm"] = norm_state

    rec = model.reconstruction
    meta = {
        "decoder": meta_dec,
        "ratios": list(model.ratios),
        "recon": {"fused_head": rec.fused_head, "scale": rec.scale},
        "enc_pool": None if model.encoder_pool is None else {"sizes": list(model.encoder_pool.sizes)},
        "rec_pool": None
        if model.reconstruction_pool is None
        else {"sizes": list(model.reconstruction_pool.sizes)},
        "enc_graphdef": enc_graphdef,
        "norm_graphdef": norm_graphdef,
        "dtype": model.dtype,
        "glue": model.dtype if model.dtype is not None else jnp.float32,
        "scale": model.scale,
    }
    return QuantizedRDResUNet(params, meta)
