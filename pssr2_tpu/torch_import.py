"""Import reference PSSR2 ``.pth`` checkpoints into pssr2_tpu models.

Reference users hold torch ``state_dict`` checkpoints
(``{Model}_{lr}-{hr}_{loss}.pth``, reference: pssr/train.py:151-153,
pssr/__main__.py:99-102).  :func:`load_torch_weights` maps those key names
onto the NNX state of the corresponding pssr2_tpu model:

- ``Conv2d.weight`` (O, I, kh, kw) -> ``kernel`` (kh, kw, I, O)
- ``BatchNorm2d`` ``weight/bias/running_mean/running_var`` ->
  ``scale/bias/mean/var`` (``num_batches_tracked`` ignored)
- ``nn.Sequential`` index layouts of the reference blocks
  (pssr/models/_blocks.py: ResBlock ``conv.{3i}``/``conv.{3i+1}``,
  ResBlockA ``dilations.{d}.{3i}``/``{3i+2}``, PSP ``convs.{i}.0/.1``)
  -> the explicit ``convs``/``norms``/``branches`` lists here.

Supported: ResUNet / ResUNetA (incl. PSP pooling variants).  Other
families raise with the unmapped keys listed.  Loading uses
``torch.load(..., weights_only=True)``; torch is an optional dependency
(CPU build is enough).
"""

import numpy as np
from flax import nnx


def _t(name, transform, value):
    value = np.asarray(value)
    if transform == "conv":  # (O, I, kh, kw) -> (kh, kw, I, O)
        return np.transpose(value, (2, 3, 1, 0))
    if transform == "linear":  # (O, I) -> (I, O)
        return np.transpose(value, (1, 0))
    return value


def _conv_entries(tkey, path):
    return {
        f"{tkey}.weight": (path + ("kernel",), "conv"),
        f"{tkey}.bias": (path + ("bias",), "vec"),
    }


def _bn_entries(tkey, path):
    return {
        f"{tkey}.weight": (path + ("scale",), "vec"),
        f"{tkey}.bias": (path + ("bias",), "vec"),
        f"{tkey}.running_mean": (path + ("mean",), "vec"),
        f"{tkey}.running_var": (path + ("var",), "vec"),
    }


def _resblock_entries(tkey, block, path):
    from .models.blocks import ResBlock, ResBlockA

    out = {}
    if isinstance(block, ResBlock):
        # reference Sequential: [Conv, (BN), (ReLU)] per layer
        has_norm = block.norms[0] is not None
        for i in range(block.n_layers):
            base = (3 if has_norm else 2) * i
            out.update(_conv_entries(f"{tkey}.conv.{base}", path + ("convs", i)))
            if has_norm:
                out.update(_bn_entries(f"{tkey}.conv.{base + 1}", path + ("norms", i)))
        out.update(_conv_entries(f"{tkey}.respass", path + ("respass",)))
    elif isinstance(block, ResBlockA):
        # reference Sequential per branch: [(BN), ReLU, Conv] per layer
        for d, branch in enumerate(block.branches):
            has_norm = branch[0][0] is not None
            per = 3 if has_norm else 2
            for i, (bn, _cv) in enumerate(branch):
                base = per * i
                if has_norm:
                    out.update(_bn_entries(f"{tkey}.dilations.{d}.{base}", path + ("branches", d, i, 0)))
                out.update(
                    _conv_entries(f"{tkey}.dilations.{d}.{base + per - 1}", path + ("branches", d, i, 1))
                )
        out.update(_conv_entries(f"{tkey}.respass", path + ("respass",)))
    else:
        raise NotImplementedError(f"unknown block type {type(block).__name__}")
    return out


def _psp_entries(tkey, psp, path):
    out = {}
    for i in range(len(psp.convs)):
        out.update(_conv_entries(f"{tkey}.convs.{i}.0", path + ("convs", i, 0)))
        out.update(_bn_entries(f"{tkey}.convs.{i}.1", path + ("convs", i, 1)))
    out.update(_conv_entries(f"{tkey}.conv_out", path + ("conv_out",)))
    out.update(_bn_entries(f"{tkey}.norm_out", path + ("norm_out",)))
    return out


def _ln_entries(tkey, path):
    return {
        f"{tkey}.weight": (path + ("scale",), "vec"),
        f"{tkey}.bias": (path + ("bias",), "vec"),
    }


def _linear_entries(tkey, path, has_bias=True):
    out = {f"{tkey}.weight": (path + ("kernel",), "linear")}
    if has_bias:
        out[f"{tkey}.bias"] = (path + ("bias",), "vec")
    return out


def _swinir_map(model):
    """Reference swinir.py state_dict names -> our (aligned) module paths.
    Buffers (relative_position_index, attn_mask) are recomputed here and
    skipped by the loader."""
    out = {}
    out.update(_conv_entries("conv_first", ("conv_first",)))
    if model.patch_embed.norm is not None:
        out.update(_ln_entries("patch_embed.norm", ("patch_embed", "norm")))
    if model.absolute_pos_embed is not None:
        out["absolute_pos_embed"] = (("absolute_pos_embed",), "vec")
    for i, layer in enumerate(model.layers):
        base = f"layers.{i}"
        for j, blk in enumerate(layer.residual_group.blocks):
            b = f"{base}.residual_group.blocks.{j}"
            p = ("layers", i, "residual_group", "blocks", j)
            out.update(_ln_entries(f"{b}.norm1", p + ("norm1",)))
            out.update(_ln_entries(f"{b}.norm2", p + ("norm2",)))
            out.update(
                _linear_entries(f"{b}.attn.qkv", p + ("attn", "qkv"), has_bias=blk.attn.qkv.bias is not None)
            )
            out.update(_linear_entries(f"{b}.attn.proj", p + ("attn", "proj")))
            out[f"{b}.attn.relative_position_bias_table"] = (
                p + ("attn", "relative_position_bias_table"),
                "vec",
            )
            out.update(_linear_entries(f"{b}.mlp.fc1", p + ("mlp", "fc1")))
            out.update(_linear_entries(f"{b}.mlp.fc2", p + ("mlp", "fc2")))
        if len(layer.convs) == 1:  # '1conv'
            out.update(_conv_entries(f"{base}.conv", ("layers", i, "convs", 0)))
        else:  # '3conv': Sequential [Conv, LReLU, Conv, LReLU, Conv]
            for k in range(3):
                out.update(_conv_entries(f"{base}.conv.{2 * k}", ("layers", i, "convs", k)))
    out.update(_ln_entries("norm", ("norm",)))
    if len(model.conv_after_body) == 1:
        out.update(_conv_entries("conv_after_body", ("conv_after_body", 0)))
    else:
        for k in range(3):
            out.update(_conv_entries(f"conv_after_body.{2 * k}", ("conv_after_body", k)))
    if model.upsampler == "pixelshuffle":
        out.update(_conv_entries("conv_before_upsample.0", ("conv_before_upsample",)))
        for s in range(len(model.upsample)):
            out.update(_conv_entries(f"upsample.{2 * s}", ("upsample", s)))
        out.update(_conv_entries("conv_last", ("conv_last",)))
    elif model.upsampler == "pixelshuffledirect":
        out.update(_conv_entries("upsample.0", ("upsample_direct",)))
    elif model.upsampler == "nearest+conv":
        out.update(_conv_entries("conv_before_upsample.0", ("conv_before_upsample",)))
        out.update(_conv_entries("conv_up1", ("conv_up1",)))
        if model.conv_up2 is not None:
            out.update(_conv_entries("conv_up2", ("conv_up2",)))
        out.update(_conv_entries("conv_hr", ("conv_hr",)))
        out.update(_conv_entries("conv_last", ("conv_last",)))
    else:
        out.update(_conv_entries("conv_last", ("conv_last",)))
    return out


def _ln2d_entries(tkey, path):
    # timm LayerNorm2d (weight/bias) -> our LayerNorm2d wrapping nnx.LayerNorm
    return {
        f"{tkey}.weight": (path + ("norm", "scale"), "vec"),
        f"{tkey}.bias": (path + ("norm", "bias"), "vec"),
    }


def _rdnet_entries(tkey, net, path):
    """Reference _rdnet.py Sequential layouts -> our explicit lists:
    stem.stem.{0,1}; dense_stages.{i} = [LN2d, Conv,] DenseStage with
    dense_block{k}.layers.layers.{0 dw, 1 norm, 2 fc1, 4 fc2, 5 ese}."""
    out = {}
    out.update(_conv_entries(f"{tkey}.stem.stem.0", path + ("stem", "conv")))
    out.update(_ln2d_entries(f"{tkey}.stem.stem.1", path + ("stem", "norm")))
    for i, (trans, stage) in enumerate(zip(net.transitions, net.stages)):
        if trans is None:
            stage_pos = 0
        else:
            out.update(_ln2d_entries(f"{tkey}.dense_stages.{i}.0", path + ("transitions", i, 0)))
            out.update(_conv_entries(f"{tkey}.dense_stages.{i}.1", path + ("transitions", i, 1)))
            stage_pos = 2
        for k, blk in enumerate(stage.blocks):
            b = f"{tkey}.dense_stages.{i}.{stage_pos}.dense_block{k}"
            p = path + ("stages", i, "blocks", k)
            if blk.gamma is not None:
                out[f"{b}.gamma"] = (p + ("gamma",), "vec")
            lb = f"{b}.layers.layers"
            lp = p + ("layers",)
            out.update(_conv_entries(f"{lb}.0", lp + ("dw",)))
            out.update(_ln2d_entries(f"{lb}.1", lp + ("norm",)))
            out.update(_conv_entries(f"{lb}.2", lp + ("fc1",)))
            out.update(_conv_entries(f"{lb}.4", lp + ("fc2",)))
            if blk.layers.ese is not None:
                out.update(_conv_entries(f"{lb}.5.fc", lp + ("ese", "fc")))
    return out


def torch_key_map(model):
    """dict: reference state_dict key -> (nnx state path, transform)."""
    from .models.rdresunet import RDResUNet as _RDResUNet
    from .models.resunet import ResUNet as _ResUNet
    from .models.swinir import SwinIR as _SwinIR

    if isinstance(model, _SwinIR):
        return _swinir_map(model)
    if isinstance(model, _RDResUNet):
        out = {}
        if model.norm is not None:
            out.update(_bn_entries("norm", ("norm",)))
        out.update(_rdnet_entries("encoder", model.encoder, ("encoder",)))
        for i, block in enumerate(model.decoder):
            out.update(_resblock_entries(f"decoder.{i}", block, ("decoder", i)))
        if model.encoder_pool is not None:
            out.update(_psp_entries("encoder_pool", model.encoder_pool, ("encoder_pool",)))
        if model.reconstruction_pool is not None:
            out.update(
                _psp_entries(
                    "reconstruction_pool", model.reconstruction_pool, ("reconstruction_pool",)
                )
            )
        out.update(_conv_entries("reconstruction.pre", ("reconstruction", "pre")))
        out.update(_conv_entries("reconstruction.conv", ("reconstruction", "conv")))
        return out
    if not isinstance(model, _ResUNet):
        raise NotImplementedError(
            f".pth import supports ResUNet/ResUNetA, RDResUNet/RDResUNetA and "
            f"SwinIR; got {type(model).__name__}."
        )
    out = {}
    if model.norm is not None:
        out.update(_bn_entries("norm", ("norm",)))
    for i, block in enumerate(model.encoder):
        out.update(_resblock_entries(f"encoder.{i}", block, ("encoder", i)))
    for i, block in enumerate(model.decoder):
        out.update(_resblock_entries(f"decoder.{i}", block, ("decoder", i)))
    if model.encoder_pool is not None:
        out.update(_psp_entries("encoder_pool", model.encoder_pool, ("encoder_pool",)))
    if model.reconstruction_pool is not None:
        out.update(
            _psp_entries("reconstruction_pool", model.reconstruction_pool, ("reconstruction_pool",))
        )
    out.update(_conv_entries("reconstruction.pre", ("reconstruction", "pre")))
    out.update(_conv_entries("reconstruction.conv", ("reconstruction", "conv")))
    return out


def load_torch_state_dict(model, state_dict, strict: bool = True):
    """Load a reference torch ``state_dict`` (name -> array-like) into
    ``model`` in place.  Returns (loaded_keys, skipped_keys)."""
    mapping = torch_key_map(model)
    state = nnx.state(model)

    def get_leaf(path):
        node = state
        for p in path:
            node = node[p]
        return node

    loaded, skipped = [], []
    for tkey, value in state_dict.items():
        if tkey.endswith(("num_batches_tracked", "relative_position_index", "attn_mask")):
            skipped.append(tkey)  # recomputed buffers / torch bookkeeping
            continue
        if tkey not in mapping:
            if strict:
                raise KeyError(
                    f"checkpoint key {tkey!r} has no destination in "
                    f"{type(model).__name__} — wrong architecture/kwargs?"
                )
            skipped.append(tkey)
            continue
        path, transform = mapping[tkey]
        leaf = get_leaf(path)
        arr = _t(tkey, transform, value)
        if tuple(leaf.shape) != tuple(arr.shape):
            raise ValueError(
                f"shape mismatch for {tkey!r}: checkpoint {arr.shape} vs model "
                f"{tuple(leaf.shape)} at {'.'.join(map(str, path))}"
            )
        leaf.set_value(np.ascontiguousarray(arr, dtype=np.float32))
        loaded.append(tkey)
    if strict:
        missing = [k for k in mapping if k not in state_dict]
        if missing:
            raise KeyError(f"checkpoint is missing {len(missing)} keys, e.g. {missing[:5]}")
    nnx.update(model, state)
    return loaded, skipped


def export_torch_state_dict(model):
    """The model's weights as a reference-named ``state_dict`` (numpy
    arrays, torch layout) — the inverse of :func:`load_torch_state_dict`,
    so reference tooling can consume models trained here."""
    mapping = torch_key_map(model)
    state = nnx.state(model)

    def get_leaf(path):
        node = state
        for p in path:
            node = node[p]
        return np.asarray(node.value)

    out = {}
    for tkey, (path, transform) in mapping.items():
        arr = get_leaf(path)
        if transform == "conv":  # (kh, kw, I, O) -> (O, I, kh, kw)
            arr = np.transpose(arr, (3, 2, 0, 1))
        elif transform == "linear":
            arr = np.transpose(arr, (1, 0))
        out[tkey] = np.ascontiguousarray(arr)
    return out


def save_torch_weights(model, path):
    """Save ``model`` as a reference-compatible ``.pth`` state_dict."""
    import torch

    torch.save({k: torch.from_numpy(v) for k, v in export_torch_state_dict(model).items()}, path)


def load_torch_weights(model, path, strict: bool = True):
    """Load a reference ``.pth`` checkpoint file into ``model`` in place.

    The file must be a plain ``state_dict`` (as the reference saves,
    pssr/train.py:151-153).  Requires the ``torch`` package (CPU is fine).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return load_torch_state_dict(model, sd, strict=strict)
