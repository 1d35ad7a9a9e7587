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


def torch_key_map(model):
    """dict: reference state_dict key -> (nnx state path, transform)."""
    from .models import ResUNet, ResUNetA  # noqa: F401  (ResUNetA returns ResUNet)
    from .models.resunet import ResUNet as _ResUNet

    if not isinstance(model, _ResUNet):
        raise NotImplementedError(
            f".pth import currently supports the ResUNet/ResUNetA family; got "
            f"{type(model).__name__}.  Train-side parity for other families is "
            f"available through the npz checkpoints."
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
        if tkey.endswith("num_batches_tracked"):
            skipped.append(tkey)
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
