"""Checkpointing: full resumable train state (params + optimizer + epoch via
orbax) plus a weights-only .npz export matching the reference's
``.pth``-style weights-only semantics (reference: pssr/train.py:151-153,
pssr/__main__.py:99-102 — which never saved optimizer state; we do).
"""

import os
from pathlib import Path

import jax
import numpy as np
from flax import nnx


def _flatten_state(state) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(nnx.to_pure_dict(state))[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_weights(model: nnx.Module, path):
    """Save model weights (params + batch stats) as a flat .npz.  RNG
    stream state (e.g. SwinIR's DropPath dropout keys) is excluded — the
    reference's .pth exports are weights-only too (pssr/train.py:151)."""
    state = nnx.state(model, nnx.Not(nnx.RngState))
    np.savez(path, **_flatten_state(state))


def load_weights(model: nnx.Module, path):
    """Load weights into ``model``: a ``.npz`` from :func:`save_weights`,
    or a reference torch ``.pth`` state_dict (dispatched by extension;
    see :mod:`pssr2_tpu.torch_import`)."""
    if str(path).endswith((".pth", ".pt")):
        from .torch_import import load_torch_weights

        load_torch_weights(model, path)
        return model
    loaded = np.load(path)
    state = nnx.state(model, nnx.Not(nnx.RngState))
    pure = nnx.to_pure_dict(state)

    flat, treedef = jax.tree_util.tree_flatten_with_path(pure)
    new_leaves = []
    for path_keys, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path_keys)
        if key not in loaded:
            raise KeyError(f"Checkpoint is missing weight {key}")
        arr = loaded[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"Shape mismatch for {key}: checkpoint {arr.shape} vs model {np.shape(leaf)}")
        new_leaves.append(arr)
    pure = jax.tree_util.tree_unflatten(treedef, new_leaves)
    nnx.replace_by_pure_dict(state, pure)
    nnx.update(model, state)
    return model


def save_train_state(directory, model: nnx.Module, opt_state=None, step: int = 0, extra: dict = None):
    """Full resumable checkpoint: model state + optimizer state + step."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = {"model": nnx.to_pure_dict(nnx.state(model)), "step": step}
    if opt_state is not None:
        payload["opt_state"] = jax.tree.map(np.asarray, opt_state)
    if extra:
        payload["extra"] = extra
    ckptr.save(directory / f"step_{step}", payload, force=True)
    ckptr.wait_until_finished()


def load_train_state(directory, model: nnx.Module, opt_state=None, step: int = None):
    """Restore a checkpoint saved by :func:`save_train_state`; returns
    (model, opt_state, step)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    if step is None:
        steps = sorted(
            int(p.name.split("_")[1]) for p in directory.iterdir() if p.name.startswith("step_")
        )
        if not steps:
            raise FileNotFoundError(f"No checkpoints in {directory}")
        step = steps[-1]
    ckptr = ocp.StandardCheckpointer()
    target = {"model": nnx.to_pure_dict(nnx.state(model)), "step": step}
    if opt_state is not None:
        target["opt_state"] = jax.tree.map(np.asarray, opt_state)
    restored = ckptr.restore(directory / f"step_{step}", target)
    state = nnx.state(model)
    nnx.replace_by_pure_dict(state, restored["model"])
    nnx.update(model, state)
    return model, restored.get("opt_state", opt_state), restored["step"]


def save_full_state(directory, model: nnx.Module, optimizer, epoch: int):
    """Fault-tolerance checkpoint: model + optimizer state + completed-epoch
    counter (consumed by train_paired's state_dir resume)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "model": jax.tree.map(np.asarray, nnx.to_pure_dict(nnx.state(model))),
        "opt": jax.tree.map(np.asarray, nnx.to_pure_dict(nnx.state(optimizer))),
        "epoch": epoch,
    }
    ckptr.save(directory / f"epoch_{epoch}", payload, force=True)
    ckptr.wait_until_finished()
    # prune older epochs (keep latest two)
    import shutil

    epochs = sorted(
        int(p.name.split("_")[1]) for p in directory.iterdir() if p.name.startswith("epoch_")
    )
    for old in epochs[:-2]:
        shutil.rmtree(directory / f"epoch_{old}", ignore_errors=True)


def load_full_state(directory, model: nnx.Module, optimizer) -> int:
    """Restore the latest fault-tolerance checkpoint; returns the epoch to
    resume from (0 when no checkpoint exists)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    if not directory.exists():
        return 0
    epochs = sorted(
        int(p.name.split("_")[1]) for p in directory.iterdir() if p.name.startswith("epoch_")
    )
    if not epochs:
        return 0
    epoch = epochs[-1]
    ckptr = ocp.StandardCheckpointer()
    target = {
        "model": nnx.to_pure_dict(nnx.state(model)),
        "opt": nnx.to_pure_dict(nnx.state(optimizer)),
        "epoch": epoch,
    }
    restored = ckptr.restore(directory / f"epoch_{epoch}", target)
    for node, key in ((model, "model"), (optimizer, "opt")):
        state = nnx.state(node)
        nnx.replace_by_pure_dict(state, restored[key])
        nnx.update(node, state)
    return int(restored["epoch"])
