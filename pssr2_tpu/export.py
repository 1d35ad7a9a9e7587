"""Serving export: serialized StableHLO artifacts of the eval forward.

The reference deploys by shipping ``.pth`` weights plus the Python model
code (reference: pssr/__main__.py:99-102 loads a state dict into a
freshly-constructed module).  For TPU serving the natural artifact is the
*compiled program*: :func:`export_model` serializes the jitted eval
forward — weights baked in as constants — via ``jax.export`` (StableHLO +
calling convention), and :func:`load_exported` rehydrates it into a
callable with no pssr2_tpu (or flax) dependency at serving time.

The exported function keeps the framework's API-boundary contract:
NCHW float32 [0, 255] in, NCHW float32 [0, 255] out
(``models/resunet.py:__call__``).  The batch dimension is exported
symbolically by default, so one artifact serves any batch size.

Example::

    model = ResUNet(dtype=jnp.bfloat16)
    load_checkpoint(model, "weights.npz")
    export_model(model, "resunet_x4.shlo", lr_res=128)

    serve = load_exported("resunet_x4.shlo")
    sr = serve(lr_batch)            # (B, 1, 128, 128) -> (B, 1, 512, 512)
"""

import jax
import jax.numpy as jnp
from flax import nnx


def export_model(model, path, *, lr_res=128, channels=1, dynamic_batch=True,
                 platforms=None):
    """Serialize ``model``'s eval forward to ``path``.

    Args:
        model : Any nnx model family (ResUNet/RDResUNet/SwinIR...), or a
            pure-functional executor exposing ``apply(params, x)`` +
            ``params`` (e.g. the int8 :class:`~pssr2_tpu.quant.QuantizedResUNet`).
        path (str) : Output file for the serialized artifact.
        lr_res (int) : Input LR resolution (or (H, W) tuple).
        channels (int) : Input channel count.
        dynamic_batch (bool) : Export the batch dim symbolically so the
            artifact serves any batch size; False pins batch 1.
        platforms (list[str]) : Lowering platforms (default: the current
            backend — export on TPU for TPU serving).
    Returns the ``jax.export.Exported`` object (also written to disk).
    """
    from jax import export as jex

    hw = (lr_res, lr_res) if isinstance(lr_res, int) else tuple(lr_res)
    if isinstance(model, nnx.Module):
        was_training = _is_training(model)
        model.eval()
        graphdef, state = nnx.split(model)

        @jax.jit
        def forward(lr):
            return nnx.merge(graphdef, state)(lr)

    else:  # functional executor: apply(params, x) + params (quant.py)
        was_training = False
        params = model.params
        apply = model.apply

        @jax.jit
        def forward(lr):
            return apply(params, lr)

    if dynamic_batch:
        (b,) = jex.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, channels, *hw), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((1, channels, *hw), jnp.float32)

    exported = jex.export(forward, platforms=platforms)(spec)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    if was_training:
        model.train()
    return exported


def load_exported(path):
    """Load a :func:`export_model` artifact into a jitted callable.

    Needs only jax at serving time (the weights are constants inside the
    program).  The callable accepts any batch size the artifact was
    exported for (symbolic batch by default)."""
    from jax import export as jex

    with open(path, "rb") as f:
        exported = jex.deserialize(f.read())

    def serve(lr):
        return jax.jit(exported.call)(jnp.asarray(lr, jnp.float32))

    serve.exported = exported
    return serve


def _is_training(model) -> bool:
    # nnx modules carry train/eval on submodules (BatchNorm.use_running_average,
    # Dropout.deterministic); probe any flag-bearing module
    for _, m in model.iter_modules() if hasattr(model, "iter_modules") else ():
        if hasattr(m, "use_running_average"):
            return not m.use_running_average
        if hasattr(m, "deterministic"):
            return not m.deterministic
    return False
