"""Spatial-parallel (sheet-sharded) inference with halo exchange.

The reference scales large sheets by host-side tiling + overlap-averaged
reassembly (reference: pssr/data.py:629-638, pssr/util.py:116-137), which
leaves grid artifacts unless margins are tuned.  The TPU-native alternative
implemented here is the "sequence parallelism" analog for image space
(SURVEY.md §2.4 SP row): one large image is sharded across the ``data``
mesh axis along its height, each chip exchanges ``halo`` boundary rows with
its neighbors over ICI (``ppermute`` inside ``shard_map``), runs the conv
model on its shard + halos, and crops the halo margin from the output —
seam-free by construction once ``halo`` covers the model's receptive field,
with no duplicated interior compute and no host round trips.

Boundary note: at the sheet's outer top/bottom edge the model sees
``halo`` reflected rows (matching the data layer's reflect-padding
convention) rather than the conv zero padding an unsharded forward would
apply — interior output is bitwise seam-free, the outer ``halo*scale``
rows differ slightly (and usually look better).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def receptive_field_radius(model) -> int:
    """Conservative receptive-field radius (input pixels) for choosing a
    seam-free ``halo``.  Supported analytically for ResUNet-family models;
    for other architectures pass ``halo`` explicitly.

    ResUNet: each level runs (depth+1) 3x3 convs (radius 1) at an effective
    stride of 2^level, encoder + decoder both touch every level, plus the
    1-radius convs in the reconstruction head.
    """
    encoder = getattr(model, "encoder", None)
    if encoder is None or not hasattr(model, "reconstruction"):
        raise ValueError(
            f"receptive_field_radius supports ResUNet-family models; pass halo explicitly for {type(model).__name__}."
        )
    levels = len(encoder)
    depth = getattr(model, "depth", 3)
    per_level = depth + 1
    radius = sum(2 * per_level * (2**level) for level in range(levels))  # enc+dec
    return radius + 2  # reconstruction head convs


def predict_sheet(model, lr_sheet, mesh, halo: int = None, axis: str = "data"):
    """Seam-free super-resolution of one large LR image across the mesh.

    Args:
        model : eval-mode NNX model (NCHW [0,255] convention; conv family).

        lr_sheet : (C, H, W) float array; H must be divisible by the mesh
            ``data`` axis size after internal padding.

        mesh : ``jax.sharding.Mesh`` with the sharding axis.

        halo (int) : Boundary rows exchanged between neighbor chips; must
            cover the model's receptive-field radius for exact seam-free
            output, and be smaller than the per-device shard height.
            Default None derives it via :func:`receptive_field_radius`.

    Returns:
        (C, H*scale, W*scale) numpy array.
    """
    if halo is None:
        halo = receptive_field_radius(model)
    model.eval()
    graphdef, state = nnx.split(model)
    scale = getattr(model, "scale", None) or getattr(model, "upscale", 1)

    n = dict(mesh.shape)[axis]
    c, h, w = lr_sheet.shape
    pad_h = (-h) % n
    x = jnp.asarray(lr_sheet, jnp.float32)
    if pad_h:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, 0)), mode="reflect")
    h_pad = h + pad_h
    shard_h = h_pad // n
    if halo >= shard_h:
        raise ValueError(
            f"halo {halo} must be smaller than the per-device shard height {shard_h} "
            f"(sheet height {h_pad} over {n} devices)."
        )

    fwd_perm = [(i, i + 1) for i in range(n - 1)]   # my bottom rows -> next chip's top halo
    bwd_perm = [(i + 1, i) for i in range(n - 1)]   # my top rows -> previous chip's bottom halo

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis, None),
        check_rep=False,
    )
    def run(state, x_local):
        idx = jax.lax.axis_index(axis)

        from_above = jax.lax.ppermute(x_local[:, -halo:, :], axis, fwd_perm)
        from_below = jax.lax.ppermute(x_local[:, :halo, :], axis, bwd_perm)

        # sheet boundary: reflect own rows (matches the data layer's reflect
        # padding convention, reference: pssr/data.py:548-551)
        reflect_top = jnp.flip(x_local[:, 1 : halo + 1, :], axis=1)
        reflect_bottom = jnp.flip(x_local[:, -halo - 1 : -1, :], axis=1)
        top = jnp.where(idx == 0, reflect_top, from_above)
        bottom = jnp.where(idx == n - 1, reflect_bottom, from_below)

        xh = jnp.concatenate([top, x_local, bottom], axis=1)
        y = nnx.merge(graphdef, state)(xh[None])[0]
        return y[:, halo * scale : -halo * scale, :]

    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    out = run(state, x)
    out = np.asarray(out)
    return out[:, : h * scale, :]
