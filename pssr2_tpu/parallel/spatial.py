"""Spatial-parallel (sheet-sharded) inference with halo exchange.

The reference scales large sheets by host-side tiling + overlap-averaged
reassembly (reference: pssr/data.py:629-638, pssr/util.py:116-137), which
leaves grid artifacts unless margins are tuned.  The TPU-native alternative
implemented here is the "sequence parallelism" analog for image space
(SURVEY.md §2.4 SP row): one large image is sharded across a mesh axis
along its height or width (or both axes of a 2-D mesh), each chip exchanges
``halo`` boundary rows/columns with its neighbors over ICI (``ppermute``
inside ``shard_map``), runs the conv model on its shard + halos, and crops
the halo margin from the output — seam-free by construction once ``halo``
covers the model's receptive field, with no duplicated interior compute and
no host round trips.

Seam-freeness needs TWO alignment conditions, not just halo >= receptive
field: each shard's window into the sheet must also start on the model's
pooling grid, or the shard's max_pool windows are offset relative to the
unsharded forward.  Both ``halo`` and the per-device shard extent are
therefore rounded/padded to multiples of the pooling granularity
(2^(levels-1) for a UNet with levels-1 pooling stages).

Boundary note: at the sheet's outer edges the model sees ``halo``
reflected rows (matching the data layer's reflect-padding convention)
rather than the conv zero padding an unsharded forward would apply —
interior output is bitwise seam-free, the outer ``halo*scale`` rows differ
slightly (and usually look better).
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


def pool_granularity(model) -> int:
    """Pooling-grid granularity: shard offsets must be multiples of this for
    the shard's pooling windows to align with the unsharded forward.
    2^(levels-1) for ResUNet-family models (levels-1 max_pool stages);
    1 for models without an encoder attribute (no pooling assumed)."""
    encoder = getattr(model, "encoder", None)
    if encoder is None:
        return 1
    return 2 ** max(len(encoder) - 1, 0)


def _round_up(value: int, mult: int) -> int:
    return ((value + mult - 1) // mult) * mult


def _axis_halo(model, halo, granularity):
    """Resolve halo and pooling granularity; round halo up to the grid."""
    gran = pool_granularity(model) if granularity is None else granularity
    if halo is None:
        halo = receptive_field_radius(model)
    return _round_up(halo, gran), gran


def predict_sheet(model, lr_sheet, mesh, halo: int = None, axis: str = "data",
                  dim: str = "height", granularity: int = None):
    """Seam-free super-resolution of one large LR image across the mesh.

    Args:
        model : eval-mode NNX model (NCHW [0,255] convention; conv family).

        lr_sheet : (C, H, W) float array.  The sharded dimension is
            reflect-padded internally to a multiple of
            ``mesh_axis_size * pooling_granularity``.

        mesh : ``jax.sharding.Mesh`` with the sharding axis.

        halo (int) : Boundary rows/cols exchanged between neighbor chips;
            must cover the model's receptive-field radius for exact
            seam-free output, and is rounded up to the model's pooling
            granularity so shard pooling grids align with the unsharded
            forward.  Default None derives it via
            :func:`receptive_field_radius`.

        axis (str) : Mesh axis name to shard over.

        dim (str) : ``"height"`` or ``"width"`` — which image dimension is
            sharded.

        granularity (int) : Pooling-grid granularity override for
            non-ResUNet models (default: auto-detected, 1 if unknown).

    Returns:
        (C, H*scale, W*scale) numpy array.
    """
    halo, gran = _axis_halo(model, halo, granularity)
    model.eval()
    graphdef, state = nnx.split(model)
    scale = getattr(model, "scale", None) or getattr(model, "upscale", 1)
    d = {"height": 1, "width": 2}[dim]

    n = dict(mesh.shape)[axis]
    c, h, w = lr_sheet.shape
    extent = lr_sheet.shape[d]
    pad = (-extent) % (n * gran)
    x = jnp.asarray(lr_sheet, jnp.float32)
    if pad:
        pads = [(0, 0), (0, 0), (0, 0)]
        pads[d] = (0, pad)
        x = jnp.pad(x, pads, mode="reflect")
    shard_len = (extent + pad) // n
    if halo >= shard_len:
        raise ValueError(
            f"halo {halo} must be smaller than the per-device shard extent {shard_len} "
            f"(sheet {dim} {extent + pad} over {n} devices)."
        )

    fwd_perm = [(i, i + 1) for i in range(n - 1)]   # my trailing rows -> next chip's leading halo
    bwd_perm = [(i + 1, i) for i in range(n - 1)]   # my leading rows -> previous chip's trailing halo

    spec = [None, None, None]
    spec[d] = axis
    in_spec = P(*spec)

    @partial(shard_map, mesh=mesh, in_specs=(P(), in_spec), out_specs=in_spec, check_rep=False)
    def run(state, x_local):
        idx = jax.lax.axis_index(axis)
        lead, body, trail = _exchange_halos(x_local, d, halo, idx, n, axis, fwd_perm, bwd_perm)
        xh = jnp.concatenate([lead, body, trail], axis=d)
        y = nnx.merge(graphdef, state)(xh[None])[0]
        sl = [slice(None)] * 3
        sl[d] = slice(halo * scale, -halo * scale)
        return y[tuple(sl)]

    x = jax.device_put(x, NamedSharding(mesh, in_spec))
    out = np.asarray(run(state, x))
    return out[:, : h * scale, : w * scale]


def _exchange_halos(x_local, d, halo, idx, n, axis, fwd_perm, bwd_perm):
    """Leading/trailing halo blocks along dim ``d`` via neighbor ppermute,
    with reflect context at the sheet's outer edges (matching the data
    layer's reflect-padding convention, reference: pssr/data.py:548-551)."""
    sl_trail = [slice(None)] * x_local.ndim
    sl_trail[d] = slice(-halo, None)
    sl_lead = [slice(None)] * x_local.ndim
    sl_lead[d] = slice(None, halo)
    from_prev = jax.lax.ppermute(x_local[tuple(sl_trail)], axis, fwd_perm)
    from_next = jax.lax.ppermute(x_local[tuple(sl_lead)], axis, bwd_perm)

    sl_rl = [slice(None)] * x_local.ndim
    sl_rl[d] = slice(1, halo + 1)
    sl_rt = [slice(None)] * x_local.ndim
    sl_rt[d] = slice(-halo - 1, -1)
    reflect_lead = jnp.flip(x_local[tuple(sl_rl)], axis=d)
    reflect_trail = jnp.flip(x_local[tuple(sl_rt)], axis=d)

    lead = jnp.where(idx == 0, reflect_lead, from_prev)
    trail = jnp.where(idx == n - 1, reflect_trail, from_next)
    return lead, x_local, trail


def predict_sheet_2d(model, lr_sheet, mesh, halo: int = None,
                     axes=("data", "model"), granularity: int = None):
    """Seam-free super-resolution with a 2-D (height x width) shard grid.

    Shards the sheet over two mesh axes at once — for very large sheets
    where 1-D sharding would leave shards too thin (halo >= shard extent).
    Halo exchange runs in two phases (width first, then height on the
    width-extended block) so corner context rides along automatically.

    Args:
        model : eval-mode NNX model (NCHW [0,255] convention; conv family).

        lr_sheet : (C, H, W) float array.

        mesh : ``jax.sharding.Mesh`` with both ``axes``.

        halo (int) : As :func:`predict_sheet`.

        axes (tuple[str, str]) : Mesh axes for (height, width) sharding.

        granularity (int) : Pooling-grid override (see :func:`predict_sheet`).

    Returns:
        (C, H*scale, W*scale) numpy array.
    """
    halo, gran = _axis_halo(model, halo, granularity)
    model.eval()
    graphdef, state = nnx.split(model)
    scale = getattr(model, "scale", None) or getattr(model, "upscale", 1)
    ax_h, ax_w = axes

    shape = dict(mesh.shape)
    nh, nw = shape[ax_h], shape[ax_w]
    c, h, w = lr_sheet.shape
    pad_h = (-h) % (nh * gran)
    pad_w = (-w) % (nw * gran)
    x = jnp.asarray(lr_sheet, jnp.float32)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w)), mode="reflect")
    shard_h, shard_w = (h + pad_h) // nh, (w + pad_w) // nw
    for name, size, shard in (("height", nh, shard_h), ("width", nw, shard_w)):
        if size > 1 and halo >= shard:
            raise ValueError(
                f"halo {halo} must be smaller than the per-device {name} shard {shard}."
            )

    fwd_h = [(i, i + 1) for i in range(nh - 1)]
    bwd_h = [(i + 1, i) for i in range(nh - 1)]
    fwd_w = [(i, i + 1) for i in range(nw - 1)]
    bwd_w = [(i + 1, i) for i in range(nw - 1)]

    in_spec = P(None, ax_h, ax_w)

    @partial(shard_map, mesh=mesh, in_specs=(P(), in_spec), out_specs=in_spec, check_rep=False)
    def run(state, x_local):
        ih = jax.lax.axis_index(ax_h)
        iw = jax.lax.axis_index(ax_w)
        # phase 1: width halos
        left, body, right = _exchange_halos(x_local, 2, halo, iw, nw, ax_w, fwd_w, bwd_w)
        xw = jnp.concatenate([left, body, right], axis=2)
        # phase 2: height halos on the width-extended block (carries corners)
        top, body, bottom = _exchange_halos(xw, 1, halo, ih, nh, ax_h, fwd_h, bwd_h)
        xh = jnp.concatenate([top, body, bottom], axis=1)
        y = nnx.merge(graphdef, state)(xh[None])[0]
        m = halo * scale
        return y[:, m:-m, m:-m]

    x = jax.device_put(x, NamedSharding(mesh, in_spec))
    out = np.asarray(run(state, x))
    return out[:, : h * scale, : w * scale]
