"""Tensor-parallel sharding rules over the (data, model) mesh.

The reference is single-device (SURVEY.md §2.4: TP n/a below ~100M params),
but the TPU-native design keeps a ``model`` mesh axis so larger SwinIR
configs shard without restructuring.  TP here is expressed the XLA way
(scaling-book recipe): *only* parameter sharding annotations — the
Megatron column/row-parallel pattern falls out of layout propagation, and
XLA inserts the psum after row-parallel contractions.  No hand-written
collectives, no model-code changes.

Rules are (path-regex, PartitionSpec) pairs matched against
``jax.tree_util.keystr`` paths of ``nnx.state`` leaves; first match wins,
unmatched leaves are replicated.  Because optimizer moments mirror the
param tree path-for-path, the same rules shard AdamW state (each moment
lives beside its shard — ZeRO-style for the TP'd params).

SwinIR rules (models/swinir.py; reference arch swinir.py:16-124):

- ``qkv`` / ``mlp.fc1``: column-parallel — output features over ``model``.
- ``attn.proj`` / ``mlp.fc2``: row-parallel — input features over
  ``model``; XLA all-reduces the partial sums.
- pixelshuffle tail convs (``conv_before_upsample``, ``upsample``):
  C_out over ``model`` (the 64->4*scale^2*64 convs at HR resolution are
  the FLOP lump outside attention).
- everything else (norms, relative-position tables, first/last convs)
  replicated.

Head alignment: with ``num_heads % model_axis == 0`` the qkv column shards
land on head boundaries and attention runs collective-free per shard; with
ragged alignment XLA inserts reshards — still correct, just slower.
"""

import re

import jax
from flax import nnx
from jax.sharding import NamedSharding, PartitionSpec as P

# First match wins.  Patterns are substring searches over keystr paths like
# ['layers'][0]['residual_group']['blocks'][1]['attn']['qkv']['kernel'].
SWINIR_TP_RULES = (
    (r"\['attn'\]\['qkv'\]\['kernel'\]", P(None, "model")),
    (r"\['attn'\]\['qkv'\]\['bias'\]", P("model")),
    (r"\['attn'\]\['proj'\]\['kernel'\]", P("model", None)),
    (r"\['mlp'\]\['fc1'\]\['kernel'\]", P(None, "model")),
    (r"\['mlp'\]\['fc1'\]\['bias'\]", P("model")),
    (r"\['mlp'\]\['fc2'\]\['kernel'\]", P("model", None)),
    (r"\['conv_before_upsample'\]\['kernel'\]", P(None, None, None, "model")),
    (r"\['conv_before_upsample'\]\['bias'\]", P("model")),
    (r"\['upsample'\]\[\d+\]\['kernel'\]", P(None, None, None, "model")),
    (r"\['upsample'\]\[\d+\]\['bias'\]", P("model")),
)


def _spec_for(path_str: str, rules, axis_size: int, shape) -> P:
    """First matching rule whose sharded dims divide the leaf shape."""
    for pattern, spec in rules:
        if re.search(pattern, path_str):
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                if dim >= len(shape) or shape[dim] % axis_size != 0:
                    return P()  # indivisible -> replicate (correct, not TP'd)
            return spec
    return P()


def tp_shardings(tree, mesh, rules=SWINIR_TP_RULES):
    """Pytree of NamedShardings for ``tree`` (a state/param pytree) — TP
    specs where a rule matches and divides, replicated elsewhere."""
    axis_size = dict(mesh.shape).get("model", 1)

    def one(path, leaf):
        if axis_size == 1 or not hasattr(leaf, "shape"):
            return NamedSharding(mesh, P())
        spec = _spec_for(jax.tree_util.keystr(path), rules, axis_size, leaf.shape)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_module(module, mesh, rules=SWINIR_TP_RULES) -> int:
    """Place an NNX module's (and/or optimizer's) state onto ``mesh`` under
    ``rules``.  Returns the number of leaves actually tensor-sharded.

    Works on any ``nnx.Module``-like node — including ``nnx.Optimizer``,
    whose moment trees mirror the param paths and therefore match the same
    rules.
    """
    state = nnx.state(module)
    shardings = tp_shardings(state, mesh, rules)
    placed = jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s) if hasattr(leaf, "shape") else leaf,
        state,
        shardings,
    )
    nnx.update(module, placed)
    n_sharded = sum(
        1
        for s in jax.tree.leaves(shardings, is_leaf=lambda x: isinstance(x, NamedSharding))
        if isinstance(s, NamedSharding) and s.spec != P()
    )
    return n_sharded
