"""Mesh construction and sharding helpers.

The reference is single-device (SURVEY.md §2.4); here scaling is TPU-native:
a 1-D ``data`` mesh over all chips, batches sharded over it, model/optimizer
state replicated.  XLA inserts the gradient psum automatically when the
jitted train step reduces over the sharded batch axis — no hand-written
collectives (scaling-book recipe: annotate shardings, let XLA do the rest).

A second (currently size-1) ``model`` axis is laid out so tensor-parallel
sharding rules can be added without restructuring (SURVEY.md §2.4).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int = None, devices=None) -> Mesh:
    """1-D mesh over the ``data`` axis (all local devices by default)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded over the leading axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
