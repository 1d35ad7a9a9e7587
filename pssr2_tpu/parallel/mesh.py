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


def data_model_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    """2-D (data, model) mesh.  The ``model`` axis is laid out for future
    tensor-parallel sharding rules (SURVEY.md §2.4: not needed at <100M
    params, but the mesh shape shouldn't have to change to add it).  With
    ``model_parallel=1`` this behaves exactly like :func:`data_mesh`."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"model_parallel {model_parallel} must divide device count {n}.")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


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
