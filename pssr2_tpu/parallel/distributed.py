"""Multi-host initialization and feeding (the distributed-communication row
of SURVEY.md §2.4: no custom transport — `jax.distributed` + mesh
collectives).

On a multi-host TPU pod slice, call :func:`initialize` once per process
before building meshes; `jax.devices()` then spans all hosts and the same
``data`` mesh / sharded-batch code paths scale across DCN+ICI unchanged.

Feeding: each host loads only its rows of the global batch
(:func:`local_batch_slice`, wired through ``PatchLoader(local_slice=...)``)
and :func:`put_global_batch` assembles the global sharded array from the
per-process shards via ``jax.make_array_from_process_local_data``.
``train_paired`` does this automatically when ``jax.process_count() > 1``.
"""

import jax
import jax.numpy as jnp


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Thin wrapper over ``jax.distributed.initialize`` (no-ops when JAX
    already knows the topology, e.g. on Cloud TPU with automatic env)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int, process_index: int = None, process_count: int = None):
    """(start, stop) rows of the global batch this host should load.

    The global batch is split evenly over processes (``train_paired``
    validates divisibility); explicit index/count args make the arithmetic
    unit-testable without a live multi-process runtime.
    """
    count = jax.process_count() if process_count is None else process_count
    index = jax.process_index() if process_index is None else process_index
    per_host = global_batch // count
    start = index * per_host
    return start, start + per_host


def put_global_batch(batch, sharding):
    """Place a batch onto the mesh as a global array.

    Single-process: a plain ``device_put`` of the full batch.  Multi-process:
    ``batch`` is this process's local rows (``local_batch_slice`` of the
    global batch) and the global array is assembled across hosts via
    ``jax.make_array_from_process_local_data`` — the device_put path would
    require every host to hold the full global batch, which does not scale
    and breaks when sharding spans non-addressable devices.
    """
    if sharding is None:
        return jnp.asarray(batch)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)
