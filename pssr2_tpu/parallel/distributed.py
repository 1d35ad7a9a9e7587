"""Multi-host initialization (the distributed-communication row of
SURVEY.md §2.4: no custom transport — `jax.distributed` + mesh collectives).

On a multi-host TPU pod slice, call :func:`initialize` once per process
before building meshes; `jax.devices()` then spans all hosts and the same
``data`` mesh / sharded-batch code paths scale across DCN+ICI unchanged.
Each host feeds its local shard of the global batch (`local_batch_slice`).
"""

import jax


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


def local_batch_slice(global_batch: int):
    """(start, stop) rows of the global batch this host should load."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return start, start + per_host
