"""Test config: run JAX on a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (the TPU-world analog of
multi-node-without-a-cluster; see SURVEY.md §4).

The override is unconditional — benches run on the real chip, tests on CPU.
The jaxtyping pytest plugin imports jax before this conftest runs, so the
env vars alone are too late for ``jax_platforms``; the config update below
still lands because the backend is not initialized until first use.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize forces jax_platforms=axon over the env var, and the
# jaxtyping pytest plugin imports jax before this conftest — so override via
# config (lands as long as the backend is not yet initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
