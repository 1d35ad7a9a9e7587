"""Compile-cache probe (VERDICT r2 #9): does the persistent compilation
cache engage across processes on the axon platform, measured on an IDLE
device?

Runs the same nontrivial jitted program in N fresh subprocesses with
jax_compilation_cache_dir pointed at a shared dir, timing lower/compile
and first-execute separately, and listing the cache dir between runs.
The round-3 open question: a second-process compile of a trivial program
took 221 s while the TPU was BUSY with another process — this probe
separates tunnel/device contention from true cache misses.

Usage: python experiments/cache_probe.py [n_runs]
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = "/tmp/jax_cache_probe"

CHILD = r"""
import json, os, time
t_import0 = time.perf_counter()
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
t_import = time.perf_counter() - t_import0

# nontrivial program: conv stack + reduction (enough to clear the
# min-compile-time bar, far smaller than the canonical step)
w1 = jnp.ones((3, 3, 32, 64), jnp.bfloat16)
w2 = jnp.ones((3, 3, 64, 32), jnp.bfloat16)
x = jnp.ones((8, 64, 64, 32), jnp.bfloat16)

@jax.jit
def f(x):
    for _ in range(4):
        x = jax.lax.conv_general_dilated(
            x, w1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x)
        x = jax.lax.conv_general_dilated(
            x, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x.mean(dtype=jnp.float32)

t0 = time.perf_counter()
lowered = f.lower(x)
t_lower = time.perf_counter() - t0
t0 = time.perf_counter()
compiled = lowered.compile()
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
v = float(compiled(x))
t_first_exec = time.perf_counter() - t0
print(json.dumps({
    "platform": jax.devices()[0].platform,
    "t_import": round(t_import, 2),
    "t_lower": round(t_lower, 3),
    "t_compile": round(t_compile, 2),
    "t_first_exec": round(t_first_exec, 2),
    "value": v,
}))
"""


def cache_listing():
    if not os.path.isdir(CACHE):
        return []
    return sorted(
        (name, os.path.getsize(os.path.join(CACHE, name)))
        for name in os.listdir(CACHE)
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    results = []
    env = dict(os.environ, CACHE_DIR=CACHE)
    os.makedirs(CACHE, exist_ok=True)
    for i in range(n):
        before = cache_listing()
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True, text=True)
        wall = time.perf_counter() - t0
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        rec = json.loads(line[-1]) if line else {"error": proc.stderr[-500:]}
        rec.update(run=i, wall=round(wall, 2),
                   cache_files_before=len(before), cache_files_after=len(cache_listing()))
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open(os.path.join(HERE, "cache_probe.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
