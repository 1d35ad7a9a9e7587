"""Pure-matmul int8 vs bf16 MXU rate check (no conv emitter, minimal
epilogue): chained (8192,4096)@(4096,4096) dots."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 16
M, N = 8192, 4096


def chain_bf16(x, w):
    def body(_, x):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return (y * (1.0 / 64.0)).astype(jnp.bfloat16)

    return lax.fori_loop(0, K, body, x)


def chain_int8(x, w):
    def body(_, x):
        y = jnp.dot(x, w, preferred_element_type=jnp.int32)
        return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

    return lax.fori_loop(0, K, body, x)


def time_fn(fn, x, w, trials=5, calls=3):
    out = fn(x, w)
    _ = np.asarray(jnp.ravel(out)[0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn(x, w)
        _ = np.asarray(jnp.ravel(out)[0])
        best = min(best, (time.perf_counter() - t0) / (calls * K))
    return best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32)).astype(jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32)).astype(jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-100, 100, (M, N)).astype(np.int8))
    wi = jnp.asarray(rng.integers(-100, 100, (N, N)).astype(np.int8))
    tb = time_fn(jax.jit(chain_bf16), xb, wb)
    ti = time_fn(jax.jit(chain_int8), xi, wi)
    gf = 2 * M * N * N / 1e9
    out = {
        "bf16_ms": round(tb * 1e3, 4), "int8_ms": round(ti * 1e3, 4),
        "speedup": round(tb / ti, 3),
        "bf16_tf": round(gf / tb / 1e3, 1), "int8_tops": round(gf / ti / 1e3, 1),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "int8_probe2.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
