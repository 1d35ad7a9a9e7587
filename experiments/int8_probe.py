"""Does an int8 conv hit the v5e int8 MXU rate (2x bf16) through this stack?

Chained-conv micro at the hot shapes (dependent fori_loop, one jit, fetch
sync) comparing bf16 vs int8(+int32 accum) convs.  If int8 is not ~2x,
the quantized-inference idea dies here.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
K = 24  # chained convs per jit call


def chain_bf16(x, w):
    def body(_, x):
        y = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN,
                                     preferred_element_type=jnp.float32)
        return (y * (1.0 / 256.0)).astype(jnp.bfloat16)

    return lax.fori_loop(0, K, body, x)


def chain_int8(x, w):
    def body(_, x):
        y = lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=DN,
                                     preferred_element_type=jnp.int32)
        return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)

    return lax.fori_loop(0, K, body, x)


def time_fn(fn, x, w, trials=5, calls=4):
    out = fn(x, w)
    _ = np.asarray(jnp.ravel(out)[0])  # warm + sync
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
    results = {}
    for name, (B, H, C) in {
        "c64@128": (16, 128, 64),
        "c128@64": (16, 64, 128),
        "c256@32": (16, 32, 256),
    }.items():
        xb = jnp.asarray(rng.standard_normal((B, H, H, C)).astype(np.float32)).astype(jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32)).astype(jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-100, 100, (B, H, H, C)).astype(np.int8))
        wi = jnp.asarray(rng.integers(-100, 100, (3, 3, C, C)).astype(np.int8))
        tb = time_fn(jax.jit(chain_bf16), xb, wb)
        ti = time_fn(jax.jit(chain_int8), xi, wi)
        gf = 2 * 9 * C * C * B * H * H / 1e9
        results[name] = {
            "bf16_ms": round(tb * 1e3, 4),
            "int8_ms": round(ti * 1e3, 4),
            "speedup": round(tb / ti, 3),
            "bf16_tf": round(gf / tb / 1e3, 1),
            "int8_tops": round(gf / ti / 1e3, 1),
        }
        print(name, json.dumps(results[name]), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "int8_probe.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
