"""Probe52b: int8-vs-bf16 Mosaic dot rate with convchain-representative
BLOCKING.  probe52's first form put one tiny dot per grid step (4096
steps) and measured pure per-step issue overhead (~3-4 TOPS for every
variant — the probe41 regime, not the MXU).  Here the grid is 16 steps
(one per canonical batch image) and each step runs the whole per-image
batched dot, exactly like the convchain/q8chain kernels:

  grid=(16,), block x (R, K, 128), w (M, K) broadcast -> y (R, M, 128)

Shapes (M=cout, K=3cin, R=rows/image): the serving stages
(64,192,R=128), (128,384,R=32), (256,768,R=8), (512,1536,R=2).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"devices: {jax.devices()}", flush=True)

    G = 16  # grid steps = batch images

    def make_kernel(acc_dtype):
        def kernel(w_ref, x_ref, y_ref):
            w = w_ref[...]
            x = x_ref[0]  # (R, K, 128)
            r, k, n = x.shape
            m = w.shape[0]
            wb = jnp.broadcast_to(w[None], (r, m, k))
            y_ref[0] = jax.lax.dot_general(
                wb, x, (((2,), (1,)), ((0,), (0,))), preferred_element_type=acc_dtype
            )

        return kernel

    def run_pallas(w, x, acc_dtype):
        g, r, k, n = x.shape
        m = w.shape[0]
        return pl.pallas_call(
            make_kernel(acc_dtype),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0)),
                pl.BlockSpec((1, r, k, n), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, r, m, n), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((g, r, m, n), acc_dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(w, x)

    def sync(v):
        return int(jnp.ravel(v)[0]) if v.dtype == jnp.int32 else float(jnp.ravel(v)[0])

    shapes = [(64, 192, 128), (128, 384, 32), (256, 768, 8), (512, 1536, 2)]
    results = {}
    rng = np.random.default_rng(0)
    for m, k, r in shapes:
        x8 = jnp.asarray(rng.integers(-127, 128, (G, r, k, 128)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        xb = jnp.asarray(rng.normal(0, 1, (G, r, k, 128)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)

        f_i8 = jax.jit(functools.partial(run_pallas, acc_dtype=jnp.int32))
        f_bf = jax.jit(functools.partial(run_pallas, acc_dtype=jnp.float32))
        y = f_i8(w8, x8)
        want = np.einsum(
            "mk,rkn->rmn",
            np.asarray(w8, np.int32),
            np.asarray(x8[0], np.int32),
        )
        np.testing.assert_array_equal(np.asarray(y[0]), want)

        row = {}
        macs = G * r * m * k * 128
        for name, fn in (("i8", lambda: f_i8(w8, x8)), ("bf16", lambda: f_bf(wb, xb))):
            sync(fn())
            sync(fn())
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(8):
                    out = fn()
                sync(out)
                times.append((time.perf_counter() - t0) / 8)
            med = sorted(times)[2]
            row[name] = {"ms": round(med * 1e3, 4), "tops": round(2 * macs / med / 1e12, 1)}
        row["i8_speedup"] = round(row["bf16"]["ms"] / row["i8"]["ms"], 3)
        results[f"{m}x{k}"] = row
        print(json.dumps({f"{m}x{k}": row}), flush=True)

    with open(os.path.join(HERE, "mxu_probe52b.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
