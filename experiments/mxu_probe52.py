"""Probe52: does an int8 x int8 -> int32 Mosaic dot run at ~2x the bf16
rate on the convchain batched-dot shapes?  (VERDICT r4 #6 prerequisite.)

The r4 floor argument (results_r4.md) says the XLA int8 serving path
caps at ~1.47x because the C<=64 stages are LANE-bound under the conv
emitter's C-on-lanes layout.  convchain's (N, H, C, W) layout puts W on
the lanes — 128 output lanes regardless of C — so those stages are
MAC-bound *in kernel layout*, where int8's 394-vs-197 TOPS should pay.
This probe measures the primitive before any engine is built:

  kernel: grid over B rows, y[b] = w @ x[b] with w (M, K) broadcast,
  x (B, K, 128) — exactly the fwd convchain dot per ky tap.  Variants:
  bf16 (f32 acc) and int8 (int32 acc), plus an XLA dot_general twin of
  each for the same shapes.  Shapes from the canonical serving stages:
  (M=cout, K=3*cin): (64, 192), (128, 384), (256, 768), (512, 1536).

Exactness: the int8 result must equal the numpy int32 oracle bitwise.
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

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(f"devices: {jax.devices()}", flush=True)

    def make_kernel(acc_dtype):
        def kernel(w_ref, x_ref, y_ref):
            w = w_ref[...]
            x = x_ref[0]
            y_ref[0] = jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype
            )

        return kernel

    def run_pallas(w, x, acc_dtype):
        b, k, n = x.shape
        m = w.shape[0]
        return pl.pallas_call(
            make_kernel(acc_dtype),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((m, k), lambda i: (0, 0)),
                pl.BlockSpec((1, k, n), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, m, n), acc_dtype),
        )(w, x)

    def sync(v):
        return int(jnp.ravel(v)[0]) if v.dtype == jnp.int32 else float(jnp.ravel(v)[0])

    # batch B chosen so each case does the same total MACs (~3.2 GMAC)
    shapes = [(64, 192, 4096), (128, 384, 1024), (256, 768, 256), (512, 1536, 64)]
    results = {}
    rng = np.random.default_rng(0)
    for m, k, b in shapes:
        x8 = jnp.asarray(rng.integers(-127, 128, (b, k, 128)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        xb = jnp.asarray(rng.normal(0, 1, (b, k, 128)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)

        funcs = {}
        try:
            f_i8 = jax.jit(functools.partial(run_pallas, acc_dtype=jnp.int32))
            y = f_i8(w8, x8)
            # bitwise oracle on a slice (full oracle is host-slow)
            want = np.asarray(w8, np.int32) @ np.asarray(x8[0], np.int32)
            np.testing.assert_array_equal(np.asarray(y[0]), want)
            funcs["pallas_i8"] = lambda: f_i8(w8, x8)
        except Exception as e:  # noqa: BLE001 — record the refutation
            results[f"{m}x{k}"] = {"pallas_i8_error": repr(e)[:300]}
            print(f"{m}x{k}: pallas int8 FAILED: {e!r}"[:300], flush=True)
        f_bf = jax.jit(functools.partial(run_pallas, acc_dtype=jnp.float32))
        funcs["pallas_bf16"] = lambda: f_bf(wb, xb)

        def xla_dot(w, x, acc):
            return jax.lax.dot_general(
                w, x, (((1,), (1,)), ((), ())), preferred_element_type=acc
            )

        f_xla_i8 = jax.jit(functools.partial(xla_dot, acc=jnp.int32))
        f_xla_bf = jax.jit(functools.partial(xla_dot, acc=jnp.float32))
        funcs["xla_i8"] = lambda: f_xla_i8(w8, x8)
        funcs["xla_bf16"] = lambda: f_xla_bf(wb, xb)

        row = results.setdefault(f"{m}x{k}", {})
        macs = m * k * 128 * b
        for name, fn in funcs.items():
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
            row[name] = {
                "ms": round(med * 1e3, 4),
                "tops": round(2 * macs / med / 1e12, 1),
            }
        if "pallas_i8" in row and "pallas_bf16" in row:
            row["i8_speedup"] = round(
                row["pallas_bf16"]["ms"] / row["pallas_i8"]["ms"], 3
            )
        print(json.dumps({f"{m}x{k}": row}), flush=True)

    with open(os.path.join(HERE, "mxu_probe52.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
