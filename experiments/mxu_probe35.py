"""Probe35: BN channel-stat reduction variants, micro + composed.

The r3c profile shows the BN stat machinery (convert_reduce_fusion family
+ neighbors) at ~7 ms/step, with individual fusions at ~2-4x their HBM
floor.  Hypothesis set:

  jnp      — current shipping path: jnp sums over x.reshape(-1, C)
  tjnp     — jnp sums over x.transpose(1,2,0,3).reshape(-1, C): matches
             the conv emitter's physical {3,0,2,1} layout (batch in
             sublanes, C in lanes), so the flat view may bitcast instead
             of relayout
  tpallas  — Pallas chanstats kernel on the transposed flat view (the
             round-2 composed +6.5 ms was blamed on relayout copies from
             the UNtransposed view)
  dot      — MXU Gram trick: sum(x*y) = diag(x^T y) via dot_general with
             3 contracting dims, sum(x) = ones-row dot

Micro on the two hottest BN shapes, then full-step A/B via
pssr2_tpu.ops.batchnorm.STATS_MODE.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = {}


def sync(v):
    import jax.numpy as jnp

    return float(jnp.ravel(v)[0])


def bench(fn, n=20, warmup=3):
    for _ in range(warmup):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from pssr2_tpu.ops.pallas import chanstats

    print(f"devices: {jax.devices()}", flush=True)

    # --- micro: produce x via a conv so it carries the conv-emitter layout
    for (B, H, W, C) in [(16, 128, 128, 64), (16, 64, 64, 128)]:
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05).astype(jnp.bfloat16)

        def conv(x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def run(mode):
            @jax.jit
            def f(x0):
                x = conv(x0)
                if mode == "jnp":
                    x2 = x.reshape(-1, C)
                    s = chanstats._dual_sums_jnp(x2, x2)
                elif mode == "tjnp":
                    x2 = x.transpose(1, 2, 0, 3).reshape(-1, C)
                    s = chanstats._dual_sums_jnp(x2, x2)
                elif mode == "tpallas":
                    x2 = x.transpose(1, 2, 0, 3).reshape(-1, C)
                    s = chanstats.dual_sums(x2, x2, force="pallas")
                elif mode == "dot":
                    g = jax.lax.dot_general(
                        x, x, (((0, 1, 2), (0, 1, 2)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s1 = jnp.diagonal(g)
                    s0 = jax.lax.dot_general(
                        jnp.ones((1, B * H * W), jnp.bfloat16), x.reshape(-1, C),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)[0]
                    s = jnp.stack([s0, s1])
                elif mode == "conv-only":
                    s = jnp.zeros((2, C), jnp.float32)
                return s.sum() + x.mean(dtype=jnp.float32)

            return f

        base = bench(run("conv-only"))
        row = {"conv-only": round(base, 3)}
        vals = {}
        for mode in ("jnp", "tjnp", "tpallas", "dot"):
            try:
                f = run(mode)
                ms = bench(f)
                row[mode] = round(ms, 3)
                row[mode + "-extra"] = round(ms - base, 3)
                vals[mode] = float(f(x0))
            except Exception as e:
                row[mode] = f"FAIL {type(e).__name__}: {str(e)[:90]}"
        row["value-dev"] = {m: abs(vals[m] - vals["jnp"]) for m in vals}
        OUT[f"micro_{C}@{H}"] = row
        print(f"micro {C}@{H}: {row}", flush=True)

    with open(os.path.join(HERE, "mxu_probe35.json"), "w") as f:
        json.dump(OUT, f, indent=1, default=str)


if __name__ == "__main__":
    main()
