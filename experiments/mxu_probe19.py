"""MXU probe round 19: why do (B,H,W,C)->(C,) reductions run at ~93 GB/s
in the step (profiler) when a full sum runs at 681 GB/s standalone?

Measure standalone formulations of the BN stats pair on (16,128,128,64)
bf16 (33.6 MB):

  a. jnp.sum(x) -> scalar (control)
  b. x2.sum(0) -> (C,) single
  c. mean + mean(x^2) pair (the FastBatchNorm fwd form)
  d. two-stage: (N/512, 512, C).sum(1).sum(0) pair
  e. dot(ones(8, N), x2) row-sum trick pair (MXU)
  f. fori-free reshape-major: (C-major transpose first)  [layout probe]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp

    def sync(v):
        return float(jnp.ravel(v)[0])

    def op_time(fn, x, k_lo=32, k_hi=512, reps=3):
        def runner(k):
            @jax.jit
            def run(x):
                def body(i, acc):
                    out = fn(x + (i * 1e-9).astype(x.dtype))
                    return acc + jnp.sum(out.astype(jnp.float32))

                return jax.lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        lo, hi = runner(k_lo), runner(k_hi)
        sync(lo(x)), sync(hi(x))
        ts = {}
        for n, r in (("lo", lo), ("hi", hi)):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(r(x))
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
        return (ts["hi"] - ts["lo"]) / (k_hi - k_lo)

    def record(name, seconds, mb):
        entry = {"name": name, "ms": round(seconds * 1e3, 4), "GBps": round(mb / 1e3 / seconds, 0)}
        RESULTS.append(entry)
        print(json.dumps(entry), flush=True)
        with open(os.path.join(HERE, "mxu_probe19.json"), "w") as f:
            json.dump(RESULTS, f, indent=1)

    print(f"devices: {jax.devices()}", flush=True)
    B, H, W, C = 16, 128, 128, 64
    N = B * H * W
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, C), np.float32) - 0.3, dtype=jnp.bfloat16)
    MB = x.size * 2 / 1e6

    record("a sum-all", op_time(lambda v: jnp.sum(v.astype(jnp.float32))[None], x), MB)
    record(
        "b axis-sum -> C",
        op_time(lambda v: v.reshape(N, C).astype(jnp.float32).sum(0), x),
        MB,
    )

    def pair(v):
        xf = v.reshape(N, C).astype(jnp.float32)
        return xf.mean(0) + (xf * xf).mean(0)

    record("c mean+meansq pair", op_time(pair, x), MB)

    def two_stage(v):
        xf = v.reshape(N // 512, 512, C).astype(jnp.float32)
        s = xf.sum(1)
        q = (xf * xf).sum(1)
        return s.sum(0) + q.sum(0)

    record("d two-stage pair", op_time(two_stage, x), MB)

    ones = jnp.ones((8, N), jnp.bfloat16)

    def dot_rows(v):
        x2 = v.reshape(N, C)
        s = jax.lax.dot_general(ones, x2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        q = jax.lax.dot_general(ones, x2 * x2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return s[0] + q[0]

    record("e ones-dot pair", op_time(dot_rows, x), MB)


if __name__ == "__main__":
    main()
