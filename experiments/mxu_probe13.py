"""MXU probe round 13: lane-filling the fused-tail z contraction.

The tail's dot_general has N = 9*Cout = 9 output lanes (7% of 128):
(B,H,W,s^2,C) x (C, 9*Cout).  Reformulate as one dense matmul with the
phase structure folded into N via W_dense = I_{s^2} (x) wt:
(B,H,W,s^2*C) x (s^2*C, s^2*9*Cout) -> N = 144 full lanes.  16x the FLOPs
(zeros) but bitwise-identical output (x + 0 and 0*y are exact) and ~6x
fewer MXU passes.  Measure head fwd and fwd+bwd both ways at canonical
shapes (B=16, 128^2, C=64, s=4, Cout=1).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []
HERE = os.path.dirname(os.path.abspath(__file__))


def record(name, seconds):
    entry = {"name": name, "ms": round(seconds * 1e3, 3)}
    RESULTS.append(entry)
    print(json.dumps(entry), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pssr2_tpu.ops import smallconv as sc

    def sync(v):
        return float(jnp.ravel(v)[0])

    def op_time(fn, *args, k_lo=2, k_hi=10, reps=3):
        def runner(k):
            @jax.jit
            def run(*args):
                def body(i, acc):
                    out = fn(args[0] + (i * 1e-9).astype(args[0].dtype), *args[1:])
                    return acc + jnp.sum(out.astype(jnp.float32))

                return jax.lax.fori_loop(0, k, body, jnp.float32(0))

            return run

        lo, hi = runner(k_lo), runner(k_hi)
        sync(lo(*args)), sync(hi(*args))
        times = {}
        for name, r in (("lo", lo), ("hi", hi)):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(r(*args))
                best = min(best, time.perf_counter() - t0)
            times[name] = best
        return (times["hi"] - times["lo"]) / (k_hi - k_lo)

    print(f"devices: {jax.devices()}", flush=True)
    B, H, W, C, Cout, s = 16, 128, 128, 64, 1, 4
    bf16 = jnp.bfloat16
    rng = np.random.default_rng(0)
    y_pm = jnp.asarray(rng.random((B, H, W, s * s * C), np.float32), dtype=bf16)
    kernel = jnp.asarray(rng.random((3, 3, C, Cout), np.float32) - 0.5)
    bias = jnp.asarray(rng.random((Cout,), np.float32))

    def current(y_pm):
        return sc.shuffle_conv_small(y_pm, kernel, bias, scale=s)

    def dense(y_pm):
        wt = kernel.reshape(9, C, Cout).transpose(1, 0, 2).reshape(C, 9 * Cout).astype(y_pm.dtype)
        eye = jnp.eye(s * s, dtype=y_pm.dtype)
        wd = jnp.einsum("ij,ab->iajb", eye, wt).reshape(s * s * C, s * s * 9 * Cout)
        z = lax.dot_general(y_pm, wd, (((3,), (0,)), ((), ())))
        z = z.reshape(B, H, W, s, s, 9, Cout)
        out = sc._phase_resolve(z, s)
        out = out + bias.astype(jnp.float32)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, s * H, s * W, Cout)
        return out.astype(y_pm.dtype)

    if not os.environ.get("SKIP_FWD"):
        # bitwise check
        a = np.asarray(current(y_pm)).astype(np.float32)
        b = np.asarray(dense(y_pm)).astype(np.float32)
        print(f"max |current - dense| = {np.abs(a - b).max()}", flush=True)

        record("tail fwd current (N=9)", op_time(current, y_pm))
        record("tail fwd dense (N=144)", op_time(dense, y_pm))

    def fwdbwd(f):
        def g(y_pm):
            # sum the FULL gradient: slicing it lets XLA DCE the backward
            return jnp.sum(
                jax.grad(lambda y: jnp.sum(f(y).astype(jnp.float32)))(y_pm).astype(jnp.float32)
            )[None]

        return g

    record("tail fwd+bwd current", op_time(fwdbwd(current), y_pm))
    record("tail fwd+bwd dense", op_time(fwdbwd(dense), y_pm))

    with open(os.path.join(HERE, "mxu_probe13.json"), "w") as f2:
        json.dump(RESULTS, f2, indent=1)


if __name__ == "__main__":
    main()
