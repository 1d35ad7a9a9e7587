"""MXU probe round 6: bisect the loss-composition penalty.

Probe 4: ANY loss touching the Gaussian-blur path costs ~+23 ms on the
composed fwd+dw (vs plain MSE), regardless of precision/dtype/remat.
Bisect which structural element triggers it, all on the composed graph:

  - plain mean(abs(diff))            (no blur, no pad)
  - pad + mean                        (pad only)
  - one einsum blur, default prec     (blur only, H dim only)
  - full separable blur as two explicit dot_generals
  - blur with band matrices passed as ARGUMENTS (not embedded constants)
  - depthwise-conv blur (lax.conv, C=1)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []
PEAK = 197e12


def record(name, seconds, flops=0):
    entry = {
        "name": name,
        "ms": round(seconds * 1e3, 3),
        "mxu_pct": round(100 * flops / seconds / PEAK, 1) if flops else None,
    }
    RESULTS.append(entry)
    print(json.dumps(entry), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from jax import lax

    def sync(v):
        return float(jnp.ravel(v)[0])

    def op_time(fn, x, k_lo=2, k_hi=10, reps=3):
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
        times = {}
        for name, r in (("lo", lo), ("hi", hi)):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(r(x))
                best = min(best, time.perf_counter() - t0)
            times[name] = best
        return (times["hi"] - times["lo"]) / (k_hi - k_lo)

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    bf16 = jnp.bfloat16
    STEP_FLOPS = 3 * 63.3e9 * B

    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.ops.ssim import _band_matrix

    lr = jnp.asarray(np.random.default_rng(0).random((B, 1, 128, 128), np.float32) * 255)
    hr = jnp.asarray(np.random.default_rng(1).random((B, 1, 512, 512), np.float32) * 255)

    model = ResUNet(dtype=bf16)
    model.eval()
    gd, st = nnx.split(model)

    def tree_sum(tree):
        return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(tree))

    def fwdbwd(loss_of_out):
        def f(x):
            def loss(st):
                return loss_of_out(nnx.merge(gd, st)(x))

            return tree_sum(jax.grad(loss)(st))[None]

        return f

    gh = jnp.asarray(_band_matrix(512, 11, 1.5))  # (512, 502)

    cases = [
        ("mean abs diff (no blur)", lambda out: jnp.mean(jnp.abs(out - hr) / 255.0)),
        (
            "pad + mean sq",
            lambda out: jnp.mean(jnp.pad((out - hr) / 255.0, ((0, 0), (0, 0), (5, 5), (5, 5))) ** 2),
        ),
        (
            "one einsum blur (H only)",
            lambda out: jnp.mean(jnp.einsum("bchw,hi->bciw", (out - hr) / 255.0, gh)),
        ),
        (
            "two dot_general blurs",
            lambda out: jnp.mean(
                jnp.einsum(
                    "bciw,wj->bcij",
                    jnp.einsum("bchw,hi->bciw", jnp.abs(out - hr) / 255.0, gh),
                    gh,
                )
            ),
        ),
        (
            "depthwise-conv blur (C=1)",
            lambda out: jnp.mean(
                lax.conv_general_dilated(
                    jnp.abs(out - hr) / 255.0,
                    jnp.ones((11, 1, 1, 1), jnp.float32) / 11.0,
                    (1, 1),
                    "VALID",
                    dimension_numbers=("NCHW", "HWIO", "NCHW"),
                )
            ),
        ),
    ]
    for name, loss_fn in cases:
        record(f"fwd+dw {name}", op_time(fwdbwd(loss_fn), lr), flops=STEP_FLOPS)

    # band matrices as traced arguments instead of embedded constants
    def loss_arg_blur(out, gh_arg):
        d = jnp.abs(out - hr) / 255.0
        return jnp.mean(jnp.einsum("bciw,wj->bcij", jnp.einsum("bchw,hi->bciw", d, gh_arg), gh_arg))

    def f_argblur(x):
        def loss(st):
            return loss_arg_blur(nnx.merge(gd, st)(x), gh)

        return tree_sum(jax.grad(loss)(st))[None]

    record("fwd+dw blur, band matrix as arg", op_time(f_argblur, lr), flops=STEP_FLOPS)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe6.json"), "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
