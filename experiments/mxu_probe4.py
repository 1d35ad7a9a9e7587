"""MXU probe round 4: the MS-SSIM composition penalty.

Probe 3 found: fwd+dw(ALL grads) with MSE = 37.9 ms but with the canonical
MS-SSIM+L1 mix = 61.3 ms — +23 ms, although the loss alone (fwd+bwd) is
3.4 ms.  This probe measures remedies on the composed graph (model fwd +
loss + full param grads, eval BN), all at the canonical config:

  - ssim single-scale / L1-only / ms-only (which term carries the cost?)
  - jax.checkpoint around the loss (recompute instead of holding maps)
  - blur matmuls at default precision instead of "highest"
  - loss computed in bf16
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
    from pssr2_tpu.util import SSIMLoss
    from pssr2_tpu.ops import ssim as ssim_mod

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

    full = SSIMLoss(mix=0.8, ms=True)
    ms_only = SSIMLoss(mix=1.0, ms=True)
    ss_only = SSIMLoss(mix=1.0, ms=False)
    l1_only = SSIMLoss(mix=0.0, ms=True)

    cases = [
        ("mix(ms-ssim,l1) [canonical]", lambda out: full(out / 255.0, hr / 255.0)),
        ("ms-ssim only", lambda out: ms_only(out / 255.0, hr / 255.0)),
        ("ssim single-scale only", lambda out: ss_only(out / 255.0, hr / 255.0)),
        ("windowed-L1 only", lambda out: l1_only(out / 255.0, hr / 255.0)),
        ("mix under jax.checkpoint", jax.checkpoint(lambda out: full(out / 255.0, hr / 255.0))),
        ("mix in bf16", lambda out: full((out / 255.0).astype(bf16), (hr / 255.0).astype(bf16))),
    ]
    for name, loss_fn in cases:
        record(f"fwd+dw {name}", op_time(fwdbwd(loss_fn), lr), flops=STEP_FLOPS)

    # default-precision blur matmuls
    ssim_mod.BLUR_PRECISION = None
    record(
        "fwd+dw mix, blur precision=default",
        op_time(fwdbwd(lambda out: full(out / 255.0, hr / 255.0)), lr),
        flops=STEP_FLOPS,
    )
    ssim_mod.BLUR_PRECISION = "highest"

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe4.json"), "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
