"""MXU probe round 12: step re-measurement after the two custom VJPs
(phase-resolve head + analytic SSIM moment arithmetic).

Also measures the loss standalone fwd+grad (previously only fwd was
measured, which produced the false "composition penalty" framing).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []
PEAK = 197e12
HERE = os.path.dirname(os.path.abspath(__file__))


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

    def single_dispatch(fn, n_steps=8, trials=4):
        for _ in range(3):
            sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(n_steps):
                out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    bf16 = jnp.bfloat16
    key = jax.random.key(0)
    STEP_FLOPS = 3 * 63.3e9 * B

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    lr = jnp.asarray(np.random.default_rng(0).random((B, 1, 128, 128), np.float32) * 255)
    hr = jnp.asarray(np.random.default_rng(1).random((B, 1, 512, 512), np.float32) * 255)
    loss_fn = SSIMLoss(mix=0.8, ms=True)

    # loss standalone fwd+grad w.r.t. prediction
    def loss_grad(x):
        big = jax.image.resize(x, (B, 1, 512, 512), "nearest")  # stand-in pred

        def f(big):
            return loss_fn(big / 255.0, hr / 255.0)

        return jnp.sum(jax.grad(f)(big))[None]

    record("loss fwd+grad standalone (incl resize)", op_time(loss_grad, lr))

    model = ResUNet(dtype=bf16)
    model.eval()
    gd, st = nnx.split(model)

    def tree_sum(tree):
        return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(tree))

    def fwdbwd_mix(x):
        def loss(st):
            return loss_fn(nnx.merge(gd, st)(x) / 255.0, hr / 255.0)

        return tree_sum(jax.grad(loss)(st))[None]

    record("fwd+dw mix (both custom VJPs)", op_time(fwdbwd_mix, lr), flops=STEP_FLOPS)

    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    model2 = ResUNet(dtype=bf16)
    model2.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model2, optim.tx, wrt=nnx.Param)
    fused_step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
    fused_step = nnx.cached_partial(fused_step, model2, optimizer)
    record(
        "full train step (fused, train BN)",
        single_dispatch(lambda: fused_step(hr_u8, None, key, optim.lr, B, False)[0]),
        flops=STEP_FLOPS,
    )

    with open(os.path.join(HERE, "mxu_probe12.json"), "w") as f2:
        json.dump(RESULTS, f2, indent=1)


if __name__ == "__main__":
    main()
