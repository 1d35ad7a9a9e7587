"""MXU probe round 9: batched-blur _ssim_parts + step-overhead variants.

Probe 8 localized the loss penalty to ~2 ms PER composed blur; _ssim_parts
now batches its five blurs into one.  Re-measure the composed mix and the
full step, then run the step-overhead variants (probe 5's plan):
lean nnx step and a donated functional optax step.
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
    import optax
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

    model = ResUNet(dtype=bf16)
    model.eval()
    gd, st = nnx.split(model)

    def tree_sum(tree):
        return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(tree))

    def f(x):
        def loss(st):
            return loss_fn(nnx.merge(gd, st)(x) / 255.0, hr / 255.0)

        return tree_sum(jax.grad(loss)(st))[None]

    record("fwd+dw mix, batched-blur ssim", op_time(f, lr), flops=STEP_FLOPS)

    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))

    model2 = ResUNet(dtype=bf16)
    model2.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model2, optim.tx, wrt=nnx.Param)
    fused_step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
    fused_step = nnx.cached_partial(fused_step, model2, optimizer)
    record(
        "full train step (fused)",
        single_dispatch(lambda: fused_step(hr_u8, None, key, optim.lr, B, False)[0]),
        flops=STEP_FLOPS,
    )

    # lean nnx step: no returned tensors, no _set_lr
    model3 = ResUNet(dtype=bf16)
    model3.train()
    optimizer3 = nnx.Optimizer(model3, optim.tx, wrt=nnx.Param)

    @nnx.jit
    def lean_step(model, optimizer, batch, key):
        hr_b, lr_b = base(key, batch)

        def _loss(m):
            return loss_fn(m(lr_b) / 255.0, hr_b / 255.0)

        loss, grads = nnx.value_and_grad(_loss)(model)
        optimizer.update(model, grads)
        return loss

    lean = nnx.cached_partial(lean_step, model3, optimizer3)
    record("step lean nnx (no tensors/set_lr)", single_dispatch(lambda: lean(hr_u8, key)), flops=STEP_FLOPS)

    # functional jax.jit step with optax, donated state
    model4 = ResUNet(dtype=bf16)
    model4.train()
    gd4, params, rest = nnx.split(model4, nnx.Param, ...)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    def fn_step(params, rest, opt_state, batch, key):
        hr_b, lr_b = base(key, batch)

        def _loss(params):
            m = nnx.merge(gd4, params, rest)
            hr_hat = m(lr_b)
            _, _, new_rest = nnx.split(m, nnx.Param, ...)
            return loss_fn(hr_hat / 255.0, hr_b / 255.0), new_rest

        (loss, new_rest), grads = jax.value_and_grad(_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_rest, opt_state, loss

    fn_step_d = jax.jit(fn_step, donate_argnums=(0, 1, 2))
    state = [params, rest, opt_state]

    def run_functional():
        p, r, o, loss = fn_step_d(state[0], state[1], state[2], hr_u8, key)
        state[0], state[1], state[2] = p, r, o
        return loss

    record("step functional optax donated", single_dispatch(run_functional), flops=STEP_FLOPS)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe9.json"), "w") as f2:
        json.dump(RESULTS, f2, indent=1)


if __name__ == "__main__":
    main()
