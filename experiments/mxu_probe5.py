"""MXU probe round 5: the residual step overhead.

Probe 3: grads(train BN, MS-SSIM) = 63.4 ms, adamw alone = 0.9 ms, degrade
= 0.1 ms — but the real fused train step is 71.7 ms.  This probe varies the
actual `_build_paired_steps` step to find the ~8 ms:

  - as-is
  - without the returned (lr, hr_hat, hr) tensors
  - without _set_lr (fixed lr transformation)
  - plain jax.jit functional step with optax (no nnx plumbing), donated
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

    loss_fn = SSIMLoss(mix=0.8, ms=True)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))

    # 1. as-is
    model = ResUNet(dtype=bf16)
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    fused_step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
    fused_step = nnx.cached_partial(fused_step, model, optimizer)
    record(
        "step as-is",
        single_dispatch(lambda: fused_step(hr_u8, None, key, optim.lr, B, False)[0]),
        flops=STEP_FLOPS,
    )

    # 2. lean nnx step: no returned tensors, no _set_lr
    model2 = ResUNet(dtype=bf16)
    model2.train()
    optimizer2 = nnx.Optimizer(model2, optim.tx, wrt=nnx.Param)

    @nnx.jit
    def lean_step(model, optimizer, batch, key):
        hr, lr = base(key, batch)

        def _loss(m):
            hr_hat = m(lr)
            return loss_fn(hr_hat / 255.0, hr / 255.0)

        loss, grads = nnx.value_and_grad(_loss)(model)
        optimizer.update(model, grads)
        return loss

    lean = nnx.cached_partial(lean_step, model2, optimizer2)
    record("step lean nnx (no tensors/set_lr)", single_dispatch(lambda: lean(hr_u8, key)), flops=STEP_FLOPS)

    # 3. functional jax.jit step with optax, donated state
    model3 = ResUNet(dtype=bf16)
    model3.train()
    gd, params, rest = nnx.split(model3, nnx.Param, ...)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def fn_step(params, rest, opt_state, batch, key):
        hr, lr = base(key, batch)

        def _loss(params):
            m = nnx.merge(gd, params, rest)
            hr_hat = m(lr)
            _, _, new_rest = nnx.split(m, nnx.Param, ...)
            return loss_fn(hr_hat / 255.0, hr / 255.0), new_rest

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

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe5.json"), "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
