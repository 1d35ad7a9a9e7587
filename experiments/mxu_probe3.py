"""MXU probe round 3: why is the full train step 71.7 ms when its parts sum
to ~30 ms (fwd+dw 23.3 @66% MXU, ms-ssim bwd 3.4, degrade 0.1)?

Triangulates the step composition:
  1. true fwd+dw (ALL param grads kept live via a full-tree reduction —
     probe2's single-leaf return let XLA DCE most dW matmuls)
  2. + SSIM loss instead of MSE
  3. + train-mode BatchNorm (batch stats in fwd, stats-grads in bwd)
  4. AdamW update alone (optax, params-sized tree)
  5. step variants single-dispatch: no-optimizer / no-degrade / full
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

    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.util import SSIMLoss

    lr = jnp.asarray(np.random.default_rng(0).random((B, 1, 128, 128), np.float32) * 255)
    hr = jnp.asarray(np.random.default_rng(1).random((B, 1, 512, 512), np.float32) * 255)
    loss_fn = SSIMLoss(mix=0.8, ms=True)

    def tree_sum(tree):
        return sum(jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(tree))

    # 1. true fwd+dw, eval BN, MSE (all grads kept)
    model = ResUNet(dtype=bf16)
    model.eval()
    gd, st = nnx.split(model)

    def fwdbwd_mse(x):
        def loss(st):
            return jnp.mean((nnx.merge(gd, st)(x) - hr) ** 2)

        return tree_sum(jax.grad(loss)(st))[None]

    record("fwd+dw ALL grads, eval BN, MSE", op_time(fwdbwd_mse, lr), flops=STEP_FLOPS)

    # 2. same with SSIM loss
    def fwdbwd_ssim(x):
        def loss(st):
            return loss_fn(nnx.merge(gd, st)(x) / 255.0, hr / 255.0)

        return tree_sum(jax.grad(loss)(st))[None]

    record("fwd+dw ALL grads, eval BN, MS-SSIM", op_time(fwdbwd_ssim, lr), flops=STEP_FLOPS)

    # 3. train-mode BN: functional state threading (mutations kept live)
    model.train()
    gdt, stt = nnx.split(model)

    def fwdbwd_ssim_train(x):
        def loss(st):
            m = nnx.merge(gdt, st)
            out = m(x)
            _, new_state = nnx.split(m)
            return loss_fn(out / 255.0, hr / 255.0), new_state

        (l, new_state), grads = jax.value_and_grad(loss, has_aux=True)(stt)
        return (tree_sum(grads) + tree_sum(jax.tree.leaves(new_state)[0]))[None]

    record("fwd+dw ALL grads, TRAIN BN, MS-SSIM", op_time(fwdbwd_ssim_train, lr), flops=STEP_FLOPS)

    # 4. AdamW update alone on a params-sized tree
    params = nnx.state(model, nnx.Param)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    def adamw_step(dummy):
        grads = jax.tree.map(lambda p: p * 1e-6 + dummy[0, 0, 0, 0].astype(p.dtype), params)
        updates, _ = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return tree_sum(new_params)[None]

    record("adamw update (59M params)", op_time(adamw_step, lr, 2, 18))

    # 5. the real step variants, single dispatch
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps

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

    # no-degrade variant (host pair path)
    host_step, _ = _build_paired_steps(loss_fn, False, None)
    host_step = nnx.cached_partial(host_step, model2, optimizer)
    hr_f = hr_u8.astype(jnp.float32)
    lr_f = jnp.asarray(np.random.default_rng(2).random((B, 1, 128, 128), np.float32) * 255)
    record(
        "train step, pre-made pairs (no degrade)",
        single_dispatch(lambda: host_step((hr_f, lr_f), None, key, optim.lr, B, False)[0]),
        flops=STEP_FLOPS,
    )

    # grads-only step (no optimizer.update), nnx path with train BN
    @nnx.jit
    def grads_only(model, batch, key):
        hr_b, lr_b = base(key, batch)

        def _loss(m):
            return loss_fn(m(lr_b) / 255.0, hr_b / 255.0)

        loss, grads = nnx.value_and_grad(_loss)(model)
        return loss

    cached_grads = nnx.cached_partial(grads_only, model2)
    record(
        "step minus optimizer (grads only)",
        single_dispatch(lambda: cached_grads(hr_u8, key)),
        flops=STEP_FLOPS,
    )

    # eval-BN variant of the full step (isolates train-BN cost)
    model3 = ResUNet(dtype=bf16)
    model3.eval()
    optimizer3 = nnx.Optimizer(model3, AdamW(1e-3).tx, wrt=nnx.Param)
    fused_step3, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
    fused_step3 = nnx.cached_partial(fused_step3, model3, optimizer3)
    record(
        "full train step, eval-mode BN",
        single_dispatch(lambda: fused_step3(hr_u8, None, key, optim.lr, B, False)[0]),
        flops=STEP_FLOPS,
    )

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe3.json"), "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
