"""MXU probe round 11: (a) is the ~7 ms step overhead real device time or
tunnel dispatch?  (b) where does the MSE backward's 22 ms over roofline sit?

(a) The full train step measured back-to-back (single_dispatch) vs wrapped
in a fori_loop (slope harness, no per-step dispatch).  The fori form needs
a pure-functional step: optax directly + eval-mode BN (probe 9's functional
variant crashed mutating BatchStat under the grad trace; eval BN sidesteps
it and costs a known ~2 ms vs train BN).

(b) Per-block fwd and fwd+dw at the canonical stage shapes, bf16, B=16.
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
    import optax
    from flax import nnx

    def sync(v):
        return float(jnp.ravel(v)[0])

    def op_time(fn, *args, k_lo=2, k_hi=10, reps=3):
        def runner(k):
            @jax.jit
            def run(*args):
                def body(i, acc):
                    out = fn(*((args[0] + (i * 1e-9).astype(args[0].dtype),) + args[1:]))
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
    from pssr2_tpu.util import SSIMLoss

    loss_fn = SSIMLoss(mix=0.8, ms=True)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))

    # ---- (a) functional donated step, eval BN, fori vs dispatch ----------
    model = ResUNet(dtype=bf16)
    model.eval()  # BN in eval: no BatchStat mutation -> pure functional
    gd, params, rest = nnx.split(model, nnx.Param, ...)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    def fn_step(params, opt_state, batch, key):
        hr_b, lr_b = base(key, batch)

        def _loss(params):
            m = nnx.merge(gd, params, rest)
            return loss_fn(m(lr_b) / 255.0, hr_b / 255.0)

        loss, grads = jax.value_and_grad(_loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    fn_step_d = jax.jit(fn_step, donate_argnums=(0, 1))
    state = [params, opt_state]

    def run_functional():
        p, o, loss = fn_step_d(state[0], state[1], hr_u8, key)
        state[0], state[1] = p, o
        return loss

    record("functional step evalBN, dispatch", single_dispatch(run_functional), flops=STEP_FLOPS)

    # same step inside fori_loop: zero per-step dispatch
    def fori_runner(k):
        @jax.jit
        def run(params, opt_state, batch, key):
            def body(i, carry):
                params, opt_state, acc = carry
                params, opt_state, loss = fn_step(params, opt_state, batch, jax.random.fold_in(key, i))
                return params, opt_state, acc + loss.astype(jnp.float32)

            _, _, acc = jax.lax.fori_loop(0, k, body, (params, opt_state, jnp.float32(0)))
            return acc

        return run

    params2, opt2 = nnx.split(ResUNet(dtype=bf16), nnx.Param, ...)[1], None
    model_f = ResUNet(dtype=bf16)
    model_f.eval()
    _, params2, rest2 = nnx.split(model_f, nnx.Param, ...)
    opt2 = tx.init(params2)
    lo, hi = fori_runner(2), fori_runner(6)
    sync(lo(params2, opt2, hr_u8, key)), sync(hi(params2, opt2, hr_u8, key))
    times = {}
    for name, r in (("lo", lo), ("hi", hi)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(r(params2, opt2, hr_u8, key))
            best = min(best, time.perf_counter() - t0)
        times[name] = best
    record("functional step evalBN, fori slope", (times["hi"] - times["lo"]) / 4, flops=STEP_FLOPS)

    # nnx fused step with eval BN for an apples-to-apples dispatch number
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps

    model3 = ResUNet(dtype=bf16)
    model3.eval()
    optim = AdamW(1e-3)
    optimizer3 = nnx.Optimizer(model3, optim.tx, wrt=nnx.Param)
    fused_step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
    fused_step = nnx.cached_partial(fused_step, model3, optimizer3)
    record(
        "nnx fused step evalBN, dispatch",
        single_dispatch(lambda: fused_step(hr_u8, None, key, optim.lr, B, False)[0]),
        flops=STEP_FLOPS,
    )

    # ---- (b) per-block fwd / fwd+dw decomposition -------------------------
    model_b = ResUNet(dtype=bf16)
    model_b.eval()

    stages = []
    res = 128
    in_c = 1
    for i, enc in enumerate(model_b.encoder):
        stages.append((f"enc{i+1} @{res}", enc, (B, res, res, in_c)))
        in_c = [64, 128, 256, 512, 1024][i]
        if i + 1 < len(model_b.encoder):
            res //= 2
    res = 16
    dec_in = [768, 384, 192, 96]
    for i, dec in enumerate(model_b.decoder):
        stages.append((f"dec{i+1} @{res}", dec, (B, res, res, dec_in[i])))
        res *= 2
    stages.append(("recon @128", model_b.reconstruction, (B, 128, 128, 65)))

    for name, block, shape in stages:
        x = jnp.asarray(np.random.default_rng(0).random(shape, np.float32), dtype=bf16)
        gd_b, st_b = nnx.split(block)

        def fwd(x):
            return jnp.sum(nnx.merge(gd_b, st_b)(x).astype(jnp.float32))[None]

        def fwdbwd(x):
            def loss(st):
                return jnp.sum(nnx.merge(gd_b, st)(x).astype(jnp.float32))

            g = jax.grad(loss)(st_b)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))[None]

        record(f"fwd {name}", op_time(fwd, x))
        record(f"fwd+dw {name}", op_time(fwdbwd, x))

    with open(os.path.join(HERE, "mxu_probe11.json"), "w") as f2:
        json.dump(RESULTS, f2, indent=1)


if __name__ == "__main__":
    main()
