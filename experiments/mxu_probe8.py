"""MXU probe round 8: is precision="highest" in the blur matmuls the
composition trigger?

After the pairwise-einsum rewrite the composed penalty persists (61.2 ms,
probe7).  The one remaining difference vs probe6's fast pairwise case is
the blur precision.  Rows:

  1. composed fwd+dw, SSIMLoss mix, BLUR_PRECISION=None
  2. composed fwd+dw, minimal loss = mean(_blur(abs diff)), highest
  3. same, BLUR_PRECISION=None
  4. full train step with BLUR_PRECISION=None
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
    from pssr2_tpu.ops import ssim as ssim_mod
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

    def composed(loss_of_out):
        def f(x):
            def loss(st):
                return loss_of_out(nnx.merge(gd, st)(x))

            return tree_sum(jax.grad(loss)(st))[None]

        return f

    # 1. full mix, default precision
    ssim_mod.BLUR_PRECISION = None
    record(
        "fwd+dw mix, BLUR_PRECISION=None",
        op_time(composed(lambda out: loss_fn(out / 255.0, hr / 255.0)), lr),
        flops=STEP_FLOPS,
    )
    ssim_mod.BLUR_PRECISION = "highest"

    # 2/3. minimal real-_blur loss at both precisions
    def min_blur_loss(out):
        return jnp.mean(ssim_mod._blur(jnp.abs(out - hr) / 255.0, 11, 1.5))

    record("fwd+dw mean(_blur(absdiff)) highest", op_time(composed(min_blur_loss), lr), flops=STEP_FLOPS)
    ssim_mod.BLUR_PRECISION = None
    record("fwd+dw mean(_blur(absdiff)) default", op_time(composed(min_blur_loss), lr), flops=STEP_FLOPS)

    # 4. full train step, default precision
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    model2 = ResUNet(dtype=bf16)
    model2.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model2, optim.tx, wrt=nnx.Param)
    fused_step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
    fused_step = nnx.cached_partial(fused_step, model2, optimizer)
    record(
        "full train step, BLUR_PRECISION=None",
        single_dispatch(lambda: fused_step(hr_u8, None, key, optim.lr, B, False)[0]),
        flops=STEP_FLOPS,
    )
    ssim_mod.BLUR_PRECISION = "highest"

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe8.json"), "w") as f2:
        json.dump(RESULTS, f2, indent=1)


if __name__ == "__main__":
    main()
