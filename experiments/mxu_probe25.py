"""MXU probe 25: canonical full-step A/B of the fused Pallas SSIM kernel
(ops/pallas/ssimfused) vs the XLA map path, plus a standalone loss micro."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.ops.pallas import ssimfused
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    def sync(v): return float(jnp.ravel(v)[0])
    def bench(fn, n_steps=8, trials=4):
        for _ in range(3): sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(n_steps): out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best * 1e3

    print(f"devices: {jax.devices()}", flush=True)
    results = []
    B = 16
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    optim = AdamW(1e-3)

    # standalone loss micro (fwd+bwd under jit), both modes
    loss_fn = SSIMLoss(mix=0.8, ms=True)
    x = jnp.asarray(np.random.default_rng(1).random((B, 1, 512, 512), np.float32))
    y = jnp.asarray(np.random.default_rng(2).random((B, 1, 512, 512), np.float32))
    grad_loss = jax.jit(jax.value_and_grad(lambda a, b: loss_fn(a, b)))
    variants = [("off", None), ("auto", "highest")]  # Mosaic rejects precision=HIGH
    for mode, prec in variants:
        ssimfused.MODE = mode
        if prec is not None:
            ssimfused.DOT_PRECISION = prec
            ssimfused._fused_fn.cache_clear()
        grad_loss_m = jax.jit(jax.value_and_grad(lambda a, b: loss_fn(a, b)))
        v0 = float(grad_loss_m(x, y)[0])
        ms = bench(lambda: grad_loss_m(x, y)[1])
        row = {"what": f"loss micro fwd+bwd mode={mode} prec={prec}", "ms": round(ms, 3), "loss": v0}
        print(json.dumps(row), flush=True)
        results.append(row)

    # full canonical step
    for mode, prec in variants:
        ssimfused.MODE = mode
        if prec is not None:
            ssimfused.DOT_PRECISION = prec
            ssimfused._fused_fn.cache_clear()
        model = ResUNet(dtype=jnp.bfloat16)
        model.train()
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
        step = nnx.cached_partial(step, model, optimizer)
        loss0 = float(step(hr_u8, None, key, optim.lr, B, False)[0])
        ms = bench(lambda: step(hr_u8, None, key, optim.lr, B, False)[0])
        row = {"what": f"full step mode={mode} prec={prec}", "step_ms": round(ms, 3), "loss": loss0}
        print(json.dumps(row), flush=True)
        results.append(row)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe25.json"), "w") as f:
        json.dump(results, f, indent=1)

if __name__ == "__main__":
    main()
