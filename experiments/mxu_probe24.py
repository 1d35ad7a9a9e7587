"""MXU probe 24: canonical full-step A/B of the round-3 levers —
lane-folded C<=64 stages (models/resunet.FOLD_LANES) x bf16 loss."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.models import resunet as resunet_mod
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

    for fold, loss_bf16 in [(False, False), (True, False), (True, True), (False, True)]:
        resunet_mod.FOLD_LANES = fold
        loss_fn = SSIMLoss(mix=0.8, ms=True, dtype=jnp.bfloat16 if loss_bf16 else None)
        model = ResUNet(dtype=jnp.bfloat16)
        model.train()
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        step, _ = _build_paired_steps(loss_fn, False, lambda key, batch, augment: base(key, batch))
        step = nnx.cached_partial(step, model, optimizer)
        loss0 = float(step(hr_u8, None, key, optim.lr, B, False)[0])
        ms = bench(lambda: step(hr_u8, None, key, optim.lr, B, False)[0])
        row = {"fold": fold, "loss_bf16": loss_bf16, "step_ms": round(ms, 3), "loss": loss0}
        print(json.dumps(row), flush=True)
        results.append(row)
    resunet_mod.FOLD_LANES = "auto"

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe24.json"), "w") as f:
        json.dump(results, f, indent=1)

if __name__ == "__main__":
    main()
