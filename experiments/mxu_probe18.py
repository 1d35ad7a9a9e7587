"""MXU probe round 18: full fused step with SGBias convs + jnp BN stats (post probe16/17 reversals;
BN, ops/batchnorm.py) — target the ~13 ms/step of fragmented BN fusions
found in the profiler capture."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    def sync(v): return float(jnp.ravel(v)[0])
    def single_dispatch(fn, n_steps=8, trials=4):
        for _ in range(3): sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(n_steps): out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / n_steps)
        return best

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    model = ResUNet(dtype=jnp.bfloat16)
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    step, _ = _build_paired_steps(SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch))
    step = nnx.cached_partial(step, model, optimizer)
    ms = single_dispatch(lambda: step(hr_u8, None, key, optim.lr, B, False)[0]) * 1e3
    out = {"name": "full step, SGBias convs", "step_ms": round(ms, 3)}
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(__file__), "mxu_probe18.json"), "w") as f:
        json.dump([out], f, indent=1)

if __name__ == "__main__":
    main()
