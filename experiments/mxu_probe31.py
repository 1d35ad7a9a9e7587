"""MXU probe 31: canonical train-step batch scaling (8/16/32) — how much
of the ~27 ms non-conv overhead is batch-independent.  Conv roofline at
batch 16 is ~15.4 ms (3.04 TF / 197 TF/s); patches/sec should rise
sharply with batch if the overhead is fixed-cost."""
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
    from pssr2_tpu.train import _build_multi_train_step
    from pssr2_tpu.util import SSIMLoss

    def sync(v):
        return float(jnp.ravel(v)[0])

    print(f"devices: {jax.devices()}", flush=True)
    results = []
    rng = np.random.default_rng(0)
    spd = 4
    for batch in (16, 32, 8):
        model = ResUNet(dtype=jnp.bfloat16)
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        base = make_device_gen_pair(4, Poisson(), None, augment=True)
        multi = _build_multi_train_step(
            SSIMLoss(mix=0.8, ms=True), False,
            lambda key, b, augment: base(key, b),
        )
        multi = nnx.cached_partial(multi, model, optimizer)
        hr_u8 = jnp.asarray(
            rng.integers(0, 255, (batch, 1, 512, 512)).astype(np.uint8)
        )
        batches = jnp.stack([hr_u8] * spd)
        keys = jax.random.split(jax.random.key(0), spd)
        try:
            fn = lambda: multi(batches, None, keys, optim.lr)
            for _ in range(2):
                sync(fn())
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                out = fn()
                sync(out)
                best = min(best, time.perf_counter() - t0)
            step_ms = best * 1e3 / spd
            row = {"batch": batch, "step_ms": round(step_ms, 2),
                   "patches_s": round(batch * 1e3 / step_ms, 1),
                   "mfu_pct": round(100 * (63.3e9 * 3 * batch / (step_ms / 1e3)) / 197e12, 1)}
        except Exception as e:
            row = {"batch": batch, "error": str(e)[:200]}
        print(json.dumps(row), flush=True)
        results.append(row)

    with open(os.path.join(os.path.dirname(__file__), "mxu_probe31.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
