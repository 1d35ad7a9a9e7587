"""SwinIR round-3 shipping numbers on real TPU: batch-16 vs batch-1 bf16
inference (VERDICT r2 item 2 bar: batched >= 2x batch-1) and the
never-recorded SwinIR train-step throughput (batch 16, 128->512,
SSIMLoss(mix=0.8, MS), AdamW — the canonical config with the SwinIR
model swapped in)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.models import SwinIR

    def sync(v):
        return float(jnp.ravel(v)[0])

    def bench(fn, trials=6, warmup=3):
        for _ in range(warmup):
            sync(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    rng = np.random.default_rng(0)

    # --- inference: batch 16 vs batch 1, bf16, 128->512 tiles
    model = SwinIR(dtype=jnp.bfloat16)
    model.eval()
    graphdef, state = nnx.split(model)
    forward = jax.jit(lambda s, x: nnx.merge(graphdef, s)(x))
    x16 = jnp.asarray(rng.integers(0, 255, (16, 1, 128, 128)).astype(np.float32))
    x1 = x16[:1]
    ms16 = bench(lambda: forward(state, x16))
    ms1 = bench(lambda: forward(state, x1))
    results["infer_batch16_ms"] = round(ms16, 2)
    results["infer_batch16_tiles_s"] = round(16e3 / ms16, 1)
    results["infer_batch1_ms"] = round(ms1, 2)
    results["infer_batch1_tiles_s"] = round(1e3 / ms1, 1)
    results["batched_speedup"] = round((16e3 / ms16) / (1e3 / ms1), 2)
    results["batched_vs_r2_batch1_117.6"] = round((16e3 / ms16) / 117.6, 2)
    print(json.dumps(results), flush=True)

    # --- train step: batch 16, 128->512, canonical loss, scan x4
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_multi_train_step
    from pssr2_tpu.util import SSIMLoss

    tmodel = SwinIR(dtype=jnp.bfloat16)
    tmodel.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(tmodel, optim.tx, wrt=nnx.Param)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    spd = 4
    multi = _build_multi_train_step(
        SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch)
    )
    multi = nnx.cached_partial(multi, tmodel, optimizer)
    hr_u8 = jnp.asarray(rng.integers(0, 255, (16, 1, 512, 512)).astype(np.uint8))
    batches = jnp.stack([hr_u8] * spd)
    keys = jax.random.split(jax.random.key(0), spd)
    ms = bench(lambda: multi(batches, None, keys, optim.lr), trials=5, warmup=2)
    step_ms = ms / spd
    results["train_step_ms"] = round(step_ms, 2)
    results["train_patches_s"] = round(16e3 / step_ms, 1)
    print(json.dumps({k: results[k] for k in ("train_step_ms", "train_patches_s")}), flush=True)

    with open(os.path.join(os.path.dirname(__file__), "swinir_bench_r3.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
