"""RDResUNet train-step throughput on the canonical pipeline (first record).

Canonical data config (512->128 Poisson-crappified patches, MS-SSIM+L1
loss, AdamW) with the default RDResUNet x4 and bf16 compute; batch size via
RDRES_BENCH_BATCH (default 16).  Prints one JSON line.
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import RDResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    def sync(v): return float(jnp.ravel(v)[0])

    B = int(os.environ.get("RDRES_BENCH_BATCH", 16))
    print(f"devices: {jax.devices()}  batch={B}", flush=True)
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    model = RDResUNet(dtype=jnp.bfloat16)
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    step, _ = _build_paired_steps(SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch))
    step = nnx.cached_partial(step, model, optimizer)

    def run():
        return step(hr_u8, None, key, optim.lr, B, False)[0]

    for _ in range(3):
        sync(run())
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(6):
            out = run()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / 6)
    out = {
        "metric": f"RDResUNet x4 train step, 512->128 crappified patches (batch {B}, bf16, MS-SSIM+L1)",
        "step_ms": round(best * 1e3, 2),
        "patches_per_sec": round(B / best, 2),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(__file__), "rdresunet_train_bench.json"), "w") as f:
        json.dump(out, f, indent=1)

if __name__ == "__main__":
    main()
