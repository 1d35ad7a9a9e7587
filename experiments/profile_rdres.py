"""Capture a device trace of the RDResUNet canonical train step.

Same protocol as rdresunet_train_bench.py (batch 16 bf16, 512->128 Poisson,
MS-SSIM+L1) with a jax.profiler trace around 3 steps; writes
experiments/profile_rdres/.  Analyze with analyze_xplane4.py.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "profile_rdres")


def main():
    import jax, jax.numpy as jnp
    from flax import nnx
    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import RDResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    def sync(v):
        return float(jnp.ravel(v)[0])

    B = int(os.environ.get("RDRES_BENCH_BATCH", 16))
    print(f"devices: {jax.devices()}  batch={B}", flush=True)
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 1, 512, 512)).astype(np.uint8)
    )
    model = RDResUNet(dtype=jnp.bfloat16)
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    step, _ = _build_paired_steps(
        SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch)
    )
    step = nnx.cached_partial(step, model, optimizer)

    def run():
        return step(hr_u8, None, key, optim.lr, B, False)[0]

    for _ in range(3):
        sync(run())
    t0 = time.perf_counter()
    for _ in range(6):
        out = run()
    sync(out)
    print(f"pre-trace step: {(time.perf_counter() - t0) / 6 * 1e3:.2f} ms", flush=True)

    os.makedirs(OUT, exist_ok=True)
    jax.profiler.start_trace(OUT)
    for _ in range(3):
        out = run()
    sync(out)
    jax.profiler.stop_trace()
    print("trace written to", OUT, flush=True)


if __name__ == "__main__":
    main()
