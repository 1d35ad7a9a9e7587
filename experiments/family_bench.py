"""All-family benchmark matrix: canonical train step + batched tiled
inference for every model family the reference ships
(ResUNet/ResUNetA/RDResUNet/RDResUNetA/SwinIR).

Canonical pipeline: 512->128 Poisson-crappified patches, MS-SSIM+L1,
AdamW, batch 16, bf16 compute.  Inference: 128->512 tiles, batch 16 bf16.
Per-family one JSON line; writes family_bench.json.  FAMILIES env var
restricts (comma-separated, e.g. FAMILIES=resuneta,rdresuneta).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
B = 16


def _sync(v):
    import jax.numpy as jnp

    return float(jnp.ravel(v)[0])


def _time(fn, steps=6, trials=4):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def bench_family(name, make_model):
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    hr_u8 = jnp.asarray(rng.integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))

    model = make_model()
    model.train()
    optim = AdamW(1e-3)
    optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
    step, _ = _build_paired_steps(
        SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch)
    )
    step = nnx.cached_partial(step, model, optimizer)

    def run_train(step=step, lr=optim.lr):
        return step(hr_u8, None, key, lr, B, False)[0]

    for _ in range(3):
        _sync(run_train())
    train_s = _time(run_train)

    model.eval()
    graphdef, state = nnx.split(model)
    forward = jax.jit(lambda s, x: nnx.merge(graphdef, s)(x))
    lr_t = jnp.asarray(rng.random((B, 1, 128, 128)).astype(np.float32) * 255)

    def run_infer():
        return forward(state, lr_t)

    for _ in range(3):
        _sync(run_infer())
    infer_s = _time(run_infer, steps=8)

    out = {
        "family": name,
        "train_step_ms": round(train_s * 1e3, 2),
        "train_patches_per_sec": round(B / train_s, 1),
        "infer_ms": round(infer_s * 1e3, 2),
        "infer_tiles_per_sec": round(B / infer_s, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    from pssr2_tpu.models import RDResUNet, RDResUNetA, ResUNet, ResUNetA, SwinIR

    dt = jnp.bfloat16
    families = {
        "ResUNet": lambda: ResUNet(dtype=dt),
        "ResUNetA": lambda: ResUNetA(dtype=dt),
        "RDResUNet": lambda: RDResUNet(dtype=dt),
        "RDResUNetA": lambda: RDResUNetA(dtype=dt),
        "SwinIR": lambda: SwinIR(image_size=128, dtype=dt),
    }
    pick = os.environ.get("FAMILIES")
    if pick:
        keys = [k for k in families if k.lower() in pick.lower().split(",")]
    else:
        keys = list(families)

    path = os.path.join(HERE, "family_bench.json")
    results = {}
    if os.path.exists(path):
        results = json.load(open(path))
    for k in keys:
        results[k] = bench_family(k, families[k])
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
