"""MXU probe round 17: (a) upper bound of folding/removing conv biases
(the ~15 separate bias-grad reductions seen in the profiler), measured by
stripping every conv bias from the model; (b) moving the tail barrier
after the 7-D reshape (to kill the 0.84 ms of z relayout copies).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = []
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    def sync(v):
        return float(jnp.ravel(v)[0])

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

    def step_ms(model):
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        base = make_device_gen_pair(4, Poisson(), None, augment=True)
        step, _ = _build_paired_steps(
            SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch)
        )
        step = nnx.cached_partial(step, model, optimizer)
        key = jax.random.key(0)
        hr_u8 = jnp.asarray(
            np.random.default_rng(0).integers(0, 255, (16, 1, 512, 512)).astype(np.uint8)
        )
        return single_dispatch(lambda: step(hr_u8, None, key, optim.lr, 16, False)[0]) * 1e3

    def record(name, ms):
        entry = {"name": name, "step_ms": round(ms, 3)}
        RESULTS.append(entry)
        print(json.dumps(entry), flush=True)
        with open(os.path.join(HERE, "mxu_probe17.json"), "w") as f:
            json.dump(RESULTS, f, indent=1)

    print(f"devices: {jax.devices()}", flush=True)
    bf16 = jnp.bfloat16

    # (a) strip every conv bias
    model = ResUNet(dtype=bf16)
    n_stripped = 0
    for _, mod in model.iter_modules():
        if isinstance(mod, nnx.Conv) and mod.bias is not None:
            mod.bias = None
            mod.use_bias = False
            n_stripped += 1
    print(f"stripped {n_stripped} conv biases", flush=True)
    record("step, all conv biases stripped", step_ms(model))

    # (b) barrier after the 7-D reshape
    from pssr2_tpu.ops import smallconv as sc

    sc.Z_BARRIER_POS = "post"
    record("step, barrier post-reshape", step_ms(ResUNet(dtype=bf16)))
    sc.Z_BARRIER_POS = "pre"


if __name__ == "__main__":
    main()
