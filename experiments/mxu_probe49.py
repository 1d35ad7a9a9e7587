"""Probe49 (probe46 protocol; r4 shipping state: chain+VMEM-transposes+cin-pad entry+reshape-max pooling): fused conv+BN-stat chain (ops/pallas/convchain) on the full
canonical ResUNet train step, interleaved protocol (see mxu_probe37/44).

Hypothesis (results_r3.md floor table): the C=64 @128^2 enc0/dec3 conv
family + its BN stat machinery (4.78 ms of the 9.7 ms stat total, plus
conv lane-fill slack) can drop several ms when each layer runs as one
(N,H,C,W) Pallas pass — W on lanes (exact fill), BN apply+ReLU as
prologue, (sum, sum^2) as the f32 epilogue, whole-layer VJP for training
(the probe44/rdtail pattern applied to the ResBlock conv family).

Standalone micros are useless here (probe45: every config sits at the
~1.5 ms tunnel dispatch floor); this is the composed measurement that
decides shipping.  Records each config's loss for the numerics class.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.ops.pallas import convchain
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    rng = np.random.default_rng(0)
    hr_u8 = jnp.asarray(rng.integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)

    def sync(v):
        return float(jnp.ravel(v)[0])

    configs = ["off", "auto"]
    steps = []
    losses = {}
    for mode in configs:
        convchain.MODE = mode
        model = ResUNet(dtype=jnp.bfloat16)
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        step, _ = _build_paired_steps(
            SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch)
        )
        step = nnx.cached_partial(step, model, optimizer)

        def run(step=step, lr=optim.lr):
            loss, _, _ = step(hr_u8, None, key, lr, B, False)
            return loss

        losses[mode] = sync(run())
        for _ in range(2):
            sync(run())
        steps.append((mode, run))
        print(f"compiled {mode}: loss {losses[mode]:.6f}", flush=True)

    trials = {name: [] for name, _ in steps}
    for t in range(7):
        for name, run in steps:
            convchain.MODE = name
            t0 = time.perf_counter()
            for _ in range(8):
                out = run()
            sync(out)
            trials[name].append(round((time.perf_counter() - t0) / 8 * 1e3, 3))
        print(json.dumps({"trial": t, **{n: trials[n][-1] for n in trials}}), flush=True)

    results = {
        name: {"median_ms": sorted(v)[len(v) // 2], "trials": v} for name, v in trials.items()
    }
    results["losses"] = losses
    print(json.dumps(results), flush=True)
    with open(os.path.join(HERE, "mxu_probe49.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
