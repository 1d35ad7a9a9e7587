"""Probe44: fused RDNet block-tail kernel (ops/pallas/rdtail) on the full
canonical RDResUNet train step, interleaved protocol (see mxu_probe37).

Hypothesis (profile_rdres attribution): the encoder spends ~14 ms/step on
the LN -> fc1 -> GELU -> fc2 family against a ~5 ms MXU floor — the inter
tensor round-trips HBM fwd+bwd and LN stats/apply are separate fusions.
One Pallas pass per row chunk (fwd) + one VJP pass (bwd) should recover a
few ms.  ORDER probes whether the hwnc row view really bitcasts (the
conv emitter's physical activation layout) vs a plain reshape.

Configs: off (XLA baseline), hwnc, nhwc.  Also records each config's loss
value to confirm numerics class (poly gelu on bf16: bf16-rounding class).
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
    from pssr2_tpu.models import RDResUNet
    from pssr2_tpu.ops.pallas import rdtail
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

    configs = [("off", "hwnc"), ("auto", "hwnc"), ("auto", "nhwc")]
    steps = []
    losses = {}
    for mode, order in configs:
        rdtail.MODE = mode
        rdtail.ORDER = order
        model = RDResUNet(dtype=jnp.bfloat16)
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

        name = f"{mode}/{order}" if mode != "off" else "off"
        losses[name] = sync(run())
        for _ in range(2):
            sync(run())
        steps.append((name, run, mode, order))
        print(f"compiled {name}: loss {losses[name]:.6f}", flush=True)
        if mode == "off":
            # off is order-independent; keep a single baseline config
            pass

    trials = {name: [] for name, *_ in steps}
    for t in range(7):
        for name, run, mode, order in steps:
            rdtail.MODE = mode
            rdtail.ORDER = order
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
    with open(os.path.join(HERE, "mxu_probe44.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
