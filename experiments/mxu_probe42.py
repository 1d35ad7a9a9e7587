"""Probe42: the layout-matched Pallas chanstats mode ("tpallas") on the
full canonical step, interleaved protocol (see mxu_probe37).

tpallas feeds the Pallas dual-sum kernel the TRANSPOSED logical view
(H, W, N, C) -> (-1, C) whose default layout coincides with the conv
emitter's physical activation layout — testing whether the round-2
composed +6.5 ms was purely the relayout copies of the UNtransposed
operands (mxu_probe16), i.e. whether the kernel can finally stream the
BN stats at its standalone ~680 GB/s inside the step.

"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

# probe37 winner: (Z_RESOLVE, Z_BARRIER)
BASE_RESOLVE = os.environ.get("P42_RESOLVE", "slices")
BASE_BARRIER = os.environ.get("P42_BARRIER", "1") == "1"
BASE_FWD = os.environ.get("P42_FWD", "axes")


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.ops import batchnorm as bn
    from pssr2_tpu.ops import smallconv as sc
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    rng = np.random.default_rng(0)
    hr_u8 = jnp.asarray(rng.integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)
    sc.Z_RESOLVE = BASE_RESOLVE
    sc.Z_BARRIER = BASE_BARRIER

    def sync(v):
        return float(jnp.ravel(v)[0])

    configs = [
        ("axes", "axes"),
        ("tpallas", "axes"),
        ("axes", "tpallas"),
        ("tpallas", "tpallas"),
    ]
    steps = []
    for fwd_mode, bwd_mode in configs:
        bn.STATS_FWD = fwd_mode
        bn.STATS_BWD = bwd_mode
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

        for _ in range(3):
            sync(run())
        steps.append((f"fwd={fwd_mode}/bwd={bwd_mode}", run))
        print(f"compiled {steps[-1][0]}", flush=True)

    trials = {name: [] for name, _ in steps}
    for t in range(7):
        for name, run in steps:
            t0 = time.perf_counter()
            for _ in range(8):
                out = run()
            sync(out)
            trials[name].append(round((time.perf_counter() - t0) / 8 * 1e3, 3))
        print(json.dumps({"trial": t, **{n: trials[n][-1] for n in trials}}), flush=True)

    results = {
        name: {"median_ms": sorted(v)[len(v) // 2], "trials": v} for name, v in trials.items()
    }
    print(json.dumps(results), flush=True)
    with open(os.path.join(HERE, "mxu_probe42.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
