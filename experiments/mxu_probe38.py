"""Probe38: BN stat-reduction layout modes (STATS_FWD/STATS_BWD "axes")
on the full canonical step, interleaved protocol (see mxu_probe37).

Hypothesis (results_r3.md, physical-layout section): the (-1, C) reshape
feeding the stat reduces is a strided walk of the conv emitter's physical
activation layout (C in lanes, N in sublanes), and the collapsed shape
pins the fusion emitter's iteration order — reducing the raw NHWC tensor
over axes (0, 1, 2) lets XLA pick the walk.  The BN stat machinery is the
single biggest family in the r3c attribution (9.7 ms of the 40.9 ms
step, each fusion ~2.5x over its lane-padded byte floor).

Base config comes from probe37's winner (set below before running).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

# probe37 winner: (Z_RESOLVE, Z_BARRIER)
BASE_RESOLVE = os.environ.get("P38_RESOLVE", "slices")
BASE_BARRIER = os.environ.get("P38_BARRIER", "1") == "1"
BASE_FWD = os.environ.get("P38_FWD", "dual")


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
        (BASE_FWD, "dual"),
        ("axes", "dual"),
        (BASE_FWD, "axes"),
        ("axes", "axes"),
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
    with open(os.path.join(HERE, "mxu_probe38.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
