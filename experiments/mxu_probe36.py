"""Probe36: full canonical train step A/B of the phase-resolve
formulation (ops/smallconv.Z_RESOLVE) x the z optimization barrier.

The conv form replaces the nine extended-view slice-adds (plus their
custom-VJP transpose) with one 3x3 selection conv fwd + one transpose
conv bwd — no phase-extended tensors materialized.  The z barrier existed
to keep XLA from fusing the z dot into the slice-resolve (probe14/21:
removal +12 ms under slices); under the conv form the consumer is a conv,
so the barrier may be retirable — measured here, full-step, same protocol
as probe24 (dispatch-inclusive, 8-step trials, fetch-synced).
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

    def sync(v):
        return float(jnp.ravel(v)[0])

    results = []
    configs = [
        ("slices", True, "dual"),   # shipping baseline (now incl. fused-loss chain + u8 aug)
        ("conv", True, "dual"),
        ("conv", False, "dual"),
        ("slices", True, "split"),
        ("slices", True, "gram"),
    ]
    for resolve, barrier, stats in configs:
        sc.Z_RESOLVE = resolve
        sc.Z_BARRIER = barrier
        bn.STATS_FWD = stats
        model = ResUNet(dtype=jnp.bfloat16)
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        step, _ = _build_paired_steps(
            SSIMLoss(mix=0.8, ms=True), False, lambda key, batch, augment: base(key, batch)
        )
        step = nnx.cached_partial(step, model, optimizer)

        def run():
            loss, _, _ = step(hr_u8, None, key, optim.lr, B, False)
            return loss

        for _ in range(3):
            sync(run())
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(8):
                out = run()
            sync(out)
            times.append((time.perf_counter() - t0) / 8 * 1e3)
        row = {
            "resolve": resolve,
            "barrier": barrier,
            "stats": stats,
            "step_ms": round(sorted(times)[len(times) // 2], 3),
            "loss": sync(run()),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        with open(os.path.join(HERE, "mxu_probe36.json"), "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
