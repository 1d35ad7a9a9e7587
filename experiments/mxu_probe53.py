"""Probe53: scan-trainer dispatch-depth (steps_per_dispatch) sweep on the
canonical ResUNet train step, interleaved in ONE process.

Round 3's SPD sweep (results_r3.md) ran each depth as a separate bench.py
invocation: 8 -> 402.5, 16 -> 407.0, 32 -> 409.2 p/s; the bench default
moved to 16 but 32 measured BETTER and 64 was never tried.  With the
round-5 convchain flag flip the step is ~2.5 ms faster, so the relative
weight of the per-dispatch tunnel cost grew — deeper scan may now be the
cheapest remaining p/s.  This probe A/Bs SPD 16/32/64 with shared
device-resident data (the 64-deep batch stack is built ON DEVICE — the
tunnel only uploads one 4 MB batch).

Semantics note: steps_per_dispatch only changes how many optimizer steps
ride one XLA dispatch (train.py:_build_multi_train_step scans the SAME
per-step program); loss values must match across depths at step 0.
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

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data.pipeline import make_device_gen_pair
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import _build_multi_train_step
    from pssr2_tpu.util import SSIMLoss

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    rng = np.random.default_rng(0)
    hr_u8 = jnp.asarray(rng.integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)

    def sync(v):
        return float(jnp.ravel(v)[0])

    depths = [16, 32, 64]
    runs = []
    for spd in depths:
        model = ResUNet(dtype=jnp.bfloat16)
        model.train()
        optim = AdamW(1e-3)
        optimizer = nnx.Optimizer(model, optim.tx, wrt=nnx.Param)
        multi = _build_multi_train_step(
            SSIMLoss(mix=0.8, ms=True), False,
            lambda key, batch, augment: base(key, batch),
        )
        multi = nnx.cached_partial(multi, model, optimizer)
        batches = jnp.stack([hr_u8] * spd)  # device-side: no tunnel upload
        keys = jax.random.split(key, spd)

        def run(multi=multi, batches=batches, keys=keys, lr=optim.lr):
            return multi(batches, None, keys, lr)

        loss0 = sync(run())
        sync(run())
        runs.append((spd, run))
        print(f"compiled spd={spd}: first-loss {loss0:.6f}", flush=True)

    trials = {spd: [] for spd, _ in runs}
    for t in range(7):
        for spd, run in runs:
            reps = max(1, 32 // spd)  # ~equal steps measured per trial
            t0 = time.perf_counter()
            for _ in range(reps):
                out = run()
            sync(out)
            dt = (time.perf_counter() - t0) / (reps * spd)
            trials[spd].append(round(dt * 1e3, 3))
        print(json.dumps({"trial": t, **{str(s): trials[s][-1] for s in trials}}), flush=True)

    results = {}
    for spd, v in trials.items():
        med = sorted(v)[len(v) // 2]
        results[str(spd)] = {
            "median_step_ms": med,
            "patches_per_sec": round(B / (med / 1e3), 2),
            "trials": v,
        }
    print(json.dumps(results), flush=True)
    with open(os.path.join(HERE, "mxu_probe53.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
