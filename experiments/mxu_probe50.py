"""Probe50: per-feature isolation of the post-probe46 convchain changes
on the full canonical ResUNet train step (interleaved protocol, see
mxu_probe37/44/46/49).

probe46 measured the original chain (HBM boundary transposes, no cin<8
entry pad, select_and_scatter pooling) at -1.39 ms composed; probe48,
which nominally validated the three follow-up changes (VMEM boundary
transposes 0e8f0d2, cin<8 pad entry bbfb629, reshape-max pooling
7f724ea), ran under gate contention and its medians are unusable; the
clean probe49 rerun of the shipping state landed at only -0.27 ms.
This probe isolates each feature in one interleaved process:

  off       MODE=off, reshape-max pooling   (probe49's baseline)
  off-sas   MODE=off, select_and_scatter    (probe46's baseline)
  ship      auto + pad entry + VMEM transposes + reshape-max (probe49 auto)
  hbmT      ship but explicit HBM boundary transposes (VMEM_TRANSPOSE=0)
  nopad     ship but cin<8 entry layer on the XLA prefix (PAD_ENTRY=0)

Deltas that matter: pooling = off - off-sas; vmemT = ship - hbmT;
pad = ship - nopad; chain total = ship - off.  Flags are read at trace
time (fresh model + cached_partial per config).
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
    from pssr2_tpu.ops import pooling
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

    # name -> (MODE, PAD_ENTRY, VMEM_TRANSPOSE, RESHAPE_MAX)
    configs = {
        "off": ("off", True, True, True),
        "off-sas": ("off", True, True, False),
        "ship": ("auto", True, True, True),
        "hbmT": ("auto", True, False, True),
        "nopad": ("auto", False, True, True),
    }
    steps = []
    losses = {}
    for name, (mode, pad, vt, rmp) in configs.items():
        convchain.MODE = mode
        convchain.PAD_ENTRY = pad
        convchain.VMEM_TRANSPOSE = vt
        pooling.RESHAPE_MAX = rmp
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

        losses[name] = sync(run())
        for _ in range(2):
            sync(run())
        steps.append((name, run))
        print(f"compiled {name}: loss {losses[name]:.6f}", flush=True)
    convchain.MODE = "auto"
    convchain.PAD_ENTRY = convchain.VMEM_TRANSPOSE = pooling.RESHAPE_MAX = True

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
    results["losses"] = losses
    med = {n: results[n]["median_ms"] for n in trials}
    results["deltas_ms"] = {
        "pooling_reshape_max": round(med["off"] - med["off-sas"], 3),
        "vmem_transpose": round(med["ship"] - med["hbmT"], 3),
        "pad_entry": round(med["ship"] - med["nopad"], 3),
        "chain_total": round(med["ship"] - med["off"], 3),
    }
    print(json.dumps(results), flush=True)
    with open(os.path.join(HERE, "mxu_probe50.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
