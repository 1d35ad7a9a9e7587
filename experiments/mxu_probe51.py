"""Probe51: composed A/B of convchain.PACK (packed W<128 stages) on the
full canonical ResUNet train step (interleaved protocol, see
mxu_probe37/46/49/50).

PACK extends the fused conv+BN-stat chain from the W%128==0 stages
(enc0/dec3) to the 64^2/32^2/16^2 stages by packing P = 128/W image rows
onto the lanes.  The deep stages' convs are lane-full and near their MXU
floor under XLA (results_r3.md floor table), so the win hypothesis is
the ~4.3 ms of BN stat machinery + normalized-tensor materialization
those stages still pay, NOT the conv FLOPs.  probe47 refuted the
convnhwc (native-layout tap-dot) form of deep-stage fusion at +11.5 ms;
this is the convchain form that probe46/50 proved on W=128.

Configs (MODE / PACK):
  off     "off", -      (no fused chains at all)
  base    "auto", False (shipping state as of probe50: enc0/dec3 only)
  pack    "auto", True  (packed deep stages too)

Deltas: pack - base = the packed extension's composed value;
base - off = the probe50 sanity re-check.
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
    from pssr2_tpu.train import _build_paired_steps
    from pssr2_tpu.util import SSIMLoss
    from pssr2_tpu.ops.pallas import convchain

    print(f"devices: {jax.devices()}", flush=True)
    B = 16
    rng = np.random.default_rng(0)
    hr_u8 = jnp.asarray(rng.integers(0, 255, (B, 1, 512, 512)).astype(np.uint8))
    key = jax.random.key(0)
    base = make_device_gen_pair(4, Poisson(), None, augment=True)

    def sync(v):
        return float(jnp.ravel(v)[0])

    configs = {
        "off": ("off", False),
        "base": ("auto", False),
        "pack": ("auto", True),
    }
    steps = []
    losses = {}
    for name, (mode, pk) in configs.items():
        convchain.MODE = mode
        convchain.PACK = pk
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
    convchain.MODE, convchain.PACK = "auto", True

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
        "packed_extension": round(med["pack"] - med["base"], 3),
        "chain_total_base": round(med["base"] - med["off"], 3),
        "chain_total_pack": round(med["pack"] - med["off"], 3),
    }
    print(json.dumps(results), flush=True)
    with open(os.path.join(HERE, "mxu_probe51.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
