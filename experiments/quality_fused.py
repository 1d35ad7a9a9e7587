"""Convergence-endpoint quality gates for the fused-VJP training paths.

Round-3 certified the fused SwinIR whole-block VJP kernel
(ops/pallas/swinblock.py) and the fused RDNet block-tail kernel
(ops/pallas/rdtail.py) by 60-step loss trajectories only.  The bf16-loss
precedent (clean at step scale, NaN at the 220-epoch quality gate —
quality_demo_bf16loss.log) says step-scale agreement does not bound
endpoint quality, so this script runs the full quality_demo protocol
(120 phantoms, 220 epochs, canonical MS-SSIM+L1 training via
train_paired) for each family TWICE — fused kernels on ("auto") vs off
(XLA autodiff twin) — from identical seeds/data, and reports the
endpoint val-PSNR delta.  Budget: |delta| <= 0.05 dB (VERDICT r3 #2).

SwinIR runs with drop_path_rate=0.0 so the two paths are deterministic
twins (the fused path draws DropPath keep-scales outside the kernel; with
rate>0 the *key consumption order* differs between paths and the runs
stop being controlled).  The kernel math exercised is identical — the
keep-scale multiply is the one op dp=0 skips.

Run (TPU): python experiments/quality_fused.py swinir
           python experiments/quality_fused.py rdres
Writes experiments/quality_fused_{family}.json and ASSERTS the budget
(exit nonzero on violation).  tests/test_quality_gates.py re-checks the
artifacts in CI.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BUDGET_DB = 0.05


def run(family, mode, epochs):
    import jax.numpy as jnp

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data import ImageDataset
    from pssr2_tpu.models import RDResUNet, SwinIR
    from pssr2_tpu.ops.metrics import psnr
    from pssr2_tpu.ops.pallas import rdtail, swinblock
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import train_paired
    from pssr2_tpu.util import SSIMLoss

    from quality_demo import make_phantoms

    data_dir = os.path.join(tempfile.gettempdir(), "quality_demo_phantoms")
    make_phantoms(data_dir, n=120)
    dataset = ImageDataset(data_dir, hr_res=512, lr_scale=4, crappifier=Poisson(), val_split=0.1)

    if family == "swinir":
        swinblock.MODE = mode
        model = SwinIR(image_size=128, dtype=jnp.bfloat16, drop_path_rate=0.0)
    elif family == "rdres":
        rdtail.MODE = mode
        model = RDResUNet(dtype=jnp.bfloat16)
    else:
        raise SystemExit(f"unknown family {family}")

    t0 = time.time()
    _, val_losses = train_paired(
        model, dataset, batch_size=16, loss_fn=SSIMLoss(mix=0.8, ms=True),
        optim=AdamW(1e-3), epochs=epochs, log_frequency=200, steps_per_dispatch=8, seed=0,
    )
    wall = time.time() - t0

    model.eval()
    psnrs = []
    for idx in dataset.val_idx:
        hr, lr = dataset[idx]
        hr = np.asarray(hr, np.float32)
        lr = np.asarray(lr, np.float32)[None]
        pred = np.clip(np.asarray(model(lr))[0], 0, 255)
        psnrs.append(psnr(hr, pred, data_range=255))
    return {
        "mode": mode,
        "wall_s": round(wall, 1),
        "final_val_loss": round(float(val_losses[-1]), 5),
        "val_psnr": round(float(np.mean(psnrs)), 4),
    }


def main():
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    family = sys.argv[1]
    epochs = int(os.environ.get("DEMO_EPOCHS", 220))
    print(f"devices: {jax.devices()}", flush=True)
    fused = run(family, "auto", epochs)
    print(json.dumps(fused), flush=True)
    unfused = run(family, "off", epochs)
    print(json.dumps(unfused), flush=True)
    out = {
        "family": family,
        "epochs": epochs,
        "fused": fused,
        "unfused": unfused,
        "delta_db": round(abs(fused["val_psnr"] - unfused["val_psnr"]), 4),
        "budget_db": BUDGET_DB,
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, f"quality_fused_{family}.json"), "w") as f:
        json.dump(out, f, indent=1)
    assert out["delta_db"] <= BUDGET_DB, (
        f"endpoint PSNR delta {out['delta_db']} dB exceeds the {BUDGET_DB} dB budget"
    )


if __name__ == "__main__":
    main()
