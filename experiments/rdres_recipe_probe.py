"""Find a *converging* RDResUNet recipe for the epoch-scale kernel gate.

quality_fused.py needs an attractor: when training oscillates (lr 1e-3,
quality_fused_rdres.log) or collapses (endpoint predicts ~black — PSNR 23
on sparse phantoms with MS-SSIM ~0, the "loss 0.894 / psnr 23.1"
signature), the fused-vs-unfused endpoint delta measures chaos, not
kernel math.  This probe sweeps (lr, loss, epochs) on the small-config
RDResUNet / 480-phantom-256px task with the XLA path (rdtail off) and
reports per-epoch val losses + endpoint PSNR vs the bilinear baseline, so
the gate can adopt a recipe where training demonstrably converges.

Run (TPU): python experiments/rdres_recipe_probe.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data import ImageDataset
    from pssr2_tpu.models import RDResUNet
    from pssr2_tpu.ops.metrics import psnr
    from pssr2_tpu.ops.pallas import rdtail
    from pssr2_tpu.ops.resize import resize_bilinear_np
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import train_paired
    from pssr2_tpu.util import MSELoss, SSIMLoss

    from quality_demo import make_phantoms

    rdtail.MODE = "off"
    print(f"devices: {jax.devices()}", flush=True)

    data_dir = os.path.join(tempfile.gettempdir(), "quality_fused_phantoms256")
    make_phantoms(data_dir, n=480, res=256)

    def make_model():
        return RDResUNet(
            rdnet_init=64, growth_rates=[32, 48, 64, 64],
            ds_blocks=[False, True, True, True], ese_blocks=[False, False, True, True],
            n_blocks=2, hidden=[256, 256, 128, 64], dtype=jnp.bfloat16,
        )

    epochs = int(os.environ.get("PROBE_EPOCHS", 20))
    candidates = [
        ("mse_3e-4", MSELoss(), 3e-4),
        ("ssim_1e-4", SSIMLoss(mix=0.8, ms=True), 1e-4),
        ("ssim_3e-4", SSIMLoss(mix=0.8, ms=True), 3e-4),
        ("mse_1e-4", MSELoss(), 1e-4),
    ]
    results = {}
    for name, loss_fn, lr in candidates:
        dataset = ImageDataset(
            data_dir, hr_res=256, lr_scale=4, crappifier=Poisson(), val_split=0.1
        )
        model = make_model()
        t0 = time.time()
        _, val_losses = train_paired(
            model, dataset, batch_size=16, loss_fn=loss_fn, optim=AdamW(lr),
            epochs=epochs, log_frequency=1000, steps_per_dispatch=8, seed=0,
        )
        wall = time.time() - t0
        model.eval()
        psnrs, base = [], []
        for idx in dataset.val_idx:
            hr, lr_img = dataset[idx]
            hr = np.asarray(hr, np.float32)
            lr_img = np.asarray(lr_img, np.float32)[None]
            pred = np.clip(np.asarray(model(lr_img))[0], 0, 255)
            up = np.clip(resize_bilinear_np(lr_img, 256, 256)[0], 0, 255)
            psnrs.append(psnr(hr, pred, data_range=255))
            base.append(psnr(hr, up, data_range=255))
        results[name] = {
            "lr": lr,
            "epochs": epochs,
            "wall_s": round(wall, 1),
            "val_losses": [round(float(v), 5) for v in val_losses],
            "val_psnr": round(float(np.mean(psnrs)), 3),
            "bilinear_psnr": round(float(np.mean(base)), 3),
        }
        print(json.dumps({name: results[name]}), flush=True)

    with open(os.path.join(HERE, "rdres_recipe_probe.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
