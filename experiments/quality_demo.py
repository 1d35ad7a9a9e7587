"""End-to-end quality demo on real TPU (repeatable; round-1 ran ad hoc).

120 synthetic microscopy phantoms (Gaussian blobs + 1 px filaments),
canonical ResUNet x4 bf16, MS-SSIM+L1, trained via train_paired with the
scan trainer (steps_per_dispatch=8), then compared on the val split
against the bilinear-upscale-of-crappified-LR baseline.

Round-1 result for reference: PSNR 25.24 / SSIM 0.877 vs baseline
25.24-0.44 after 1540 steps.  This script doubles as the end-to-end
quality-regression guard for the round-2 custom-VJP/optimization work.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def make_phantoms(out_dir, n=120, res=512, seed=0):
    from pssr2_tpu.data import tiff

    # Fine structure only (small blobs + many 1 px filaments, no HR
    # noise): super-resolution must recover sub-LR-pixel detail, so a
    # trained model can beat interpolation; fat smooth blobs or noisy HR
    # make bilinear unbeatable and the comparison meaningless.
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
    for i in range(n):
        img = np.zeros((res, res), np.float32)
        for _ in range(rng.integers(25, 45)):  # small puncta
            cx, cy = rng.uniform(0, res, 2)
            s = rng.uniform(1.0, 3.5)
            amp = rng.uniform(80, 220)
            img += amp * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
        for _ in range(rng.integers(12, 24)):  # 1px filaments (curved)
            x0, y0 = rng.uniform(0, res, 2)
            ang = rng.uniform(0, np.pi)
            curve = rng.uniform(-0.004, 0.004)
            length = rng.uniform(100, 400)
            t = np.arange(0, length)
            xs = np.clip(x0 + t * np.cos(ang + curve * t), 0, res - 1).astype(int)
            ys = np.clip(y0 + t * np.sin(ang + curve * t), 0, res - 1).astype(int)
            img[ys, xs] += rng.uniform(100, 200)
        tiff.imwrite(os.path.join(out_dir, f"{i:03d}.tif"), np.clip(img, 0, 255).astype(np.uint8))


def main():
    import jax.numpy as jnp

    from pssr2_tpu.crappifiers import Poisson
    from pssr2_tpu.data import ImageDataset
    from pssr2_tpu.models import ResUNet
    from pssr2_tpu.ops.metrics import psnr, ssim_np
    from pssr2_tpu.ops.resize import resize_bilinear_np
    from pssr2_tpu.optim import AdamW
    from pssr2_tpu.train import train_paired
    from pssr2_tpu.util import SSIMLoss

    epochs = int(os.environ.get("DEMO_EPOCHS", 220))
    # DEMO_LOSS_BF16=1: gate for running the loss itself in bf16 (the
    # variance terms cancel in 8-bit mantissas; the bench may only adopt
    # the -4 ms/step win if end quality holds — experiments/mxu_probe22).
    loss_dtype = jnp.bfloat16 if os.environ.get("DEMO_LOSS_BF16") == "1" else None
    data_dir = os.path.join(tempfile.gettempdir(), "quality_demo_phantoms")
    make_phantoms(data_dir, n=120)

    dataset = ImageDataset(data_dir, hr_res=512, lr_scale=4, crappifier=Poisson(), val_split=0.1)
    model = ResUNet(dtype=jnp.bfloat16)
    optim = AdamW(1e-3)

    t0 = time.time()
    train_losses, val_losses = train_paired(
        model, dataset, batch_size=16, loss_fn=SSIMLoss(mix=0.8, ms=True, dtype=loss_dtype),
        optim=optim, epochs=epochs, log_frequency=50, steps_per_dispatch=8, seed=0,
    )
    wall = time.time() - t0

    # evaluate on the val split vs the bilinear baseline, un-normalized
    model.eval()
    rng = np.random.default_rng(123)
    model_psnr, model_ssim, base_psnr, base_ssim = [], [], [], []
    for idx in dataset.val_idx:
        hr, lr = dataset[idx]
        hr = np.asarray(hr, np.float32)[None]
        lr = np.asarray(lr, np.float32)[None]
        pred = np.clip(np.asarray(model(lr))[0], 0, 255)
        up = np.clip(resize_bilinear_np(lr, 512, 512)[0], 0, 255)
        for arrs, ps, ss in ((pred, model_psnr, model_ssim), (up, base_psnr, base_ssim)):
            ps.append(psnr(hr[0], arrs, data_range=255))
            ss.append(ssim_np(hr[0].squeeze(), arrs.squeeze(), data_range=255))
    out = {
        "steps": len(dataset.train_idx) // 16 * epochs if hasattr(dataset, "train_idx") else None,
        "epochs": epochs,
        "wall_s": round(wall, 1),
        "final_val_loss": round(float(val_losses[-1]), 4),
        "model_psnr": round(float(np.mean(model_psnr)), 3),
        "model_ssim": round(float(np.mean(model_ssim)), 4),
        "baseline_psnr": round(float(np.mean(base_psnr)), 3),
        "baseline_ssim": round(float(np.mean(base_ssim)), 4),
    }
    out["psnr_gain_db"] = round(out["model_psnr"] - out["baseline_psnr"], 3)
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "quality_demo.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
